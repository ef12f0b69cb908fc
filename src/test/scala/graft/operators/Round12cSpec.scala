package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.Tables.t
import graft.streaming.EventConsumer

/** Round-12c contracts: incremental aggregate maintenance (U7), the
  * partitioned-HLL distinct contract (A17), deterministic A/B bucketing,
  * and the cluster-aware leakage-free split.
  */
class Round12cSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("u7: merged state == single-pass recompute under ANY batch split") {
    val orders = t(spark, dir, "orders")
    val oneShot = Relational.orderAggState(orders)
    // 3-way split on a different modulus than the query key uses —
    // associativity must hold for any partition of the fact rows
    val parts = (0 until 3).map(i =>
      Relational.orderAggState(orders.filter(col("o_orderkey") % 3 === i)))
    val merged = Relational.mergeOrderAggStates(parts)
    assert(merged.exceptAll(oneShot).isEmpty &&
      oneShot.exceptAll(merged).isEmpty,
      "incremental merge diverged from the one-shot aggregate")
  }

  test("u7: money stays exact integer cents across merges") {
    val row = Relational.u7IncrementalAgg(spark, dir)
      .agg(sum(round(col("total_spend") * 100).cast("long")).as("cents"),
        sum(col("total_spend")).as("dbl"))
      .head()
    // every per-key total is an exact multiple of a cent
    assert(math.abs(row.getLong(0) / 100.0 - row.getDouble(1)) < 1e-6)
  }

  test("a17: sketch estimate lands inside the published bound") {
    val row = Relational.a17HllPartitioned(spark, dir).head()
    assert(row.getAs[Boolean]("hll_ok"),
      "lgK=12 HLL estimate strayed past 5% of exact")
    assert(row.getAs[Long]("range_days") == 14L,
      "every day in the 14-day range should carry events at this sf")
  }

  test("ev_ab_test: arms partition the user population, rates exact") {
    val rows = EventAnalytics.evAbTest(spark, dir).collect()
    assert(rows.map(_.getAs[String]("variant")).toSet ==
      Set("control", "treatment"))
    val totalUsers = rows.map(_.getAs[Long]("n_users")).sum
    val distinctUsers = t(spark, dir, "events")
      .select(countDistinct(col("user_id"))).head().getLong(0)
    assert(totalUsers == distinctUsers,
      "every user must land in exactly one arm")
    rows.foreach { r =>
      assert(r.getAs[Long]("conv_rate_bp") ==
        r.getAs[Long]("n_converted") * 10000 / r.getAs[Long]("n_users"))
    }
  }

  test("st13: stream-static enrich emits closed windows == batch twin") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val mem = MemoryStream[(Timestamp, Long, String)]
    // two users: u1 first seen day 1 (so day-2 events are still 'new'),
    // u2 first seen 30 days earlier via the PROFILE (veteran immediately)
    val rows = Seq(
      (ts("2024-02-01 10:00:00"), 1L, "click"),
      (ts("2024-02-01 11:00:00"), 2L, "click"),
      (ts("2024-02-02 09:00:00"), 1L, "purchase"),
      (ts("2024-02-02 09:30:00"), 2L, "purchase"))
    val profile = Seq((1L, "2024-02-01"), (2L, "2024-01-02"))
      .toDF("user_id", "first_day")
      .withColumn("first_day", col("first_day").cast("date"))
    val q = EventConsumer.enrichAgg(
      mem.toDF().toDF("ts", "user_id", "event_type")
        .withWatermark("ts", "1 day"), profile)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("st13_test").start()
    try {
      mem.addData(rows: _*)
      // sentinel advances the watermark past both days' windows
      mem.addData((ts("2024-02-05 00:00:00"), 1L, "view"))
      q.processAllAvailable()
      val streamed = spark.table("st13_test")
        .orderBy("day", "event_type", "tenure_bucket").collect().toSeq
      val batch = EventConsumer.enrichAgg(
        rows.toDF("ts", "user_id", "event_type"), profile)
        .orderBy("day", "event_type", "tenure_bucket").collect().toSeq
      assert(streamed == batch,
        s"stream $streamed\nbatch $batch")
      // the enrichment itself: u2's day-1 click is 'veteran', u1's 'new'
      assert(streamed.exists(r => r.getString(2) == "veteran"))
      assert(streamed.exists(r => r.getString(2) == "new"))
    } finally q.stop()
  }

  test("sim_range_search: set semantics — thresholded, deduplicated, " +
      "and every in-bucket brute-force hit is found") {
    val got = Similarity.simRangeSearch(spark, dir).collect()
    assert(got.forall(_.getAs[Double]("cos_sim") >= 0.25))
    val pairs = got.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.distinct.length == pairs.length,
      "multi-probe must not emit a candidate pair twice")
    // radius semantics: within the probed candidate set nothing above τ
    // is dropped — compare against the multiprobe top-k list restricted
    // to cos ≥ τ (its candidates are the same probe join)
    val topkAboveTau = Similarity.simLshMultiprobe(spark, dir).collect()
      .filter(_.getAs[Double]("cos_sim") >= 0.25)
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    assert(topkAboveTau.subsetOf(pairs.toSet),
      "range search lost an in-bucket neighbor above the threshold")
  }

  test("ev_window_funnel: depth histogram matches a driver-side greedy " +
      "chain recompute") {
    val got = EventAnalytics.evWindowFunnel(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val events = t(spark, dir, "events")
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
    val horizon = 7L * 24 * 3600 * 1000
    val want = events.groupBy(_._1).flatMap { case (_, evs) =>
      def firstAfter(tpe: String, after: java.sql.Timestamp) =
        evs.filter(e => e._2 == tpe && e._3.getTime > after.getTime)
          .map(_._3).sortBy(_.getTime).headOption
      val t1 = evs.filter(_._2 == "signup").map(_._3)
        .sortBy(_.getTime).headOption
      t1.map { t1v =>
        val t2 = firstAfter("view", t1v)
        val t3 = t2.flatMap(firstAfter("click", _))
        val t4 = t3.flatMap(firstAfter("purchase", _))
        def in(t: Option[java.sql.Timestamp]) =
          t.exists(_.getTime <= t1v.getTime + horizon)
        if (in(t4)) 4 else if (in(t3)) 3 else if (in(t2)) 2 else 1
      }
    }.groupBy(identity).map { case (d, g) => d -> g.size.toLong }
    assert(got == want, s"got $got want $want")
  }

  test("cur_split_leakfree: no cluster straddles a split boundary") {
    // recompute doc-level split membership and assert each cluster maps
    // to exactly one split — the leak-freedom claim itself
    val labels = Curation.dedupClusters(spark, dir)
      .select(col("doc_id"), col("cluster_id"))
    val hv = conv(substring(md5(col("cluster_id").cast("string")), 1, 2),
      16, 10).cast("int")
    val straddlers = labels
      .withColumn("split",
        when(hv < 204, "train").when(hv < 230, "val").otherwise("test"))
      .groupBy(col("cluster_id"))
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1)
      .count()
    assert(straddlers == 0L)
    val summary = Curation.splitLeakfree(spark, dir)
    val docTotal = summary.agg(sum(col("n_docs"))).head().getLong(0)
    assert(docTotal == t(spark, dir, "documents").count(),
      "split must cover the whole corpus exactly once")
  }
}
