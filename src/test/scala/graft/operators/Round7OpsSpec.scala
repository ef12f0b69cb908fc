package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.Tables.t

/** Round-7 operators: PII scrub, vocab/OOV, incremental dedup, retention,
  * attribution, recall@k, grouping sets, histogram, keyset pagination,
  * profiling.
  */
class Round7OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("pii scrub: every injected email/ip is redacted, counts match parity") {
    val out = TextAnalysis.textPiiScrub(spark, dir).cache()
    try {
      // nothing that looks like an email or dotted quad survives scrubbing
      assert(out.filter(col("scrubbed").rlike("@")).isEmpty)
      assert(out.filter(col("scrubbed").rlike("\\d+\\.\\d+\\.\\d+\\.\\d+"))
        .isEmpty)
      // injection pattern: email iff id % 3 != 0, ip iff id % 2 == 0
      assert(out.filter(
        col("n_emails") =!= when(col("doc_id") % 3 =!= 0, 1).otherwise(0))
        .isEmpty)
      assert(out.filter(
        col("n_ips") =!= when(col("doc_id") % 2 === 0, 1).otherwise(0))
        .isEmpty)
      // redaction markers appear exactly as many times as counts say
      assert(out.filter((size(split(col("scrubbed"), "<EMAIL>", -1)) - 1)
        =!= col("n_emails")).isEmpty)
    } finally out.unpersist()
  }

  test("vocab/oov: oov tokens are exactly the non-top-20 set") {
    import graft.functions.TextFunctions.tokens
    val out = TextAnalysis.textVocabOov(spark, dir).cache()
    try {
      val docs = t(spark, dir, "documents")
      assert(out.count() == docs.count())
      // independent reference: top-20 vocab via a window-free recount
      val vocab = docs.select(explode(tokens(col("text"))).as("tok"))
        .groupBy("tok").count().orderBy(col("count").desc, col("tok").asc)
        .limit(20).collect().map(_.getString(0)).toSet
      val ref = docs
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("tok").isin(vocab.toSeq: _*), 0L).otherwise(1L))
            .as("n_oov"))
      assert(out.select("doc_id", "n_tokens", "n_oov")
        .except(ref).isEmpty)
      // rate is bounded
      assert(out.filter(col("oov_rate") < 0 || col("oov_rate") > 1).isEmpty)
    } finally out.unpersist()
  }

  test("incremental dedup: admitted+rejected partition the batch; no admitted near-dup of corpus") {
    val batch = t(spark, dir, "documents").filter(col("doc_id") % 7 === 3)
    val admitted = Dedup.dedupIncremental(spark, dir).cache()
    try {
      assert(admitted.count() <= batch.count() && admitted.count() > 0)
      // every admitted id is a batch id
      assert(admitted.join(batch, Seq("doc_id"), "left_anti").isEmpty)
      // no admitted doc has a near-dup partner in the base corpus
      val pairs = Dedup.dedupMinhashLsh(spark, dir)
      val baseDupPartners = pairs
        .select(col("da").as("doc_id"), col("db").as("p"))
        .unionByName(pairs.select(col("db").as("doc_id"), col("da").as("p")))
        .filter(col("p") % 7 =!= 3)
        .select("doc_id").distinct()
      assert(admitted.join(baseDupPartners, Seq("doc_id"), "left_semi")
        .isEmpty, "admitted doc is a near-dup of the existing corpus")
    } finally admitted.unpersist()
  }

  test("retention: week-0 diagonal equals cohort sizes, users conserved") {
    val ret = EventAnalytics.evRetention(spark, dir).cache()
    try {
      assert(ret.filter(col("week_no") < 0).isEmpty)
      val e = graft.Tables.t(spark, dir, "events")
      val cohortSizes = e
        .select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("week"))
        .groupBy("user_id").agg(min(col("week")).as("cohort_week"))
        .groupBy("cohort_week").agg(countDistinct("user_id").as("n"))
      // week 0 row of each cohort counts every cohort member (they were
      // active in their first week by definition)
      val diag = ret.filter(col("week_no") === 0)
        .select(col("cohort_week"), col("n_users"))
      assert(diag.except(cohortSizes.select(col("cohort_week"),
        col("n").as("n_users"))).isEmpty)
      // retention never exceeds the cohort size
      val tooBig = ret.join(cohortSizes, "cohort_week")
        .filter(col("n_users") > col("n"))
      assert(tooBig.isEmpty)
    } finally ret.unpersist()
  }

  test("attribution: conversions conserved and channels are event types") {
    val att = EventAnalytics.evAttribution(spark, dir).cache()
    try {
      val purchases = graft.Tables.t(spark, dir, "events")
        .filter(col("event_type") === "purchase").count()
      assert(att.agg(sum("n_conversions")).collect()(0).getLong(0)
        == purchases)
      val allowed = Seq("click", "signup", "error", "view", "direct")
      assert(att.filter(!col("channel").isin(allowed: _*)).isEmpty)
      // 'purchase' can never credit itself
      assert(att.filter(col("channel") === "purchase").isEmpty)
    } finally att.unpersist()
  }

  test("recall@k: bounded, full query panel, and consistent with set overlap") {
    val rec = Similarity.simRecallAtK(spark, dir).cache()
    try {
      assert(rec.count() == 10)
      assert(rec.filter(col("recall") < 0 || col("recall") > 1).isEmpty)
      assert(rec.filter(col("n_hits") > 5).isEmpty)
    } finally rec.unpersist()
  }

  test("grouping sets: exactly the requested lattice levels, no grand total") {
    val gs = Relational.a14GroupingSets(spark, dir).cache()
    try {
      // gid 0 = (status, priority), 1 = (status), 2 = (priority); the
      // grand total (gid 3) was not requested and must be absent
      assert(gs.filter(col("gid") === 3).isEmpty)
      val statuses = t(spark, dir, "orders")
        .select(countDistinct("o_orderstatus")).collect()(0).getLong(0)
      assert(gs.filter(col("gid") === 1).count() == statuses)
      // (status) level total equals the ungrouped total
      val total = gs.filter(col("gid") === 1)
        .agg(sum("n_orders")).collect()(0).getLong(0)
      assert(total == t(spark, dir, "orders").count())
    } finally gs.unpersist()
  }

  test("histogram: counts conserved, buckets within range") {
    val h = Relational.a15Histogram(spark, dir).cache()
    try {
      assert(h.filter(col("bucket") < 0 || col("bucket") > 11).isEmpty)
      assert(h.agg(sum("n_orders")).collect()(0).getLong(0)
        == t(spark, dir, "orders").count())
    } finally h.unpersist()
  }

  test("keyset pagination: page starts strictly after the cursor, dense page") {
    val page = Relational.o8KeysetPagination(spark, dir).cache()
    try {
      assert(page.count() == 100)
      val cursor = java.sql.Timestamp.valueOf("1997-03-15 00:00:00")
      assert(page.filter(col("o_orderdate") < lit(cursor)).isEmpty)
      assert(page.filter(col("o_orderdate") === lit(cursor) &&
        col("o_orderkey") <= 1000).isEmpty)
      // the page is the MINIMAL such set: nothing between cursor and the
      // page's max is missing
      val last = page.orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        .limit(1).collect()(0)
      // Spark 4 infers parquet TIMESTAMP(isAdjustedToUTC=false) as NTZ and
      // returns java.time.LocalDateTime; keep it opaque and let lit() wrap it
      val maxD = last.getAs[Any]("o_orderdate")
      val maxK = last.getAs[Long]("o_orderkey")
      val expected = t(spark, dir, "orders")
        .filter((col("o_orderdate") > lit(cursor) ||
          (col("o_orderdate") === lit(cursor) && col("o_orderkey") > 1000)) &&
          (col("o_orderdate") < lit(maxD) ||
            (col("o_orderdate") === lit(maxD) && col("o_orderkey") <= maxK)))
        .count()
      assert(expected == 100)
    } finally page.unpersist()
  }

  test("profile + expectations: sane values on the known data") {
    val prof = Profiling.dqProfile(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val nCust = t(spark, dir, "customer").count()
    assert(prof("c_custkey") == ((nCust, 0L, nCust)))
    assert(prof("c_mktsegment")._3 == 5)
    val exp = Profiling.dqExpectations(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(exp("status_domain") == ((0L, true)))
    assert(exp("orderkey_unique") == ((0L, true)))
    assert(exp("fk_customer") == ((0L, true)))
    assert(exp("price_below_400k")._1 > 0 && !exp("price_below_400k")._2)
  }
}
