package graft.operators

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.Tables.t

/** Round-13g contracts: frontier-BFS k-hop reachability, soft (weighted)
  * dedup, OLS trend fitting, the pre-flight join-cardinality audit, and
  * unigram vocabulary drift. Each distributed result is checked against
  * a driver-side brute-force recompute from the same inputs — the spec
  * owns the semantics, the oracle SQL owns cross-engine parity.
  */
class Round13gSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("graph_khop: hop labels equal min-hop BFS distance from the " +
      "k smallest nodes, capped at the round budget") {
    val pairs = Dedup.dedupMinhashLsh(spark, dir)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "sf0.001 corpus should have planted near-dups")
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).distinct }
    val seeds = adj.keys.toSeq.sorted.take(Curation.KhopSeeds)
    // driver BFS to the same depth
    var distExp: Map[Long, Int] = seeds.map(_ -> 0).toMap
    var frontier = seeds.toSet
    for (i <- 1 to Curation.KhopIters) {
      val next = frontier.flatMap(adj(_)).diff(distExp.keySet)
      distExp ++= next.map(_ -> i)
      frontier = next
    }
    val out = Curation.graphKhop(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == distExp, "hop map must equal the driver BFS replay")
    assert(out.values.count(_ == 0) == seeds.length)
    // non-vacuous: the planted near-dup web must extend past the seeds
    assert(out.values.exists(_ >= 1), "no expansion — fixture degenerate")
  }

  test("cur_soft_dedup: per-source rollup matches an exact driver " +
      "recompute and duplicated mass is actually down-weighted") {
    val docs = t(spark, dir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // driver-side connected components over the same near-dup pair graph
    val pairs = Dedup.dedupMinhashLsh(spark, dir)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).distinct }
    var label: Map[Long, Long] = docs.map(d => d._1 -> d._1).toMap
    var changed = true
    while (changed) {
      changed = false
      adj.foreach { case (n, ns) =>
        val m = (label(n) +: ns.map(label)).min
        if (label(n) != m) { label += n -> m; changed = true }
        ns.foreach { x =>
          if (label(x) != m) { label += x -> m; changed = true }
        }
      }
    }
    val csize = label.values.groupBy(identity)
      .map { case (l, xs) => l -> xs.size.toLong }
    val exp = docs.groupBy(_._2).map { case (src, ds) =>
      val nTok = ds.map(_._3.split(" ", -1).length.toLong)
      val wt = ds.map(d => 1000000L / csize(label(d._1)))
      val effTok = ds.zip(wt).map { case (d, w) =>
        d._3.split(" ", -1).length.toLong * w
      }.sum
      src -> ((ds.length.toLong, nTok.sum, wt.sum, effTok))
    }
    val rows = Curation.softDedup(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSeq == exp.keys.toSeq.sorted)
    rows.foreach { r =>
      val (nd, nt, ed, et) = exp(r.getString(0))
      assert(r.getLong(1) == nd && r.getLong(2) == nt)
      assert(r.getLong(3) == ed, s"${r.getString(0)} eff_docs_micro")
      assert(r.getLong(4) == et, s"${r.getString(0)} eff_tokens_micro")
      val ratio = r.getDouble(5)
      assert(ratio > 0.0 && ratio <= 1.0)
    }
    // non-vacuous: the fixture plants near-dups, so at least one source
    // must keep strictly less than full mass
    assert(rows.exists(_.getDouble(5) < 1.0 - 1e-9),
      "no down-weighting anywhere — near-dup fixture missing?")
  }

  test("ts_linreg: slope/intercept/r2 match the sufficient-statistics " +
      "fit recomputed on the driver from the daily counts") {
    val daily = t(spark, dir, "events")
      .selectExpr("event_type", "CAST(ts AS DATE) AS day").collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate))
      .groupBy(identity).map { case ((ty, d), xs) => (ty, d, xs.length.toLong) }
      .toSeq
    val day0 = daily.map(_._2).min
    val rows = EventAnalytics.tsLinreg(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ty = r.getString(0)
      val pts = daily.filter(_._1 == ty)
        .map(p => (java.time.temporal.ChronoUnit.DAYS.between(day0, p._2), p._3))
      assert(r.getLong(1) == pts.length.toLong, s"$ty n_days")
      val n = pts.length.toLong
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val syy = pts.map(p => p._2 * p._2).sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      val deny = n * syy - sy * sy
      if (den != 0) {
        val slope = num.toDouble / den.toDouble
        assert(r.getDouble(2) ==
          BigDecimal(slope).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble, s"$ty slope")
        val icept = (sy.toDouble - slope * sx.toDouble) / n.toDouble
        assert(math.abs(r.getDouble(3) - icept) < 1e-6, s"$ty intercept")
        if (deny != 0) {
          val r2 = (num.toDouble * num.toDouble) / (den.toDouble * deny.toDouble)
          assert(math.abs(r.getDouble(4) - r2) < 1e-6, s"$ty r2")
          assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0 + 1e-9)
        }
      } else assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
    }
  }

  test("dq_join_cardinality: est_rows EQUALS the true join output size " +
      "it predicts without executing, and the hot key bounds hold") {
    val rows = Profiling.dqJoinCardinality(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet ==
      Set("customer_orders", "orders_lineitem", "events_self_user"))
    val co = t(spark, dir, "customer").join(
      t(spark, dir, "orders"),
      org.apache.spark.sql.functions.col("c_custkey") ===
        org.apache.spark.sql.functions.col("o_custkey")).count()
    val ol = t(spark, dir, "orders").join(
      t(spark, dir, "lineitem"),
      org.apache.spark.sql.functions.col("o_orderkey") ===
        org.apache.spark.sql.functions.col("l_orderkey")).count()
    val ev = t(spark, dir, "events").select("user_id")
    val es = ev.join(ev.toDF("u2"),
      org.apache.spark.sql.functions.col("user_id") ===
        org.apache.spark.sql.functions.col("u2")).count()
    assert(rows("customer_orders").getAs[Long]("est_rows") == co)
    assert(rows("orders_lineitem").getAs[Long]("est_rows") == ol)
    assert(rows("events_self_user").getAs[Long]("est_rows") == es)
    rows.values.foreach { r =>
      val est = r.getAs[Long]("est_rows")
      val mx = r.getAs[Long]("max_key_rows")
      val nk = r.getAs[Long]("n_keys_matched")
      assert(mx <= est && est <= mx * nk,
        "max single-key contribution must bound the total")
      assert(math.abs(r.getAs[Double]("amplification")
        - est.toDouble / r.getAs[Long]("n_left").toDouble) < 1e-6)
    }
    // the self-join on a behavioral key is the blowup this audit exists
    // to catch: its amplification must exceed the PK-FK joins'
    assert(rows("events_self_user").getAs[Double]("amplification") >
      rows("customer_orders").getAs[Double]("amplification"))
  }

  test("text_vocab_drift: top-k JS contributions match a driver replay " +
      "of the digest-split unigram distributions") {
    val docs = t(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val cnt = collection.mutable.Map.empty[String, (Long, Long)]
    docs.foreach { case (id, text) =>
      val inA = Integer.parseInt(md5hex(id.toString).substring(0, 1), 16) < 8
      text.split(" ", -1).foreach { w =>
        val (a, b) = cnt.getOrElse(w, (0L, 0L))
        cnt(w) = if (inA) (a + 1, b) else (a, b + 1)
      }
    }
    val kept = cnt.filter { case (_, (a, b)) => a + b >= 5 }
    val totA = kept.values.map(_._1).sum
    val totB = kept.values.map(_._2).sum
    val scored = kept.map { case (term, (a, b)) =>
      val pa = (a * 1000000L / totA).toDouble
      val pb = (b * 1000000L / totB).toDouble
      val c = (if (pa > 0) pa * math.log(2.0 * pa / (pa + pb)) else 0.0) +
        (if (pb > 0) pb * math.log(2.0 * pb / (pa + pb)) else 0.0)
      val micro = BigDecimal(c * 0.5)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (term, a, b, micro)
    }.toSeq
    val expTop = scored.sortBy { case (term, _, _, m) => (-m, term) }
      .take(TextAnalysis.VocabDriftK)
    val rows = TextAnalysis.textVocabDrift(spark, dir).collect()
    assert(rows.length == math.min(TextAnalysis.VocabDriftK, scored.length))
    rows.zip(expTop).zipWithIndex.foreach { case ((r, (term, a, b, m)), i) =>
      assert(r.getString(0) == term, s"rank ${i + 1} term")
      assert(r.getLong(1) == a && r.getLong(2) == b)
      assert(r.getDouble(5) == m, s"$term js_contrib_micro")
      assert(r.getInt(6) == i + 1, "rank must be dense from 1")
    }
    // non-vacuous: drift scores must not all be zero (the halves differ)
    assert(rows.head.getDouble(5) > 0.0)
  }
}
