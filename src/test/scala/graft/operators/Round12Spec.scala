package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.Tables.t

/** Round-12 contracts: token entropy, snapshot drift (PSI), and the
  * fractional per-source epoch plan.
  */
class Round12Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("text_entropy matches a driver-side recompute; norm in [0,1]") {
    val got = TextAnalysis.textEntropy(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toMap
    assert(got.nonEmpty)
    val texts = t(spark, dir, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(texts.length == got.size)
    texts.foreach { case (id, text) =>
      // limit -1: Spark's split keeps trailing empty tokens
      val toks = text.split(" ", -1).toSeq
      val counts = toks.groupBy(identity).map(_._2.size.toLong)
      val n = toks.size.toLong
      val su = counts.map(c => math.round(c * math.log(c.toDouble) * 1e6)).sum
      val h = math.log(n.toDouble) - su / 1e6 / n
      val d = counts.size.toLong
      val norm = if (d > 1) h / math.log(d.toDouble) else 0.0
      val (gn, gd, gh, gnorm) = got(id)
      assert(gn == n && gd == d, s"doc $id counts")
      assert(math.abs(gh - h) < 1e-3, s"doc $id entropy $gh vs $h")
      assert(math.abs(gnorm - norm) < 1e-3, s"doc $id norm")
      assert(gnorm >= -1e-9 && gnorm <= 1 + 1e-9, s"doc $id norm range")
    }
  }

  test("dq_drift: bins partition the fact; psi_total = sum(psi) and " +
      "passes the no-drift gate on the time-split synthetic corpus") {
    val rows = Profiling.dqDrift(spark, dir).collect()
    assert(rows.nonEmpty)
    val total = t(spark, dir, "events").count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == total,
      "every event lands in exactly one bin")
    val psiSum = rows.map(_.getDouble(5)).sum
    val psiTotal = rows.map(_.getDouble(6)).distinct
    assert(psiTotal.length == 1, "psi_total identical on every row")
    assert(math.abs(psiTotal.head - psiSum) < 1e-9)
    // both halves draw from the same generator: the conventional
    // PSI < 0.1 "no drift" gate must pass
    assert(psiTotal.head >= 0.0 && psiTotal.head < 0.1,
      s"psi_total ${psiTotal.head}")
  }

  test("cur_epoch_plan: full epochs complete, partial epochs sampled at " +
      "~the fractional rate, plan deterministic") {
    val plan = Curation.epochPlan(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getDouble(2), r.getInt(3)))
    val byDoc = plan.groupBy(_._1)
    val docs = t(spark, dir, "documents").select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byDoc.keySet == docs.keySet, "every doc appears in the plan")
    byDoc.foreach { case (id, rows) =>
      val target = rows.head._3
      val (full, ceilN) = (math.floor(target).toInt, math.ceil(target).toInt)
      val epochs = rows.map(_._4).sorted
      // the full epochs are ALWAYS present and dense from 1
      assert(epochs.take(full).toSeq == (1 to full),
        s"doc $id full epochs $epochs (target $target)")
      assert(epochs.length == full || epochs.length == ceilN,
        s"doc $id row count ${epochs.length}")
    }
    // partial-epoch admission rate ≈ fractional part (binomial, loose)
    Seq((Curation.EpochTierHigh, Curation.EpochHighSrcs),
        (Curation.EpochTierMid, Curation.EpochMidSrcs)).foreach {
      case (target, srcs) =>
        val frac = target - math.floor(target)
        val pool = docs.filter { case (_, s) => srcs.contains(s) }.keySet
        assert(pool.size > 50, "tier population")
        val kept = pool.count(id =>
          byDoc(id).exists(_._4 == math.ceil(target).toInt))
        val rate = kept.toDouble / pool.size
        assert(math.abs(rate - frac) < 0.15,
          s"tier $target partial rate $rate vs $frac over ${pool.size}")
    }
    val again = Curation.epochPlan(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getDouble(2), r.getInt(3)))
    assert(plan.sortBy(r => (r._1, r._4)).toSeq ==
      again.sortBy(r => (r._1, r._4)).toSeq, "plan is deterministic")
  }

  test("cur_token_budget: shares sum to 1, targets sum to ~the corpus, " +
      "repeat_factor consistent with the deficit") {
    val rows = Curation.tokenBudgetReport(spark, dir).collect()
    assert(rows.length == 20, "one row per source")
    val totTokens = rows.map(_.getLong(2)).sum
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-4,
      "actual_share sums to ~1")
    // Σ target_bp = 4·1000 + 4·500 + 12·333 = 9996 of 10000 (integer
    // tail split) — targets cover the corpus to within 4 bp
    assert(rows.map(_.getInt(4)).sum == 9996)
    val sumTargets = rows.map(_.getLong(5)).sum
    assert(sumTargets <= totTokens &&
      sumTargets >= totTokens * 9990L / 10000L, "targets ≈ corpus")
    rows.foreach { r =>
      assert(r.getLong(6) == r.getLong(5) - r.getLong(2), "deficit ties out")
      assert(math.abs(r.getDouble(7) -
        r.getLong(5).toDouble / r.getLong(2)) < 1e-3, "repeat_factor")
    }
  }

  test("st11 streaming drift monitor: emitted windows == batch twin") {
    import graft.streaming.EventConsumer
    // file streaming source wants a directory; stage the events file alone
    val stage = java.nio.file.Files.createTempDirectory("graft_drift").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$stage/events.parquet"))
    val q = EventConsumer.streamingDriftMonitor(spark, stage).writeStream
      .outputMode("append").format("memory").queryName("st11_files")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("st11_files")
      val batch = EventConsumer.batchDriftMonitor(spark, dir)
      assert(streamed.count() > 0)
      // append mode withholds watermark-open windows; every emitted one
      // must match the batch twin exactly (psi included)
      assert(streamed.exceptAll(batch).count() == 0)
    } finally q.stop()
  }
}
