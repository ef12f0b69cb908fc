package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.Tables.t

/** Round-13d contracts: prefix-filter exact similarity join, warehouse
  * snapshot diff + SCD2 merge, forecast backtest, audio segmentation.
  */
class Round13dSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("dedup_prefix_join: LOSSLESS — identical pair set and jaccard " +
      "values to the quadratic all-pairs baseline at the same tau") {
    val fast = Dedup.dedupPrefixJoin(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet
    val truth = Dedup.dedupNgramJaccard(spark, dir)
      .collect().map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"),
        math.round(r.getAs[Double]("jaccard") * 1e9))).toSet
    assert(fast == truth,
      s"prefix join diverged: only-fast=${(fast -- truth).take(3)} " +
        s"only-truth=${(truth -- fast).take(3)}")
    assert(truth.nonEmpty, "vacuous fixture: no pairs at tau")
  }

  test("wh_snapshot_diff: change classes match the simulation arithmetic " +
      "and unchanged keys are never emitted") {
    val keys = t(spark, dir, "customer").select("c_custkey")
      .collect().map(_.getLong(0))
    val added = keys.count(k => k % 13 == 5 && k % 11 != 4)
    val removed = keys.count(k => k % 11 == 4 && k % 13 != 5)
    val changed = keys.count(k =>
      k % 13 != 5 && k % 11 != 4 && (k % 10 == 3 || k % 10 == 7))
    val rows = Warehouse.whSnapshotDiff(spark, dir).collect()
    val byType = rows.groupBy(_.getAs[String]("change_type"))
      .view.mapValues(_.length).toMap
    assert(byType.getOrElse("added", 0) == added)
    assert(byType.getOrElse("removed", 0) == removed)
    assert(byType.getOrElse("changed", 0) == changed)
    assert(byType.keySet == Set("added", "removed", "changed"))
    rows.foreach { r =>
      r.getAs[String]("change_type") match {
        case "added" => assert(r.getAs[String]("old_fp") == null &&
          r.getAs[String]("new_fp") != null)
        case "removed" => assert(r.getAs[String]("old_fp") != null &&
          r.getAs[String]("new_fp") == null)
        case "changed" =>
          assert(r.getAs[String]("old_fp") != r.getAs[String]("new_fp"))
      }
    }
    assert(added > 0 && removed > 0 && changed > 0,
      "vacuous simulation: some change class is empty")
  }

  test("wh_scd2: per-key history is consistent — one current version for " +
      "every live key, closed v1 iff changed/removed, ranges chain") {
    val rows = Warehouse.whScd2(spark, dir).collect()
    val byKey = rows.groupBy(_.getAs[Long]("c_custkey"))
    val keys = t(spark, dir, "customer").select("c_custkey")
      .collect().map(_.getLong(0)).filter(k => k % 13 != 5 || k % 11 != 4)
    assert(byKey.keySet == keys.toSet, "every surviving key has history")
    byKey.foreach { case (k, vs) =>
      assert(vs.length <= 2, s"key $k has ${vs.length} versions")
      val live = k % 11 != 4
      val current = vs.filter(_.getAs[Boolean]("is_current"))
      if (live) {
        assert(current.length == 1, s"live key $k must have ONE open version")
        assert(current.head.getAs[java.sql.Date]("valid_to") == null)
      } else {
        assert(current.isEmpty, s"churned key $k must be fully closed")
        assert(vs.length == 1 &&
          vs.head.getAs[java.sql.Date]("valid_to") != null)
      }
      if (vs.length == 2) {
        val v1 = vs.find(_.getAs[Int]("version") == 1).get
        val v2 = vs.find(_.getAs[Int]("version") == 2).get
        assert(v1.getAs[java.sql.Date]("valid_to") ==
          v2.getAs[java.sql.Date]("valid_from"),
          s"key $k: v1 close must equal v2 open (no gap, no overlap)")
      }
    }
    // the planted drifts actually produce version-2 rows
    assert(rows.count(_.getAs[Int]("version") == 2) > 0)
  }

  test("ts_backtest: rolling-origin eval counts match the lag structure " +
      "and the seasonal-naive horizon is 6 days shorter than naive") {
    val rows = EventAnalytics.tsBacktest(spark, dir).collect()
    assert(rows.map(_.getAs[String]("method")).toSet ==
      Set("naive", "snaive", "ma3"))
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (et, ms) =>
      def n(m: String): Long = ms.find(_.getAs[String]("method") == m)
        .map(_.getAs[Long]("n_evals")).getOrElse(0L)
      // lag-k forecasts score exactly (days - k) rows of a gapless series;
      // with gaps the observed-row lag still scores (rows - k)
      assert(n("naive") == n("snaive") + 6,
        s"$et: naive ${n("naive")} vs snaive ${n("snaive")}")
      assert(n("ma3") == n("naive") - 2)
      ms.foreach { r =>
        val mae = r.getAs[Double]("mae")
        assert(mae >= 0.0)
        assert(math.abs(r.getAs[Double]("bias")) <= mae + 1e-9,
          "mean signed error can never exceed mean absolute error")
      }
    }
  }

  test("mm_audio_segments: window stats replay the planted silence plan " +
      "through the real byte boundary") {
    val rows = Multimodal.mmAudioSegments(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val nw = ((256 + id % 256) / 64).toInt
      assert(r.getAs[Int]("n_windows") == nw)
      val active = (0 until nw).map(w => (w + id) % 3 != 0)
      assert(r.getAs[Int]("n_active") == active.count(identity))
      val runs = active.foldLeft(List.empty[Int]) {
        case (acc, false) => 0 :: acc
        case (Nil, true) => List(1)
        case (h :: t, true) => (h + 1) :: t
      }.filter(_ > 0)
      assert(r.getAs[Int]("n_segments") == runs.length)
      assert(r.getAs[Int]("longest_run") ==
        (if (runs.isEmpty) 0 else runs.max))
    }
    // the period-3 plan always leaves at least one silent window at nw>=4,
    // so segmentation is non-vacuous on every row
    assert(rows.forall(r =>
      r.getAs[Int]("n_active") < r.getAs[Int]("n_windows")))
  }
}
