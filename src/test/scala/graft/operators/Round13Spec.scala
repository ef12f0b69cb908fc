package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.Tables.t

/** Round-13 contracts: partitioned histogram quantiles and multi-touch
  * linear attribution.
  */
class Round13Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("a19: histogram estimates bound the exact percentiles, bins are " +
      "width multiples, order holds") {
    val r = Relational.a19HistogramQuantiles(spark, dir).collect()(0)
    val (p50, p90, p99) = (r.getAs[Double]("p50_est"),
      r.getAs[Double]("p90_est"), r.getAs[Double]("p99_est"))
    assert(r.getAs[Boolean]("p50_ok") && r.getAs[Boolean]("p90_ok") &&
      r.getAs[Boolean]("p99_ok"))
    assert(p50 <= p90 && p90 <= p99)
    Seq(p50, p90, p99).foreach(p =>
      assert(p % Profiling.DriftBucketWidth == 0.0, s"bin lower bound $p"))
    // the artifact answers from |days|x|bins| rows; n_values must equal
    // the raw range count it stands in for
    val exactN = t(spark, dir, "events")
      .filter(to_date(col("ts")).between(lit("2024-01-08"), lit("2024-01-21")))
      .count()
    assert(r.getAs[Long]("n_values") == exactN)
    assert(r.getAs[Long]("range_days") == 14L)
  }

  test("text_classifier_train learns the known corpus signal; eval " +
      "beats the untrained boundary by an exact margin") {
    val w = TextAnalysis.textClassifierTrain(spark, dir).collect()
      .map(r => (r.getAs[Int]("bucket"), r.getAs[Long]("weight_micro")))
      .toMap
    assert(w.size == 66)
    // longer docs score higher quality (the 0.4·len term), so the length
    // feature must come out positive; all features are non-negative, so
    // the intercept must have learned the NEGATIVE shift that moves the
    // decision boundary off all-positive
    assert(w(64) > 0, s"length weight ${w(64)}")
    assert(w(65) < 0, s"intercept ${w(65)}")
    // the offset-shift exactness argument needs |w| < 4
    assert(w.values.forall(v => math.abs(v) < 4000000L))
    val e = TextAnalysis.textClassifierEval(spark, dir).collect()(0)
    val (n, pos, correct) = (e.getAs[Long]("n_docs"),
      e.getAs[Long]("n_pos_label"), e.getAs[Long]("n_correct"))
    // untrained boundary (w=0 -> z=0 -> all positive) scores exactly
    // `pos` correct; the whole fold is integer-deterministic so this
    // margin is exact, not statistical
    assert(correct > pos, s"trained $correct vs baseline $pos of $n")
    assert(e.getAs[Long]("n_pred_pos") < n,
      "trained model must not predict all-positive")
  }

  test("ev_attribution_multi: credit is conserved to the micro-unit") {
    val multi = EventAnalytics.evAttributionMulti(spark, dir).collect()
    assert(multi.nonEmpty)
    val purchases = t(spark, dir, "events")
      .filter(col("event_type") === "purchase")
    val nPur = purchases.count()
    val revCents = purchases
      .agg(sum(round(col("value") * 100).cast("long"))).head().getLong(0)
    val convSum = multi.map(_.getAs[Double]("n_conversions")).sum
    val revSum = multi.map(_.getAs[Double]("revenue")).sum
    // integer micro-credit conservation: channel totals reassemble the
    // purchase totals exactly (up to the 6-dp emit rounding)
    assert(math.abs(convSum - nPur) < 1e-6, s"$convSum vs $nPur")
    assert(math.abs(revSum - revCents / 100.0) < 1e-4,
      s"$revSum vs ${revCents / 100.0}")
    // fair-share property: multi spreads credit across at least as many
    // channels as last-touch, and every share is positive
    val lastTouch = EventAnalytics.evAttribution(spark, dir).collect()
    assert(multi.length >= lastTouch.length)
    assert(multi.forall(_.getAs[Double]("n_conversions") > 0))
  }
}
