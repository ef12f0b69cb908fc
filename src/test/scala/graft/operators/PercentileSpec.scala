package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The production percentile surface (a7PercentilesApprox) must track the
  * exact oracle twin (a7Percentiles) within the documented 1% relative
  * bound on every group — exact `percentile` buffers every value per
  * group and is test-scale-only; the sketch is the form that survives a
  * 100 TB group.
  */
class PercentileSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  test("approx_percentile tracks exact within 1% relative error per group") {
    val exact = Relational.a7Percentiles(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = Relational.a7PercentilesApprox(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (status, (p50, p90)) =>
      val (a50, a90) = approx(status)
      assert(math.abs(a50 - p50) / p50 <= 0.01,
        s"$status p50: sketch $a50 vs exact $p50")
      assert(math.abs(a90 - p90) / p90 <= 0.01,
        s"$status p90: sketch $a90 vs exact $p90")
    }
  }

  test("the oracle contract form reports all groups within bound") {
    val rows = Relational.a7PercentilesApproxContract(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3) && r.getBoolean(4),
        s"contract violated for ${r.getString(0)}: $r")
    }
  }
}
