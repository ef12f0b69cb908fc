package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Stress proof for the two-phase rank (`scalableRowNumber`) at real table
  * size: 600,000 lineitem rows at sf0.1 — 3,000× the 200-supplier relation
  * `o1_multikey_sort` ranks. Two claims:
  *
  *  1. PARITY — the bucketed rank equals the single-partition window idiom
  *     row-for-row (checked by an order-insensitive hash over
  *     (rank, full row key), not a sampled subset).
  *  2. DISTRIBUTION — the approxQuantile range buckets actually spread the
  *     table: every bucket non-empty and no bucket above ~3× the ideal
  *     share, so no per-bucket window partition degenerates back into the
  *     single-partition sort the operator exists to avoid.
  */
class ScalableRowNumberSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.1"

  private def lineitem = graft.Tables.t(spark, dir, "lineitem")
    .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))

  private val sortCols = Seq(col("l_extendedprice").desc,
    col("l_orderkey").asc, col("l_linenumber").asc)

  test("600k-row hash parity with the window idiom") {
    val li = lineitem
    val fast = Relational.scalableRowNumber(li, leading = "l_extendedprice",
      descending = true, sortCols = sortCols, outCol = "pos")
    val idiom = li.withColumn("pos",
      row_number().over(Window.orderBy(sortCols: _*)))

    def digest(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(
        count(lit(1)).as("n"),
        sum(xxhash64(col("pos"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))).as("h")).head()
      (r.getLong(0), r.getLong(1))
    }
    val (nFast, hFast) = digest(fast)
    val (nIdiom, hIdiom) = digest(idiom)
    assert(nFast == 600000L, s"row count $nFast")
    assert(nFast == nIdiom)
    assert(hFast == hIdiom,
      "bucketed rank diverged from the single-partition window idiom")
  }

  test("range buckets spread 600k rows: all populated, none degenerate") {
    val buckets = 32
    val counts = Relational
      .bucketAssign(lineitem, "l_extendedprice", descending = true, buckets)
      .groupBy(col("__bk")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

    assert(counts.keySet == (0 until buckets).toSet,
      s"expected $buckets populated buckets, got ${counts.keySet.toSeq.sorted}")
    val ideal = 600000.0 / buckets
    val max = counts.values.max
    assert(max <= (3 * ideal).toLong,
      s"hottest bucket $max rows vs ideal ${ideal.toLong} — " +
        "a 3×-over bucket means the per-bucket sort re-concentrates")
    // buckets are ordered: the global maximum price row must land in
    // bucket 0 (descending order ⇒ first bucket holds the first ranks)
    val topBucket = Relational
      .bucketAssign(lineitem, "l_extendedprice", descending = true, buckets)
      .orderBy(col("l_extendedprice").desc).select(col("__bk")).head().getInt(0)
    assert(topBucket == 0, s"global max price landed in bucket $topBucket")
  }
}
