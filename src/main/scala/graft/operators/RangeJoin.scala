package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Range join: fact rows matched to [lo, hi) value bands. Spark plans a
  * bare inequality join as BroadcastNestedLoopJoin — O(|fact|·|bands|)
  * predicate evaluations and a broadcast requirement on one whole side.
  * The banded form turns it into an EQUI-join: each band explodes into
  * the fixed-width buckets it overlaps, each fact row computes its single
  * bucket map-side, the join runs on the bucket key (hash/sort-merge,
  * AQE-broadcastable), and the exact [lo, hi) predicate filters the
  * superset inside the join. Bucket fan-out is |band width| / w per band
  * row — bands are small by nature, so the exploded side stays tiny while
  * the fact side never fans out at all (one bucket per row).
  */
object RangeJoin {

  /** `bands` must carry `lo` (inclusive) / `hi` (exclusive) columns; every
    * other bands column is kept on the output rows.
    */
  def banded(fact: DataFrame, valueCol: Column, bands: DataFrame,
      bucketWidth: Double): DataFrame = {
    val exploded = bands.withColumn("__bk", explode(sequence(
      floor(col("lo") / bucketWidth).cast("long"),
      floor(col("hi") / bucketWidth).cast("long"))))
    fact.withColumn("__bk", floor(valueCol / bucketWidth).cast("long"))
      .join(exploded, Seq("__bk"))
      .filter(valueCol >= col("lo") && valueCol < col("hi"))
      .drop("__bk")
  }

  /** The demo bands: non-uniform price tiers (so bands overlap different
    * numbers of buckets and the rewrite is exercised for real).
    */
  private val tiers = Seq(
    (0.0, 2000.0, "micro"), (2000.0, 10000.0, "small"),
    (10000.0, 50000.0, "mid"), (50000.0, 200000.0, "large"),
    (200000.0, 600000.0, "jumbo"))

  /** J4 — orders priced into tiers through the banded range join. */
  def j4RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands = tiers.toDF("lo", "hi", "tier")
    banded(
      t(spark, dir, "orders").select(col("o_orderkey"), col("o_totalprice")),
      col("o_totalprice"), bands, bucketWidth = 10000.0)
      .select(col("o_orderkey"), col("o_totalprice"), col("tier"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j4_range_join" -> (j4RangeJoin _),
  )

  val oracle: Map[String, String] = Map(
    "j4_range_join" -> """
      WITH bands(lo, hi, tier) AS (VALUES
        (0.0, 2000.0, 'micro'), (2000.0, 10000.0, 'small'),
        (10000.0, 50000.0, 'mid'), (50000.0, 200000.0, 'large'),
        (200000.0, 600000.0, 'jumbo'))
      SELECT o.o_orderkey, o.o_totalprice, b.tier
      FROM orders o JOIN bands b
        ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi""",
  )
}
