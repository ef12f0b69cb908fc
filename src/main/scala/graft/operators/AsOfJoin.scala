package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** As-of join — the brief's canonical "operator Spark lacks", built by
  * preference-order (a): COMPOSITION. The classic scalable form is the
  * union-sort-window trick: tag both relations, union them, and carry the
  * most recent right-side row forward with last(ignoreNulls) over a
  * (key, time) window. ONE shuffle on the key, zero join explosion, works
  * at any skew — the shape a custom SparkPlan would only marginally beat.
  *
  * Demonstration relation: orders split into even/odd orderkeys (unique,
  * monotonic — a deterministic stand-in for event time with no ties);
  * for each even order, the customer's latest odd order with a smaller
  * key. Left-join semantics: first orders have no match (nulls). DuckDB's
  * native ASOF LEFT JOIN is the oracle.
  */
object AsOfJoin {

  /** Generic as-of: for each left row, the right row with the greatest
    * `timeCol` strictly below the left's, per `keyCol`. `timeCol` must be
    * unique per key on the union (caller guarantees; ties would make any
    * as-of nondeterministic).
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, rightPayload: Seq[String]): DataFrame = {
    val payload = struct(rightPayload.map(col): _*)
    val rTagged = right.select(col(keyCol), col(timeCol),
      payload.as("r_payload"), lit(0).as("side"))
    val lTagged = left.withColumn("side", lit(1)) // keeps ALL left columns
    // side=0 sorts before side=1 at equal time → a right row at exactly
    // the left's time would be visible; with unique times per key this
    // reduces to strict "<" semantics.
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol).asc, col("side").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    rTagged.unionByName(lTagged, allowMissingColumns = true)
      .withColumn("matched", last(col("r_payload"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .drop("r_payload", "side")
  }

  def asofPrevOrder(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val evens = orders.filter(col("o_orderkey") % 2 === 0)
    val odds = orders.filter(col("o_orderkey") % 2 === 1)
      .withColumnRenamed("o_orderkey", "prev_orderkey")
      .withColumnRenamed("o_totalprice", "prev_totalprice")
      .withColumn("o_orderkey", col("prev_orderkey"))
    asOf(evens, odds, keyCol = "o_custkey", timeCol = "o_orderkey",
      rightPayload = Seq("prev_orderkey", "prev_totalprice"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("matched.prev_orderkey").as("prev_orderkey"),
        col("matched.prev_totalprice").as("prev_totalprice"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "asof_prev_order" -> (asofPrevOrder _),
  )

  val oracle: Map[String, String] = Map(
    "asof_prev_order" -> """
      SELECT a.o_custkey, a.o_orderkey, a.o_totalprice,
             b.o_orderkey AS prev_orderkey, b.o_totalprice AS prev_totalprice
      FROM (SELECT * FROM orders WHERE o_orderkey % 2 = 0) a
      ASOF LEFT JOIN (SELECT * FROM orders WHERE o_orderkey % 2 = 1) b
        ON a.o_custkey = b.o_custkey AND b.o_orderkey < a.o_orderkey""",
  )
}
