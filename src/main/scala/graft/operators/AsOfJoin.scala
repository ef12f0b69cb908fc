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

  /** Generic as-of: for each left row, the nearest right row strictly
    * before (`direction = "backward"`) or strictly after (`"forward"`)
    * the left's `timeCol`, per `keyCol`. `timeCol` must be unique per key
    * on the union (caller guarantees; ties would make any as-of
    * nondeterministic). `tolerance` (same units as `timeCol`) nulls the
    * match when the time gap exceeds it — pandas merge_asof semantics —
    * WITHOUT changing which row matched: still one shuffle, no join
    * explosion, tolerance applied as a map-side post-predicate.
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, rightPayload: Seq[String],
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"asOf direction must be backward|forward|nearest, got $direction")
    val payload = struct((col(timeCol).as("__t") +:
      rightPayload.map(col)): _*)
    val rTagged = right.select(col(keyCol), col(timeCol),
      payload.as("r_payload"), lit(0).as("side"))
    val lTagged = left.withColumn("side", lit(1)) // keeps ALL left columns
    // Backward: right rows sort before left at equal time (side asc) and
    // the frame ends at -1 → strict "<" given unique times. Forward is
    // the mirror: left first at equal time (side desc), frame starts
    // at +1 → strict ">". Nearest evaluates both frames over the SAME
    // hash exchange (two sorts, one shuffle) and picks the closer match,
    // ties to backward — pandas merge_asof's nearest rule.
    val base = Window.partitionBy(col(keyCol))
    val wb = base.orderBy(col(timeCol).asc, col("side").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wf = base.orderBy(col(timeCol).asc, col("side").desc)
      .rowsBetween(1, Window.unboundedFollowing)
    val union = rTagged.unionByName(lTagged, allowMissingColumns = true)
    val joined = (direction match {
      case "backward" => union.withColumn("matched",
        last(col("r_payload"), ignoreNulls = true).over(wb))
      case "forward" => union.withColumn("matched",
        first(col("r_payload"), ignoreNulls = true).over(wf))
      case _ => union
        .withColumn("mb", last(col("r_payload"), ignoreNulls = true).over(wb))
        .withColumn("mf", first(col("r_payload"), ignoreNulls = true).over(wf))
        .withColumn("matched",
          when(col("mf").isNull, col("mb"))
            .when(col("mb").isNull, col("mf"))
            .when(col(timeCol) - col("mb.__t") <= col("mf.__t") - col(timeCol),
              col("mb"))
            .otherwise(col("mf")))
        .drop("mb", "mf")
    }).filter(col("side") === 1)
      .drop("r_payload", "side")
    tolerance match {
      case None => joined
      case Some(tol) => joined.withColumn("matched",
        when(abs(col(timeCol) - col("matched.__t")) <= tol, col("matched")))
    }
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

  /** FORWARD as-of: each odd order's next even order per customer. */
  def asofNextOrder(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val odds = orders.filter(col("o_orderkey") % 2 === 1)
    val evens = orders.filter(col("o_orderkey") % 2 === 0)
      .withColumnRenamed("o_orderkey", "next_orderkey")
      .withColumnRenamed("o_totalprice", "next_totalprice")
      .withColumn("o_orderkey", col("next_orderkey"))
    asOf(odds, evens, keyCol = "o_custkey", timeCol = "o_orderkey",
      rightPayload = Seq("next_orderkey", "next_totalprice"),
      direction = "forward")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("matched.next_orderkey").as("next_orderkey"),
        col("matched.next_totalprice").as("next_totalprice"))
  }

  /** Backward as-of with a tolerance: the previous odd order only when it
    * is within 100 orderkeys (merge_asof tolerance semantics).
    */
  def asofToleranceOrder(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val evens = orders.filter(col("o_orderkey") % 2 === 0)
    val odds = orders.filter(col("o_orderkey") % 2 === 1)
      .withColumnRenamed("o_orderkey", "prev_orderkey")
      .withColumnRenamed("o_totalprice", "prev_totalprice")
      .withColumn("o_orderkey", col("prev_orderkey"))
    asOf(evens, odds, keyCol = "o_custkey", timeCol = "o_orderkey",
      rightPayload = Seq("prev_orderkey", "prev_totalprice"),
      direction = "backward", tolerance = Some(100L))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("matched.prev_orderkey").as("prev_orderkey"),
        col("matched.prev_totalprice").as("prev_totalprice"))
  }

  /** NEAREST as-of: each even order's closest odd order per customer,
    * whichever direction is closer (ties to backward) — completing
    * merge_asof's direction set.
    */
  def asofNearestOrder(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val evens = orders.filter(col("o_orderkey") % 2 === 0)
    val odds = orders.filter(col("o_orderkey") % 2 === 1)
      .withColumnRenamed("o_orderkey", "near_orderkey")
      .withColumnRenamed("o_totalprice", "near_totalprice")
      .withColumn("o_orderkey", col("near_orderkey"))
    asOf(evens, odds, keyCol = "o_custkey", timeCol = "o_orderkey",
      rightPayload = Seq("near_orderkey", "near_totalprice"),
      direction = "nearest")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("matched.near_orderkey").as("near_orderkey"),
        col("matched.near_totalprice").as("near_totalprice"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "asof_prev_order" -> (asofPrevOrder _),
    "asof_next_order" -> (asofNextOrder _),
    "asof_tolerance" -> (asofToleranceOrder _),
    "asof_nearest" -> (asofNearestOrder _),
  )

  val oracle: Map[String, String] = Map(
    "asof_prev_order" -> """
      SELECT a.o_custkey, a.o_orderkey, a.o_totalprice,
             b.o_orderkey AS prev_orderkey, b.o_totalprice AS prev_totalprice
      FROM (SELECT * FROM orders WHERE o_orderkey % 2 = 0) a
      ASOF LEFT JOIN (SELECT * FROM orders WHERE o_orderkey % 2 = 1) b
        ON a.o_custkey = b.o_custkey AND b.o_orderkey < a.o_orderkey""",
    "asof_next_order" -> """
      SELECT a.o_custkey, a.o_orderkey, a.o_totalprice,
             b.o_orderkey AS next_orderkey, b.o_totalprice AS next_totalprice
      FROM (SELECT * FROM orders WHERE o_orderkey % 2 = 1) a
      ASOF LEFT JOIN (SELECT * FROM orders WHERE o_orderkey % 2 = 0) b
        ON a.o_custkey = b.o_custkey AND b.o_orderkey > a.o_orderkey""",
    "asof_tolerance" -> """
      SELECT a.o_custkey, a.o_orderkey, a.o_totalprice,
             CASE WHEN a.o_orderkey - b.o_orderkey <= 100
               THEN b.o_orderkey END AS prev_orderkey,
             CASE WHEN a.o_orderkey - b.o_orderkey <= 100
               THEN b.o_totalprice END AS prev_totalprice
      FROM (SELECT * FROM orders WHERE o_orderkey % 2 = 0) a
      ASOF LEFT JOIN (SELECT * FROM orders WHERE o_orderkey % 2 = 1) b
        ON a.o_custkey = b.o_custkey AND b.o_orderkey < a.o_orderkey""",
    // no native nearest ASOF in DuckDB — replay the union-window form
    "asof_nearest" -> """
      WITH o AS (SELECT o_custkey, o_orderkey, o_totalprice,
                   o_orderkey % 2 = 0 AS is_left
                 FROM orders),
      w AS (SELECT *,
          last_value(CASE WHEN NOT is_left THEN o_orderkey END IGNORE NULLS)
            OVER wb AS pk,
          last_value(CASE WHEN NOT is_left THEN o_totalprice END IGNORE NULLS)
            OVER wb AS pv,
          first_value(CASE WHEN NOT is_left THEN o_orderkey END IGNORE NULLS)
            OVER wf AS nk,
          first_value(CASE WHEN NOT is_left THEN o_totalprice END IGNORE NULLS)
            OVER wf AS nv
        FROM o
        WINDOW
          wb AS (PARTITION BY o_custkey ORDER BY o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
          wf AS (PARTITION BY o_custkey ORDER BY o_orderkey
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
      SELECT o_custkey, o_orderkey, o_totalprice,
        CASE WHEN nk IS NULL OR (pk IS NOT NULL
               AND o_orderkey - pk <= nk - o_orderkey) THEN pk ELSE nk END
          AS near_orderkey,
        CASE WHEN nk IS NULL OR (pk IS NOT NULL
               AND o_orderkey - pk <= nk - o_orderkey) THEN pv ELSE nv END
          AS near_totalprice
      FROM w WHERE is_left""",
  )
}
