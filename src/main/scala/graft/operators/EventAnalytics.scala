package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-sequence analytics over the events table (SURVEY §2.8 family —
  * the consumer-side analytics the reference's declared Kafka topics imply,
  * Makefile:149-179): the conversion interval join (click → purchase by the
  * same user within 30 minutes) and the per-user funnel aggregate built on
  * it. `conversionPairs` is SHARED between the batch twin (oracle-checked
  * here) and the stream-stream flavor (`conversionPairsStreaming`,
  * exercised in StreamingSpec): in streaming both inputs carry watermarks
  * and the time-range predicate gives Spark the state-expiry bound — the
  * textbook stream-stream interval join.
  *
  * Scale notes: the join shuffles both sides on user_id only; the range
  * predicate evaluates inside each key group, never as a cross product.
  * Streaming state is bounded by watermark + interval; batch skew on a
  * hot user is AQE's skew-join case.
  */
object EventAnalytics {

  private val ConversionWindow = "INTERVAL 30 MINUTES"

  /** Shared transform: click c → purchase p, same user,
    * 0 < p.ts − c.ts ≤ 30 min. Inputs need (user_id, event_id, ts[, value]).
    */
  def conversionPairs(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.select(col("user_id"), col("event_id").as("click_id"),
      col("ts").as("click_ts"))
    val p = purchases.select(col("user_id").as("p_user_id"),
      col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
      col("value").as("purchase_value"))
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") > col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(ConversionWindow))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("purchase_value"))
  }

  /** Stream-stream flavor: watermark both sides, then the same join.
    * Inner-join matches emit immediately; the watermark + range bound lets
    * Spark expire buffered rows ≥ 1h + 30min behind the max event time.
    */
  def conversionPairsStreaming(clicks: DataFrame,
      purchases: DataFrame): DataFrame =
    conversionPairs(
      clicks.withWatermark("ts", "1 hour"),
      purchases.withWatermark("ts", "1 hour"))

  /** ST5 batch twin — the conversion pairs over the events parquet. */
  def evConversions(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.t(spark, dir, "events")
    conversionPairs(e.filter(col("event_type") === "click"),
      e.filter(col("event_type") === "purchase"))
  }

  /** EV1 — per-user funnel: click/purchase volumes, how many clicks
    * converted (≥1 purchase within the window), and the converted flag.
    * Two aggregations over already-shuffled-by-user relations.
    */
  def evFunnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.t(spark, dir, "events")
    val counts = e.groupBy(col("user_id")).agg(
      sum(when(col("event_type") === "click", 1L).otherwise(0L))
        .as("n_clicks"),
      sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("n_purchases"))
    val conv = evConversions(spark, dir)
      .groupBy(col("user_id"))
      .agg(countDistinct(col("click_id")).as("conv_clicks"))
    counts.join(conv, Seq("user_id"), "left_outer")
      .select(col("user_id"), col("n_clicks"), col("n_purchases"),
        coalesce(col("conv_clicks"), lit(0L)).as("n_conv_clicks"),
        (coalesce(col("conv_clicks"), lit(0L)) > 0).as("converted"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_conversions" -> (evConversions _),
    "ev_funnel" -> (evFunnel _),
  )

  val oracle: Map[String, String] = Map(
    "ev_conversions" -> """
      SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
             p.value AS purchase_value
      FROM events c JOIN events p
        ON c.user_id = p.user_id
       AND c.event_type = 'click' AND p.event_type = 'purchase'
       AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE""",
    "ev_funnel" -> """
      WITH conv AS (
        SELECT c.user_id, c.event_id AS click_id
        FROM events c JOIN events p
          ON c.user_id = p.user_id
         AND c.event_type = 'click' AND p.event_type = 'purchase'
         AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE),
      cc AS (SELECT user_id, count(DISTINCT click_id) AS n_conv_clicks
             FROM conv GROUP BY 1),
      base AS (
        SELECT user_id,
          CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clicks,
          CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_purchases
        FROM events GROUP BY 1)
      SELECT b.user_id, b.n_clicks, b.n_purchases,
             CAST(coalesce(cc.n_conv_clicks, 0) AS BIGINT) AS n_conv_clicks,
             coalesce(cc.n_conv_clicks, 0) > 0 AS converted
      FROM base b LEFT JOIN cc ON b.user_id = cc.user_id""",
  )
}
