package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** ST3 — the reference's declared-but-absent Kafka consumer
  * (Makefile:173-179; kafka jars at docker/Dockerfile.spark:8-10),
  * realized as a Structured Streaming job: tumbling-window aggregation with
  * a watermark. The SAME aggregation runs in batch mode (`batchWindowAgg`)
  * so the DuckDB oracle can replay it — streaming and batch share one
  * transform (SURVEY §2.8).
  *
  * Scale notes: the windowed agg is a streaming stateful operator keyed on
  * (window, event_type) — low cardinality, so state stays tiny; the
  * watermark bounds state growth; in production the source swaps to
  * `format("kafka")` with no change to the transform.
  */
object EventConsumer {

  /** The shared transform: 5-minute tumbling window per event_type. */
  def windowAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"),
      )
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Batch replay over the events parquet — oracle-checkable (st3). */
  def batchWindowAgg(spark: SparkSession, dir: String): DataFrame =
    windowAgg(Tables.t(spark, dir, "events"))

  /** Streaming flavor: file source (stand-in for Kafka in the sandbox) →
    * watermarked windowed agg → memory/parquet sink. Watermark allows
    * 10 minutes of lateness, then state is dropped (append mode).
    */
  def streamingWindowAgg(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    windowAgg(
      Tables.normalizeEventTs(
        spark.readStream
          .schema(Tables.eventsRawSchema)
          .parquet(dir))
        .withWatermark("ts", "10 minutes"))
  }

  /** Start the consumer against a directory of event parquet files, writing
    * to an in-memory table `queryName` (test harness; production would be
    * writeStream.format("parquet")/.format("kafka") with a checkpoint).
    */
  def start(spark: SparkSession, dir: String, queryName: String): StreamingQuery =
    streamingWindowAgg(spark, dir).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st3_window_agg" -> (batchWindowAgg _),
  )

  val oracle: Map[String, String] = Map(
    "st3_window_agg" -> """
      SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
             event_type, count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY 1, 2""",
  )
}
