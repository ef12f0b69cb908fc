package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table layer: explicit schemas + readers for the driver-provided parquet
  * tables (TESTDATA.md) and for the reference-shaped CSV/row inputs
  * (reference DDL: /root/reference/sql/ddl-retail.sql:2-11).
  *
  * Scale notes: parquet scans are the only sanctioned entry point for fact
  * tables — columnar, splittable, predicate-pushdown friendly. Schemas are
  * declared explicitly where the source format carries none (CSV, rows) so
  * no inference pass is ever scheduled on a 100 TB input.
  */
object Tables {

  /** Read one of the driver test tables. Parquet carries its own schema;
    * Catalyst prunes columns + pushes filters into the scan.
    *
    * The `events` table's `ts` has shipped under TWO physical encodings
    * across fixture generations: TIMESTAMP(NANOS) — which vanilla Spark
    * rejects ([PARQUET_TYPE_ILLEGAL]), so the GraftSession contract sets
    * `nanosAsLong=true` and the column arrives as LongType nanos — and
    * plain microsecond TIMESTAMP, which arrives as TimestampType directly.
    * [[normalizeEventTs]] branches on the physical type so both encodings
    * normalize to the same logical TimestampType column; hardcoding either
    * contract breaks the moment the fixture is regenerated the other way.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventTs(raw) else raw
  }

  /** Reference `retail` schema (sql/ddl-retail.sql:2-11). Explicit schema —
    * never schema-inference — so a CSV scan is single-pass at any scale.
    */
  val retailSchema: StructType = StructType(Seq(
    StructField("InvoiceNo", StringType),
    StructField("StockCode", StringType),
    StructField("Description", StringType),
    StructField("Quantity", IntegerType),
    StructField("InvoiceDate", DateType),
    StructField("UnitPrice", DoubleType),
    StructField("CustomerID", StringType),
    StructField("Country", StringType),
  ))

  /** Reference scraped-match shape (dags/projectde_dag.py:49-55) with the
    * determinism contract's explicit ordinal (SURVEY §2).
    */
  val matchesRawSchema: StructType = StructType(Seq(
    StructField("ordinal", IntegerType, nullable = false),
    StructField("date", StringType),
    StructField("home_team", StringType),
    StructField("score", StringType),
    StructField("away_team", StringType),
    StructField("league", StringType),
  ))

  /** events schema on the Kafka WIRE (the replay source's JSON values and
    * what a keyed producer puts on the real topic): `ts` is the raw
    * long-nanos epoch value regardless of how the parquet fixture encodes
    * it — KafkaReplay re-derives nanos when the fixture stores micros
    * TIMESTAMP, so the consumer-side `from_json` decode is one stable
    * schema. NOT the file schema: for the file streaming source use
    * [[eventsFileSchema]], which probes the actual footer.
    */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
  ))

  /** Physical schema of an events parquet path, probed from the footer —
    * one metadata read, no data scan. `readStream` requires an explicit
    * schema and it must match the file's physical encoding (LongType
    * nanos vs TimestampType micros), which has changed between fixture
    * generations; deriving it from the footer instead of assuming either
    * keeps the streaming sources fixture-proof.
    */
  def eventsFileSchema(spark: SparkSession, path: String): StructType =
    spark.read.parquet(path).schema

  /** Normalize `ts` to logical TimestampType from whichever physical
    * encoding the source delivered:
    *
    *  - LongType ⇒ nanos-as-long fixture generation (rebuild micros with
    *    integer `div`, not `/` — nanos since epoch exceed double's 2^53
    *    range);
    *  - TimestampNTZType ⇒ micros TIMESTAMP written with
    *    isAdjustedToUTC=false (the current driver fixture); cast to
    *    TimestampType — exact under the library's UTC session contract;
    *  - TimestampType ⇒ already the target type, pass through.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case _: TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
    case _: TimestampType => df
    case other => throw new IllegalArgumentException(
      s"events.ts has unsupported physical type $other " +
        "(expected LongType nanos, TIMESTAMP_NTZ micros, or TIMESTAMP micros)")
  }
}
