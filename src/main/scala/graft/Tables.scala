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
    * The `events` table stores TIMESTAMP(NANOS) which vanilla Spark rejects
    * ([PARQUET_TYPE_ILLEGAL]); under the GraftSession contract
    * (`nanosAsLong=true`, set at session construction) we read nanos as
    * long and rebuild a microsecond timestamp with integer arithmetic
    * (`div`, not `/` — nanos since epoch exceed double's 2^53 range).
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
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

  /** events table schema as stored (TESTDATA.md), needed explicitly for the
    * file streaming source (readStream requires a user schema). `ts` is
    * physically TIMESTAMP(NANOS) → read as long under nanosAsLong, rebuilt
    * to TimestampType by `normalizeEventTs`.
    */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
  ))

  def normalizeEventTs(df: DataFrame): DataFrame =
    df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
}
