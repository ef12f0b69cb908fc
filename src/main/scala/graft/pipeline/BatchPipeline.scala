package graft.pipeline

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.expr.MatchExprs
import graft.operators.Relational

/** EP1 equivalent (ref dags/projectde_dag.py): the daily batch pipeline
  * extract → clean → load matches → standings → load standings, as ONE
  * declarative plan per run instead of five XCom-separated task processes.
  *
  * D1 stage boundaries become plan actions; D2's static 6-league fan-out
  * becomes a single league-partitioned plan + partitionBy("league") writes
  * (downstream reads prune by league); D3's schedule becomes the explicit
  * `asOf`/`runTs` parameters; D4's drop-and-replace becomes
  * SaveMode.Overwrite. The reference's duplicate standings write
  * (dags/projectde_dag.py:245,267) is collapsed to one.
  *
  * Sinks are parquet here; the JDBC seam (Sources.jdbcOverwriteWriter)
  * swaps in per-table without touching the plan (SURVEY §7.4 risk 7).
  */
object BatchPipeline {

  case class Result(matches: DataFrame, standings: DataFrame)

  /** Run the pipeline over raw scraped-shape matches. Writes
    * `$outDir/matches` and `$outDir/standings`, both partitioned by
    * league, and returns the two relations.
    */
  def run(spark: SparkSession, rawMatches: DataFrame, asOf: LocalDate,
      runTs: String, outDir: String): Result = {
    // Requires the GraftSession non-ANSI contract (reference cleaning is
    // null-on-failure; see GraftSession scaladoc) — set at session
    // construction, never mutated here.
    val matches = MatchExprs.clean(rawMatches, asOf, runTs)
    matches.write.mode(SaveMode.Overwrite)
      .partitionBy("league").parquet(s"$outDir/matches")

    val asMatches = matches.select(col("league"),
      col("home_team").as("home"), col("away_team").as("away"),
      col("home_score").as("hs"), col("away_score").as("as_"))
    val standings = Relational.standingsOf(asMatches, keys = Seq("league"))
      .withColumn("created_at",
        date_format(from_utc_timestamp(lit(runTs).cast("timestamp"),
          "Asia/Jakarta"), "yyyy-MM-dd HH:mm:ss"))
    standings.write.mode(SaveMode.Overwrite)
      .partitionBy("league").parquet(s"$outDir/standings")

    Result(spark.read.parquet(s"$outDir/matches"),
      spark.read.parquet(s"$outDir/standings"))
  }
}
