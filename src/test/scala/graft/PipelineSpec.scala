package graft

import java.nio.file.Files
import java.time.LocalDate

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.expr.MatchExprs
import graft.pipeline.{BatchPipeline, RetailPipeline}

/** Golden end-to-end tests for the reference-parity pipelines (EP1/EP3)
  * on reference-shaped fixtures (FIXTURES.md §A).
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val asOf = LocalDate.of(2025, 2, 24)
  private val runTs = "2025-02-24 02:00:00" // UTC → 09:00:00 Jakarta

  /** Raw fixture covering every cleaning branch: junk rows, malformed
    * score, unparseable date, future match, Aug–Dec (year-inference).
    */
  private def rawFixture = {
    import spark.implicits._
    Seq(
      // (ordinal, date, home_team, score, away_team, league)
      (1, "Sa 15 Feb", "Arsenal", "2 - 1", "Chelsea", "england"),
      (2, "Su 16 Feb", "Leeds", "0 - 0", "Arsenal", "england"),
      (3, "Averages", "x", "-", "y", "england"),          // junk (F1)
      (4, "Mo 17 Feb", "Totals", "9 - 9", "z", "england"), // junk (F1)
      (5, "Tu 32 Xyz", "Fulham", "1 - 0", "Leeds", "england"), // bad date (F5)
      (6, "We 26 Feb", "Chelsea", "", "Leeds", "england"), // future (F3)
      (7, "Sa 10 Aug", "Chelsea", "-", "Arsenal", "england"), // malformed score (X2)
      (8, "Xx 20 Dec", "Lyon", "3 - 2", "Nice", "france"), // unknown day abbrev (X4)
      (9, "Su 23 Feb", "Nice", "2 - 2", "Lyon", "france"), // YESTERDAY — kept (F3)
    ).toDF("ordinal", "date", "home_team", "score", "away_team", "league")
      .selectExpr("ordinal", "date", "home_team", "score", "away_team", "league")
  }

  test("clean: golden rows across every branch") {
    val out = MatchExprs.clean(rawFixture, asOf, runTs)
      .orderBy("league", "id").collect()
    // 9 raw − 2 junk − 1 bad date − 1 future = 5 surviving matches
    assert(out.length == 5)
    // F3: a match dated exactly yesterday (asOf-1) is KEPT — the daily
    // 09:00 pipeline must not omit the most recent day's results.
    assert(out.exists(_.getAs[java.sql.Date]("date").toString == "2025-02-23"))
    val arsenal = out(0)
    assert(arsenal.getAs[Int]("id") == 1)
    assert(arsenal.getAs[String]("day") == "Saturday")
    assert(arsenal.getAs[java.sql.Date]("date").toString == "2025-02-15")
    assert(arsenal.getAs[Int]("home_score") == 2 &&
      arsenal.getAs[Int]("away_score") == 1)
    assert(arsenal.getAs[Int]("result_home") == 3 &&
      arsenal.getAs[Int]("result_away") == 0)
    assert(arsenal.getAs[String]("created_at") == "2025-02-24 09:00:00")
    // Aug date → prior year (X5)
    val aug = out.find(_.getAs[String]("home_team") == "Chelsea").get
    assert(aug.getAs[java.sql.Date]("date").toString == "2024-08-10")
    // malformed score → nulls, result 0/0 shape (reference: None scores)
    assert(aug.isNullAt(aug.fieldIndex("home_score")))
    // unknown day abbreviation passes through (X4 default)
    val fr = out.find(_.getAs[String]("league") == "france").get
    assert(fr.getAs[String]("day") == "Xx")
    assert(fr.getAs[Int]("id") == 1) // per-league dense ids
  }

  test("batch pipeline: league-partitioned writes + per-league standings") {
    val outDir = Files.createTempDirectory("graft_pipe").toString
    val res = BatchPipeline.run(spark, rawFixture, asOf, runTs, outDir)
    // partitionBy layout prunes by league
    assert(new java.io.File(s"$outDir/standings/league=england").exists())
    assert(new java.io.File(s"$outDir/standings/league=france").exists())
    val eng = res.standings.filter("league = 'england'")
      .orderBy("id").collect()
    // played england matches with scores: Arsenal 2-1 Chelsea, Leeds 0-0 Arsenal
    // Arsenal: W1 D1 → 4 pts; Leeds: D1 → 1 pt; Chelsea: L1 → 0 pts
    assert(eng.map(r => (r.getAs[String]("club"), r.getAs[Long]("points")))
      .toSeq == Seq(("Arsenal", 4L), ("Leeds", 1L), ("Chelsea", 0L)))
    assert(eng.map(_.getAs[Int]("id")).toSeq == Seq(1, 2, 3))
    val fr = res.standings.filter("league = 'france'").collect()
    assert(fr.map(_.getAs[String]("club")).toSet == Set("Lyon", "Nice"))
  }

  test("retail ingest: explicit schema, typed columns, preview") {
    val dir = Files.createTempDirectory("graft_retail").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/retail.csv"),
      """InvoiceNo,StockCode,Description,Quantity,InvoiceDate,UnitPrice,CustomerID,Country
        |536365,85123A,HOLDER,6,2010-12-01,2.55,17850,United Kingdom
        |536366,71053,,-2,2010-12-01,3.39,,France
        |""".stripMargin)
    val retail = RetailPipeline.ingest(spark, s"$dir/retail.csv", dir)
    assert(retail.schema == Tables.retailSchema)
    val rows = RetailPipeline.preview(retail)
    assert(rows.length == 2)
    val r0 = rows(0)
    assert(r0.getAs[Int]("Quantity") == 6)
    assert(r0.getAs[java.sql.Date]("InvoiceDate").toString == "2010-12-01")
    assert(rows(1).isNullAt(rows(1).fieldIndex("Description"))) // nullable
    assert(rows(1).getAs[Int]("Quantity") == -2) // returns
  }
}
