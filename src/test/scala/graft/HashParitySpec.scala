package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._
import graft.plans.GraftFunctions

/** Pins the custom Catalyst hash expressions to their SQL-composed twins:
  * the twins define the (oracle-checked) semantics; the expressions must
  * produce identical bytes on real corpus data.
  */
class HashParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val sh = {
    GraftFunctions.register(spark)
    graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"), array_distinct(shingles3("w")).as("sh"))
  }

  test("native SimHash64 == SQL twin on all 500 docs") {
    val diff = sh.select(
      call_function("graft_simhash64", col("sh")).as("native"),
      simhash64Sql("sh").as("sql"))
      .filter(col("native") =!= col("sql"))
    assert(diff.count() == 0)
  }

  test("native MinHashSig == SQL twin on all 500 docs") {
    val diff = sh.select(
      call_function("graft_minhash8", col("sh")).as("native"),
      minhashSignatureSql("sh", 8).as("sql"))
      .filter(to_json(col("native")) =!= to_json(col("sql")))
    assert(diff.count() == 0)
  }
}
