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

  test("native Shingles3Distinct == SQL twin on all 500 docs + edge cases") {
    GraftFunctions.register(spark)
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), tokens(col("text")).as("w"))
    val diff = docs.select(
      call_function("graft_shingles3", col("w")).as("native"),
      array_distinct(shingles3("w")).as("sql"))
      .filter(to_json(col("native")) =!= to_json(col("sql")))
    assert(diff.count() == 0)
    // short docs (0/1/2 tokens) and a doc with repeated shingles
    import spark.implicits._
    val edge = Seq("", "one", "one two", "a b c a b c a b c", "x y z")
      .toDF("text").select(tokens(col("text")).as("w"))
    val ediff = edge.select(
      call_function("graft_shingles3", col("w")).as("native"),
      array_distinct(shingles3("w")).as("sql"))
      .filter(to_json(col("native")) =!= to_json(col("sql")))
    assert(ediff.count() == 0)
  }
}
