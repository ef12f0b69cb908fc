package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._

/** Unit tests for the text/dedup building blocks (session-free Column
  * functions evaluated on micro-frames).
  */
class TextFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("text")
      .withColumn("w", tokens(col("text")))
      .select(c.as("r")).collect().head.getAs[T]("r")

  private def oneSeq(c: org.apache.spark.sql.Column, text: String): Seq[String] =
    Seq(text).toDF("text")
      .withColumn("w", tokens(col("text")))
      .select(c.as("r")).collect().head.getSeq[String](0).toSeq

  test("shingles3 over a 5-token doc gives 3 shingles") {
    assert(oneSeq(shingles3("w"), "a b c d e") ==
      Seq("a b c", "b c d", "c d e"))
  }

  test("shingles3 of a short doc is empty, not descending-sequence garbage") {
    assert(oneSeq(shingles3("w"), "a b") == Seq.empty)
  }

  test("minhash signature is order-insensitive over the shingle set") {
    val df = Seq("a b c d e", "e d c b a").toDF("text")
      .withColumn("w", tokens(col("text")))
      .withColumn("sh", array_distinct(shingles3("w")))
      .select(minhashSignatureSql("sh", 4).as("sig"))
    val sigs = df.collect().map(_.getSeq[String](0).toSeq)
    assert(sigs.forall(_.length == 4))
    // different shingle sets → (almost surely) different signatures
    assert(sigs(0) != sigs(1))
  }

  test("identical docs share minhash signature and simhash") {
    val df = Seq("x y z w v u", "x y z w v u").toDF("text")
      .withColumn("w", tokens(col("text")))
      .withColumn("sh", array_distinct(shingles3("w")))
      .select(minhashSignatureSql("sh", 8).as("sig"), simhash64Sql("sh").as("sim"))
    val rows = df.collect()
    assert(rows(0).getSeq[String](0).toSeq == rows(1).getSeq[String](0).toSeq)
    assert(rows(0).getAs[String]("sim") == rows(1).getAs[String]("sim"))
    assert(rows(0).getAs[String]("sim").matches("[01]{64}"))
  }

  test("hammingDist counts differing positions") {
    val d = Seq(("1010", "1001")).toDF("a", "b")
      .select(hammingDist(col("a"), col("b")).as("d"))
      .collect().head.getAs[Int]("d")
    assert(d == 2)
  }

  test("fingerprints: md5 ignores token order, poly hash does not") {
    val df = Seq("b a c", "a b c").toDF("text")
      .withColumn("w", tokens(col("text")))
      .select(fingerprintMd5(col("w")).as("m"), fingerprintPoly(col("text")).as("p"))
    val rows = df.collect()
    assert(rows(0).getAs[String]("m") == rows(1).getAs[String]("m"))
    assert(rows(0).getAs[Long]("p") != rows(1).getAs[Long]("p"))
  }

  test("stopwordCount counts exact stopword tokens") {
    assert(one[Int](stopwordCount(col("w")), "a cat the hat a") == 3)
  }

  test("native winnow equals the SQL twin on the real corpus") {
    graft.plans.GraftFunctions.register(spark)
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select(winnow(col("text")).as("native"), winnowSql("text").as("sql"))
    assert(docs.filter(col("native") =!= col("sql")).count() == 0L)
    assert(docs.count() > 0L)
  }

  test("native winnow equals the SQL twin on supplementary (non-BMP) text") {
    graft.plans.GraftFunctions.register(spark)
    // astral characters are 2 UTF-16 units but ONE code point; the SQL
    // twin counts code points (Spark substring/length semantics, same as
    // DuckDB substr), so the native loop must too (ADVICE r12)
    val astral = Seq(
      "ab😀cdefgh rest of the doc",      // emoji early
      "𓀀𓀁𓀂 plain tail here",
      "mixed 𝔸𝔹 math letters inside a sentence",
      "😀😁😂😃" +
        "😄😅😆😇 all astral")
    val df = astral.toDF("text")
      .select(winnow(col("text")).as("native"), winnowSql("text").as("sql"))
    assert(df.filter(col("native") =!= col("sql")).count() == 0L)
    // and the gram count itself is code-point based: an 8-astral-char
    // string has exactly 1 gram -> 1 fingerprint
    val solo = Seq("😀😁😂😃" +
      "😄😅😆😇").toDF("text")
      .select(winnow(col("text")).as("fp")).collect()
    assert(solo(0).getSeq[Long](0).length == 1)
  }

  test("winnow guarantees a shared fingerprint for a shared long substring") {
    graft.plans.GraftFunctions.register(spark)
    // k + w - 1 = 11: any shared substring of length >= 11 must yield a
    // common selected hash (the winnowing coverage guarantee)
    val shared = "the quick brown fox"
    val df = Seq("aaa " + shared + " bbb", "cc " + shared + " ddddd")
      .toDF("text").select(winnow(col("text")).as("fp"))
    val Array(a, b) = df.collect().map(_.getSeq[Long](0).toSet)
    assert((a intersect b).nonEmpty)
  }

  test("winnow edges: short text empty; under-w grams degrade to global min") {
    graft.plans.GraftFunctions.register(spark)
    val fps = Seq("1234567", "123456789")
      .toDF("text").select(winnow(col("text")).as("fp"))
      .collect().map(_.getSeq[Long](0).toSeq)
    assert(fps(0).isEmpty)      // 7 chars < k=8 -> no grams
    assert(fps(1).length == 1)  // 2 grams < w=4 -> single global min
  }

  test("native fingerprintPoly equals the SQL twin on the real corpus") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select(fingerprintPoly(col("text")).as("native"),
        fingerprintPolySql(col("text")).as("sql"))
    assert(docs.filter(col("native") =!= col("sql")).count() == 0L)
    assert(docs.count() > 0L)
  }
}
