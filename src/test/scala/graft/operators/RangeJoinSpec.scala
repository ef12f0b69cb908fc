package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("banded range join == naive inequality join, without a nested loop") {
    import spark.implicits._
    val bands = Seq((0.0, 2000.0, "micro"), (2000.0, 10000.0, "small"),
      (10000.0, 50000.0, "mid"), (50000.0, 200000.0, "large"),
      (200000.0, 600000.0, "jumbo")).toDF("lo", "hi", "tier")
    val orders = graft.Tables.t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))

    val got = RangeJoin.banded(orders, col("o_totalprice"), bands, 10000.0)
    val naive = orders.join(bands,
      col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))

    assert(got.collect().map(_.toSeq).toSet ==
      naive.collect().map(_.toSeq).toSet)
    assert(got.count() == orders.count(), "tiers partition the price space")

    val flat = got.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!flat.contains("NestedLoop"),
      s"banded join must not plan a nested loop:\n$flat")
    val naiveFlat = naive.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(naiveFlat.contains("NestedLoop"),
      "precondition: the naive inequality join IS a nested loop")
  }

  test("bands overlapping a bucket boundary match exactly once") {
    import spark.implicits._
    // values sitting ON band and bucket edges; hi is exclusive
    val fact = Seq(0.0, 1999.99, 2000.0, 9999.99, 10000.0, 49999.0)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val bands = Seq((0.0, 2000.0, "a"), (2000.0, 10000.0, "b"),
      (10000.0, 50000.0, "c")).toDF("lo", "hi", "tier")
    val got = RangeJoin.banded(fact, col("v"), bands, 3000.0)
      .select(col("id"), col("tier"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(0L -> "a", 1L -> "a", 2L -> "b", 3L -> "b",
      4L -> "c", 5L -> "c"))
  }
}
