package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational
import graft.plans.TopKPerKeyExec

/** The native TopKPerKey operator (plans/TopK.scala): result parity with
  * the window idiom, and the physical plan contract — two heap phases
  * (partial + final) with the exchange between them, and NO window or
  * sort anywhere in the plan.
  */
class TopKSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val native = Relational.o5TopKPerKey(spark, dir)

  test("matches the window row_number idiom exactly") {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val expected = graft.Tables.t(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .collect().map(_.toSeq).toSet
    val got = native.collect().map(_.toSeq).toSet
    assert(got == expected)
    assert(got.size == 15) // 5 priorities × 3
  }

  test("physical plan: partial+final heap phases, no Window, no Sort") {
    // AQE's string shows Final + Initial plans once executed — assert on
    // the final section only
    val flat = native.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the exec node prints as "TopKPerKey" (nodeName strips the Exec suffix)
    val execs = flat.split("\n").count(_.contains("TopKPerKey "))
    assert(execs == 2, s"expected partial+final TopKPerKeyExec, plan:\n$flat")
    assert(!flat.contains("Window"), s"window leaked into plan:\n$flat")
    assert(!flat.contains("Sort"), s"sort leaked into plan:\n$flat")
    assert(flat.contains("Exchange"), s"missing exchange:\n$flat")
  }

  test("pure-SQL path: graft_topk works in a WHERE clause via spark.sql") {
    graft.Tables.t(spark, dir, "orders").createOrReplaceTempView("orders_v")
    val got = spark.sql("""
      SELECT o_orderpriority, o_orderkey, o_totalprice FROM orders_v
      WHERE graft_topk(3, CAST(o_totalprice AS DOUBLE),
        CAST(o_orderkey AS BIGINT), o_orderpriority)""")
      .collect().map(_.toSeq).toSet
    assert(got == native.collect().map(_.toSeq).toSet)
  }

  test("residual predicates combined with the marker still apply") {
    graft.plans.GraftFunctions.register(spark)
    val got = graft.Tables.t(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .filter(call_function("graft_topk", lit(2),
        col("o_totalprice").cast("double"), col("o_orderkey").cast("long"),
        col("o_orderpriority")) && col("o_orderpriority") =!= "1-URGENT")
      .collect()
    assert(got.length == 8) // 4 remaining priorities × 2
    assert(got.forall(_.getAs[String]("o_orderpriority") != "1-URGENT"))
  }

  test("partial flush guard: result unchanged when heaps flush every 4 keys") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    def run(): Set[Seq[Any]] = (1L to 2000L).toDF("id").repartition(4)
      .select((col("id") % 100).cast("string").as("key"), col("id"),
        (col("id") % 37).cast("double").as("score"))
      .filter(call_function("graft_topk", lit(3),
        col("score"), col("id"), col("key")))
      .collect().map(_.toSeq).toSet
    val unflushed = run()
    spark.conf.set("graft.topk.partialFlushKeys", "4")
    try {
      val flushed = run() // 100 keys per partition → many flushes
      assert(flushed == unflushed)
      assert(flushed.size == 300) // 100 keys × 3
    } finally spark.conf.unset("graft.topk.partialFlushKeys")
  }

  test("partial phase caps shuffle rows at k per (partition, key)") {
    // a 1000-row single-key relation across many partitions: the exchange
    // input is the partial survivors (≤ k per partition), not 1000 rows
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val df = (1L to 1000L).toDF("id").repartition(8)
      .select(lit("k").as("key"), col("id"),
        (col("id") % 97).cast("double").as("score"))
      .filter(call_function("graft_topk", lit(5),
        col("score"), col("id"), col("key")))
    val rows = df.collect()
    assert(rows.length == 5)
    // top by (score desc, id asc): score 96 at ids 96, 193, 290, 387, 484
    assert(rows.map(_.getAs[Long]("id")).sorted.toSeq ==
      Seq(96L, 193L, 290L, 387L, 484L))
  }
}
