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

  test("ASC ordering: explicit 'asc' direction matches the window idiom") {
    graft.plans.GraftFunctions.register(spark)
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    val expected = graft.Tables.t(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .collect().map(_.toSeq).toSet
    val got = graft.Tables.t(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .filter(call_function("graft_topk", lit(3),
        col("o_totalprice"), lit("asc"), col("o_orderkey"),
        col("o_orderpriority")))
      .collect().map(_.toSeq).toSet
    assert(got == expected)
    assert(got.size == 15)
  }

  test("multi-column ordering: (status desc, totalprice asc) matches window") {
    graft.plans.GraftFunctions.register(spark)
    val orders = graft.Tables.t(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        (col("o_custkey") % 7).as("cust_band"))
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("cust_band").desc, col("o_totalprice").asc,
        col("o_orderkey").asc)
    val expected = orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4).drop("rn")
      .collect().map(_.toSeq).toSet
    val got = orders
      .filter(call_function("graft_topk", lit(4),
        col("cust_band"), lit("desc"), col("o_totalprice"), lit("asc"),
        col("o_orderkey"), col("o_orderpriority")))
      .collect().map(_.toSeq).toSet
    assert(got == expected)
  }

  test("global top-k: no key columns gathers partial survivors, no sort") {
    graft.plans.GraftFunctions.register(spark)
    val df = graft.Tables.t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .filter(call_function("graft_topk", lit(7),
        col("o_totalprice"), col("o_orderkey")))
    val got = df.collect().map(_.toSeq).toSet
    val expected = graft.Tables.t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(7).collect().map(_.toSeq).toSet
    assert(got == expected)
    val flat = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(flat.split("\n").count(_.contains("TopKPerKey ")) == 2)
    assert(!flat.contains("Sort"), s"sort leaked into plan:\n$flat")
  }

  test("auto-cast: decimal/int ord and tie work without explicit CASTs") {
    graft.Tables.t(spark, dir, "orders").createOrReplaceTempView("orders_v")
    // o_totalprice is not double, o_orderkey not long in the raw call —
    // TopKRewrite inserts the casts (ADVICE: un-cast SQL calls must not
    // silently read wrong bits)
    val got = spark.sql("""
      SELECT o_orderpriority, o_orderkey, o_totalprice FROM orders_v
      WHERE graft_topk(3, o_totalprice, o_orderkey, o_orderpriority)""")
      .collect().map(_.toSeq).toSet
    assert(got == native.collect().map(_.toSeq).toSet)
  }

  test("rank-then-filter: a later .filter stays ABOVE the top-k") {
    graft.plans.GraftFunctions.register(spark)
    val base = graft.Tables.t(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    // query order: rank first (top-3 per priority), THEN filter the ranked
    // rows. A deterministic marker would let CombineFilters merge the
    // second filter into the first and the rewrite would rank the
    // pre-filtered rows instead (silently different result).
    val got = base
      .filter(call_function("graft_topk", lit(3),
        col("o_totalprice").cast("double"), col("o_orderkey").cast("long"),
        col("o_orderpriority")))
      .filter(col("o_orderkey") % 2 === 0)
      .collect().map(_.toSeq).toSet
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val expected = base
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .filter(col("o_orderkey") % 2 === 0)
      .collect().map(_.toSeq).toSet
    assert(got == expected)
  }

  test("analysis/planning errors are descriptive") {
    graft.Tables.t(spark, dir, "orders").createOrReplaceTempView("orders_v")
    // arity
    val e1 = intercept[Exception] {
      spark.sql("SELECT * FROM orders_v WHERE graft_topk(3, o_totalprice)")
        .collect()
    }
    assert(e1.getMessage.contains("graft_topk"), e1.getMessage)
    // non-numeric ord
    val e2 = intercept[Exception] {
      spark.sql("""SELECT * FROM orders_v
        WHERE graft_topk(3, o_orderpriority, o_orderkey)""").collect()
    }
    assert(e2.getMessage.contains("graft_topk") ||
      e2.getMessage.contains("numeric"), e2.getMessage)
    // k not a literal
    val e3 = intercept[Exception] {
      spark.sql("""SELECT * FROM orders_v
        WHERE graft_topk(o_shippriority, o_totalprice, o_orderkey)""")
        .collect()
    }
    assert(e3.getMessage.contains("graft_topk"), e3.getMessage)
    // marker under OR: descriptive, not Unevaluable
    val e4 = intercept[Exception] {
      spark.sql("""SELECT * FROM orders_v
        WHERE graft_topk(3, o_totalprice, o_orderkey, o_orderpriority)
           OR o_orderkey = 1""").collect()
    }
    assert(e4.getMessage.contains("top-level conjunct"), e4.getMessage)
  }

  test("TopKPerKey exposes ordering expressions to QueryPlan") {
    // ADVICE (high): Seq[(Expression, Boolean)] tuples are INVISIBLE to
    // QueryPlan.expressions/references — ColumnPruning (same fixed-point
    // batch as TopKRewrite on the extensions path) would prune the
    // ordering columns from the child. Ordering is modeled as parallel
    // Seq fields precisely so this holds:
    val child = graft.Tables.t(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .queryExecution.analyzed
    val ord = child.output.find(_.name == "o_totalprice").get
    val tie = child.output.find(_.name == "o_orderkey").get
    val key = child.output.find(_.name == "o_orderpriority").get
    val node = graft.plans.TopKPerKey(Seq(key), Seq(ord), Seq(true), tie, 3, child)
    assert(node.expressions.exists(_.semanticEquals(ord)),
      s"ordering expr missing from expressions: ${node.expressions}")
    assert(node.references.contains(ord),
      s"ordering attr missing from references: ${node.references}")
  }

  test("extensions path: projection that drops ordering columns still ranks") {
    // The end-to-end form of the ADVICE bug: via GraftExtensions the
    // rewrite runs INSIDE the operator-optimization batch with
    // ColumnPruning; the query projects only o_orderkey, so pruning
    // would strip the ordering/tie/key columns below TopKPerKey if the
    // node hid them.
    val base = SparkTestSession.spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new graft.plans.GraftExtensions())
      .getOrCreate()
    try {
      val got = graft.Tables.t(s2, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
        .filter(call_function("graft_topk", lit(3),
          col("o_totalprice"), col("o_orderkey"), col("o_orderpriority")))
        .select(col("o_orderkey"))
        .collect().map(_.getLong(0)).toSet
      val expected = native.collect().map(_.getAs[Long]("o_orderkey")).toSet
      assert(got == expected)
    } finally {
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }

  test("NULLS LAST: null in a SECONDARY ordering column still ranks the row") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    // id7 is the ADVICE scenario: best ord1 in its key but NULL ord2 —
    // the old drop-any-null semantics silently lost it; NULLS LAST ranks
    // it first on ord1.
    val df = Seq(
      ("a", Some(10.0), Some(5.0), 1L), ("a", Some(10.0), None, 2L),
      ("a", Some(10.0), Some(1.0), 3L), ("a", Some(9.0), Some(9.0), 4L),
      ("b", Some(1.0), None, 5L), ("b", Some(1.0), Some(2.0), 6L),
      ("b", Some(2.0), None, 7L),
    ).toDF("key", "ord1", "ord2", "id")
    val got = df.filter(call_function("graft_topk", lit(2),
        col("ord1"), lit("desc"), col("ord2"), lit("asc"),
        col("id"), col("key")))
      .collect().map(_.toSeq).toSet
    val w = Window.partitionBy(col("key")).orderBy(
      col("ord1").desc_nulls_last, col("ord2").asc_nulls_last, col("id").asc)
    val expected = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn")
      .collect().map(_.toSeq).toSet
    assert(got == expected)
    assert(got.exists(_(3) == 7L), "row with NULL secondary ord must rank")
  }

  test("NULLS LAST: null in the FIRST ordering column ranks last, not dropped") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val df = Seq(
      ("a", Some(5.0), 1L), ("a", None: Option[Double], 2L),
      ("a", None: Option[Double], 3L), ("a", Some(7.0), 4L),
    ).toDF("key", "ord", "id")
    // k=3 > 2 non-null rows: window NULLS LAST fills rank 3 with the
    // lowest-tie NULL row; the operator must match, not return 2 rows
    val got = df.filter(call_function("graft_topk", lit(3),
        col("ord"), col("id"), col("key")))
      .collect().map(_.toSeq).toSet
    val w = Window.partitionBy(col("key"))
      .orderBy(col("ord").desc_nulls_last, col("id").asc)
    val expected = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .collect().map(_.toSeq).toSet
    assert(got == expected)
    assert(got.size == 3)
    assert(got.exists(_(2) == 2L), "NULL-ord row with lowest tie takes rank 3")
  }

  test("misplaced direction literal in tie/key position fails descriptively") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val df = Seq(("a", 1.0, 2.0, 1L)).toDF("key", "ord1", "ord2", "id")
    // direction AFTER the second ord instead of after every ord — the
    // greedy parse would otherwise read ord2 as the tie and 'desc' as a key
    val e = intercept[Exception] {
      df.filter(call_function("graft_topk", lit(2),
          col("ord1"), col("ord2"), lit("desc"), col("id"), col("key")))
        .collect()
    }
    assert(e.getMessage.contains("direction literal after EVERY ordering"),
      e.getMessage)
  }

  test("two markers ANDed in one condition fail descriptively") {
    graft.plans.GraftFunctions.register(spark)
    val base = graft.Tables.t(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    val e = intercept[Exception] {
      base.filter(
        call_function("graft_topk", lit(3), col("o_totalprice").cast("double"),
          col("o_orderkey").cast("long"), col("o_orderpriority")) &&
        call_function("graft_topk", lit(2), col("o_totalprice").cast("double"),
          col("o_orderkey").cast("long"), col("o_orderpriority")))
        .collect()
    }
    assert(e.getMessage.contains("multiple graft_topk"), e.getMessage)
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

  test("randomized parity: per-key and global forms match the window idiom") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    // Adversarial distribution on purpose: few distinct ord values (ties
    // everywhere), NULLs in both ordering columns, skewed keys. The tie
    // column is unique so both sides are deterministic.
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 1 to 4) {
      val k = 1 + rnd.nextInt(4)
      val rows = (1L to 400L).map { id =>
        val key = "k" + rnd.nextInt(1 + rnd.nextInt(12))
        val ord1 = if (rnd.nextInt(8) == 0) None
                   else Some(rnd.nextInt(5).toDouble)
        val ord2 = if (rnd.nextInt(4) == 0) None
                   else Some(rnd.nextInt(3).toDouble)
        (key, ord1, ord2, id)
      }
      val df = rows.toDF("key", "ord1", "ord2", "id")
      val got = df.filter(call_function("graft_topk", lit(k),
          col("ord1"), lit("desc"), col("ord2"), lit("asc"),
          col("id"), col("key")))
        .collect().map(_.toSeq).toSet
      val w = Window.partitionBy(col("key")).orderBy(
        col("ord1").desc_nulls_last, col("ord2").asc_nulls_last,
        col("id").asc)
      val expected = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
        .collect().map(_.toSeq).toSet
      assert(got == expected, s"per-key trial $trial k=$k")

      val gotGlobal = df.filter(call_function("graft_topk", lit(k),
          col("ord1"), lit("desc"), col("ord2"), lit("asc"), col("id")))
        .collect().map(_.toSeq).toSet
      val wg = Window.orderBy(col("ord1").desc_nulls_last,
        col("ord2").asc_nulls_last, col("id").asc)
      val expGlobal = df.withColumn("rn", row_number().over(wg))
        .filter(col("rn") <= k).drop("rn")
        .collect().map(_.toSeq).toSet
      assert(gotGlobal == expGlobal, s"global trial $trial k=$k")
    }
  }
}
