package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.Tables.t

/** The round-5 scale operators: incremental upsert (U4), bloom-pruned
  * join (J5), rolling frame (O7), cube lattice (A11).
  */
class MergeAndPruneSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("upsert: delta wins on collision, untouched base rows survive") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
    val delta = Seq((2L, "b2", 99.0), (4L, "d", 40.0))
      .toDF("k", "name", "bal")
    val got = Relational.upsert(base, delta, "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1L, "a", 10.0), (2L, "b2", 99.0), (3L, "c", 30.0),
      (4L, "d", 40.0)))
  }

  test("u4 keeps base cardinality: every key exactly once") {
    val out = Relational.u4Upsert(spark, dir)
    val baseN = t(spark, dir, "customer").count()
    assert(out.count() == baseN)
    assert(out.select(col("c_custkey")).distinct().count() == baseN)
    // the delta actually took effect
    assert(out.filter(col("c_mktsegment") === "RELOADED").count() ==
      t(spark, dir, "customer").filter(col("c_custkey") % 13 === 0).count())
  }

  test("bloom prune never drops a true match (j5 == plain semi join)") {
    val dim = t(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val fact = t(spark, dir, "orders")
    val exact = fact.join(dim, col("o_custkey") === col("c_custkey"),
      "left_semi")
    val pruned = Relational.bloomPrunedSemiJoin(fact, dim,
      "o_custkey", "c_custkey")
    assert(pruned.count() == exact.count())
    assert(pruned.select(col("o_orderkey")).except(
      exact.select(col("o_orderkey"))).isEmpty)
  }

  test("bloom prune works on STRING keys (xxhash64 both sides)") {
    import spark.implicits._
    // pre-fix behavior: cast("long") on a string key → NULL under ANSI-off
    // → every fact row failed the bloom probe → silently empty result
    val dim = Seq("alice", "bob", "carol").toDF("name")
    val fact = Seq("alice", "bob", "dave", "erin", "alice").toDF("who")
    val got = Relational.bloomPrunedSemiJoin(fact, dim, "who", "name")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(got == Seq("alice", "alice", "bob"))
  }

  test("bloom prune survives MIXED numeric key types (int fact vs long dim)") {
    import spark.implicits._
    // xxhash64 is type-sensitive: Int 5 and Long 5 hash differently, so
    // hashing the raw columns would miss every probe and silently return
    // empty; both sides must be cast to a common type first.
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val fact = Seq(1, 2, 4, 5, 1).toDF("fk")
    val got = Relational.bloomPrunedSemiJoin(fact, dim, "fk", "k")
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(got == Seq(1, 1, 2))
  }

  test("bloom prune survives int-vs-double keys (numeric widening)") {
    import spark.implicits._
    val dim = Seq(1.0, 3.0).toDF("k")
    val fact = Seq(1, 2, 3).toDF("fk")
    val got = Relational.bloomPrunedSemiJoin(fact, dim, "fk", "k")
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(got == Seq(1, 3))
  }

  test("bloom prune rejects incompatible key types loudly, not emptily") {
    import spark.implicits._
    val dim = Seq("1", "2").toDF("k")
    val fact = Seq(1L, 2L).toDF("fk")
    val e = intercept[IllegalArgumentException] {
      Relational.bloomPrunedSemiJoin(fact, dim, "fk", "k")
    }
    assert(e.getMessage.contains("common type"))
    intercept[IllegalArgumentException] {
      Relational.bloomPrunedSemiJoin(fact, dim, "fk", "fk",
        expectedNumItems = 0L)
    }
  }

  test("bloom prune honors expectedNumItems (no dim sizing pass)") {
    import spark.implicits._
    val dim = (0L until 100L).toDF("k")
    val fact = (0L until 1000L).toDF("fk")
    val got = Relational.bloomPrunedSemiJoin(fact, dim, "fk", "k",
      expectedNumItems = 100L)
    assert(got.count() == 100L)
  }

  test("bloom filter prunes most non-matching fact rows before the join") {
    import spark.implicits._
    // keys 0..99 in the dim; fact keys 0..9999 → ≥ ~98.9% of rows must be
    // dropped map-side at fpp=0.01 (no shuffle sees them)
    val dim = (0L until 100L).toDF("k")
    val fact = (0L until 10000L).toDF("fk")
    val nKeys = 100L
    val bloom = dim.stat.bloomFilter("k", nKeys, 0.01)
    val survivors = fact.filter(
      udf((x: Long) => bloom.mightContainLong(x)).apply(col("fk"))).count()
    assert(survivors >= 100, "no false negatives allowed")
    assert(survivors <= 100 + 500, s"fpp blown: $survivors survivors")
  }

  test("o7 rolling frame: window is at most 3 rows and starts at row 1") {
    val out = Relational.o7RollingFrame(spark, dir)
    assert(out.filter(col("roll_n") > 3 || col("roll_n") < 1).isEmpty)
    // a frame of n=1 is exactly the row's own price
    assert(out.filter(col("roll_n") === 1 &&
      abs(col("roll_spend") - col("o_totalprice")) > 0.005).isEmpty)
  }

  test("a11 cube: grand total row matches table count; 4 gid levels") {
    val out = Relational.a11Cube(spark, dir).cache()
    try {
      val grand = out.filter(col("gid") === 3).collect()
      assert(grand.length == 1)
      assert(grand(0).getAs[Long]("n_orders") ==
        t(spark, dir, "orders").count())
      assert(out.select(col("gid")).distinct().count() == 4)
    } finally out.unpersist()
  }
}
