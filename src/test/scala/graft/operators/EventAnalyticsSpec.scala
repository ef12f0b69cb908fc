package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.Tables.t

class EventAnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("gapfill: spine is dense per type, zero-days forward-fill") {
    val out = EventAnalytics.tsGapfill(spark, dir).cache()
    try {
      // dense: per type, rows == days between min and max inclusive
      val holes = out.groupBy(col("event_type"))
        .agg(count(lit(1)).as("rows"),
          (datediff(max(col("day")), min(col("day"))) + 1).as("span"))
        .filter(col("rows") =!= col("span"))
      assert(holes.isEmpty)
      // no events were invented or lost by the spine join
      val total = out.agg(sum(col("n_events"))).collect()(0).getLong(0)
      assert(total == t(spark, dir, "events").count())
      // a gap day (n_events=0) carries the previous day's total forward:
      // its ff_value must equal the last non-gap total before it
      val gaps = out.filter(col("n_events") === 0)
      if (gaps.count() > 0) {
        assert(gaps.filter(col("total_value").isNotNull).isEmpty)
        assert(gaps.filter(col("ff_value").isNull).isEmpty ||
          // leading gaps (before any observation) may be null-filled
          gaps.filter(col("ff_value").isNull).count() < gaps.count())
      }
    } finally out.unpersist()
  }

  test("salted join returns exactly the plain join's aggregate") {
    val plain = t(spark, dir, "lineitem")
      .join(t(spark, dir, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_items"))
    val salted = Relational.j6SaltedJoin(spark, dir)
      .select(col("nationkey"), col("n_items"))
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty)
  }

  test("salting spreads a hot key across r partitions") {
    import spark.implicits._
    // one key, 1000 fact rows, spread col distinct → salts must hit all 8
    val fact = (1L to 1000L).map(i => (42L, i)).toDF("k", "spread")
    val dim = Seq((42L, "x")).toDF("dk", "payload")
    val joined = Relational.saltedJoin(fact, dim, "k", "dk", "spread")
    assert(joined.count() == 1000)
    val salts = fact.withColumn("salt", pmod(hash(col("spread")), lit(8)))
      .select(col("salt")).distinct().count()
    assert(salts == 8)
  }
}
