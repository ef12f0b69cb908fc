package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The LSH hot-bucket guard: a band join is quadratic WITHIN a bucket, and
  * a real crawl drops giant boilerplate clusters into one (band, key). The
  * guard must (a) keep oversized buckets linear, (b) keep every member
  * connected to the cluster's representative, and (c) be a no-op whenever
  * no bucket exceeds the cap.
  */
class HotBucketSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("planted 1k-copy cluster: candidates linear, not quadratic") {
    import spark.implicits._
    // one hot bucket of 1000 docs + two small buckets of 3
    val rows =
      (1L to 1000L).map(id => (id, Array.fill(8)(42L), 0, "hot")) ++
      (2001L to 2003L).map(id => (id, Array.fill(8)(7L), 1, "s1")) ++
      (3001L to 3003L).map(id => (id, Array.fill(8)(9L), 2, "s2"))
    val bands = rows.toDF("doc_id", "sig", "band", "key")
    val cand = Dedup.bandedCandidates(bands, "sig", cap = 64)
    val pairs = cand.select("da", "db").as[(Long, Long)].collect().toSet

    val hot = pairs.filter(_._2 <= 1000L)
    // star to the anchor (min doc_id): 999 pairs, not 1000*999/2 = 499500
    assert(hot.size == 999, s"hot-bucket candidates ${hot.size}")
    assert(hot.forall(_._1 == 1L), "every hot pair anchors at min doc_id")
    assert((2L to 1000L).forall(id => hot.contains((1L, id))),
      "every member stays connected to the representative")
    // small buckets stay exhaustive: C(3,2) = 3 pairs each
    assert(pairs.count(_._1 >= 2001L) == 6)
  }

  test("guard is a no-op when no bucket exceeds the cap (real corpus)") {
    import spark.implicits._
    val guarded = Dedup.minhashPairs(spark, dir, cap = 64)
      .select("da", "db").as[(Long, Long)].collect().toSet
    val exhaustive = Dedup.minhashPairs(spark, dir, cap = Int.MaxValue)
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(guarded == exhaustive)
    assert(guarded.nonEmpty)
  }
}
