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

  test("50k-doc corpus with a 10k-copy cluster: linear candidates, bounded time") {
    // The scale proof, end to end through the REAL minhash pipeline
    // (tokenize → shingle → signature → bands → guarded candidates):
    // 10k IDENTICAL documents all land in the same (band, key) bucket in
    // every band. Unguarded that is ~50M candidate pairs per band; the
    // guard must keep it at 9,999 star pairs (linear), every member
    // anchored to the cluster's min doc_id, inside a bounded wall time.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("hotbucket50k").toString
    val cluster = (1L to 10000L).map(id =>
      (id, "the quick brown fox jumps over the lazy dog again and again"))
    val unique = (10001L to 50000L).map(id =>
      (id, s"w${id}a w${id}b w${id}c w${id}d w${id}e w${id}f"))
    (cluster ++ unique).toDF("doc_id", "text")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    try {
      val t0 = System.nanoTime()
      val pairs = Dedup.minhashPairs(spark, tmp, cap = 64)
        .select("da", "db").as[(Long, Long)].collect()
      val secs = (System.nanoTime() - t0) / 1e9
      // linear: 9,999 star pairs, not C(10000, 2) ≈ 50M
      assert(pairs.length == 9999, s"candidate count ${pairs.length}")
      assert(pairs.forall(_._1 == 1L), "every pair anchors at min doc_id")
      assert(pairs.map(_._2).toSet == (2L to 10000L).toSet,
        "every cluster member stays connected to the representative")
      // bounded: the unguarded join at this scale runs for many minutes
      assert(secs < 180, s"hot-bucket guard too slow: $secs s")
    } finally {
      graft.GraftSession.release(spark, Some(tmp))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
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
