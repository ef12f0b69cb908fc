package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Float-boundary contract of the prefix-filter join's epsilon slack
  * (Dedup.dedupPrefixJoin): a pair engineered to sit EXACTLY on both
  * prune bounds at τ = 0.8 must survive.
  *
  *  - doc A = 12 words → 10 shingles; doc B = its 10-word prefix → 8
  *    shingles, all ⊂ A. Jaccard = 8∕10 = 0.8 exactly (the τ boundary),
  *    and |B| = 0.8·|A| exactly (the length-filter boundary).
  *  - prefix length for A: |x| − ⌈τ·|x|⌉ + 1 with 0.8·10 — the IEEE
  *    product is 8.000000000000002, so an UNguarded ceil gives 9 and a
  *    2-token prefix instead of 3: the candidate can be silently lost.
  *    The −1e-9 slack keeps the true ceiling.
  *
  * The quadratic baseline (τ-compare only, no prefix math) is the truth
  * side; the test fails loudly if anyone removes the epsilon guards.
  */
class PrefixJoinBoundarySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("a pair exactly on the tau and length boundaries survives the " +
      "prefix, length, and positional filters") {
    import spark.implicits._
    val words = (1 to 12).map(i => s"tk$i")
    val a = words.mkString(" ")              // 10 shingles
    val b = words.take(10).mkString(" ")     // 8 shingles, subset of A
    val c = (1 to 12).map(i => s"zz$i").mkString(" ") // unrelated
    val tmp = java.nio.file.Files
      .createTempDirectory("pfx-boundary").toString
    Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val truth = Dedup.dedupNgramJaccard(spark, tmp).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"),
        r.getAs[Double]("jaccard"))).toSet
    assert(truth.map(t => (t._1, t._2)) == Set((1L, 2L)),
      s"fixture must plant exactly the boundary pair, got $truth")
    assert(truth.head._3 == 0.8, "jaccard must sit exactly on tau")

    val fast = Dedup.dedupPrefixJoin(spark, tmp).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"),
        r.getAs[Double]("jaccard"))).toSet
    assert(fast == truth,
      "the boundary-exact pair was pruned — an epsilon guard is missing " +
        "(ceil/length/positional bound rounded the wrong way)")
  }

  test("hot-posting guard: postings over the cap degrade to anchor-star " +
      "pairs; under the cap the join stays exhaustive (r14 — the sf10 " +
      "quadratic-volume lesson)") {
    import spark.implicits._
    // four EXACT duplicates: every prefix posting has length 4
    val text = (1 to 12).map(i => s"hw$i").mkString(" ")
    val tmp = java.nio.file.Files
      .createTempDirectory("pfx-hotcap").toString
    (1L to 4L).map(i => (i, text)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    def pairs(cap: Int): Set[(Long, Long)] =
      Dedup.dedupPrefixJoin(spark, tmp, cap = cap).collect()
        .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"))).toSet

    // cap ≥ posting length: exhaustive PPJoin — all 6 pairs at j=1.0
    assert(pairs(4) ==
      (for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)).toSet,
      "under-cap postings must keep the lossless guarantee")
    // cap below posting length: every posting is hot — the cluster
    // stays connected through its anchor (min doc_id) only, the dedup
    // outcome the banded joins' guard established
    assert(pairs(2) == Set((1L, 2L), (1L, 3L), (1L, 4L)),
      "over-cap postings must degrade to anchor-star pairs")
  }
}
