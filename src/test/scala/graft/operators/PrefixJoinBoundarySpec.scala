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

  test("mixed hot/cold pair survives the positional filter via the " +
      "min(ha, hb) relaxation (ADVICE r14 — the unrelaxed bound prunes " +
      "a true pair with no star-path recovery)") {
    import spark.implicits._
    // Geometry (τ = 0.5, cap = 2): docs A and B share the word run
    // m1..m8; C = exactly "m1 m2 m3", so the shingle t1 = 'm1 m2 m3'
    // sits in THREE prefixes (A, B, C → pdf 3 > cap, HOT) while the
    // other shared shingles S2..S6 appear in E/F/G too (full df 5) but
    // only OUTSIDE their prefixes (pdf 2, cold). Within A and B the
    // (df, s) order is: 2 unique bridge shingles (df 1), t1 (df 3),
    // then S2, S3 (df 5) closing the 5-token prefix. The A–B candidate
    // group therefore sees po = 2 (S2, S3), ra = rb = 5, suffix = 3:
    // the unrelaxed bound gives 5 < ceil(0.5·16/1.5) = 6 and prunes the
    // pair — yet its true overlap is 6 (t1 at rn 3 < ra is counted by
    // neither po nor the suffix term), jaccard = 6/10 = 0.6 ≥ τ, and
    // the star path only pairs A and B with C (the posting's anchor),
    // never with each other. With ha = hb = 1 the relaxed bound reaches
    // 6 and the pair flows to exact verification.
    val m = (1 to 8).map(i => s"m$i")
    val docs = Seq(
      1L -> m.take(3).mkString(" "),                       // C: just t1
      2L -> (Seq("a1", "a2") ++ m).mkString(" "),          // A
      3L -> (Seq("b1", "b2") ++ m).mkString(" "),          // B
      4L -> ((1 to 8).map(i => s"e$i") ++ m.drop(1)).mkString(" "), // E
      5L -> ((1 to 8).map(i => s"f$i") ++ m.drop(1)).mkString(" "), // F
      6L -> ((1 to 8).map(i => s"g$i") ++ m.drop(1)).mkString(" ")) // G
    val tmp = java.nio.file.Files
      .createTempDirectory("pfx-mixed").toString
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val truth = Dedup.dedupNgramJaccard(spark, tmp, tau = 0.5).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"),
        r.getAs[Double]("jaccard"))).toSet
    assert(truth == Set((2L, 3L, 0.6)),
      s"fixture must plant exactly the mixed-pair truth, got $truth")

    val fast = Dedup.dedupPrefixJoin(spark, tmp, tau = 0.5, cap = 2)
      .collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"),
        r.getAs[Double]("jaccard"))).toSet
    assert(fast == truth,
      "the mixed hot/cold true pair was lost — the positional filter " +
        "must be relaxed by min(ha, hb) when hot entries leave the cold " +
        "relation")
  }
}
