package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Synthetic corpus in the documents schema, returned as its temp dir. */
  private def corpus(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("curation").toString
    rows.map { case (id, text, src) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  private val dupText =
    "the quick brown fox jumps over the lazy dog again and again"
  private def uniqueText(id: Long) =
    s"w${id}a w${id}b w${id}c w${id}d w${id}e w${id}f w${id}g"

  test("100-copy cluster through the anchor-star guard: one component") {
    // 100 identical docs blow past the default hot-bucket cap (64), so the
    // pair set arrives STAR-REDUCED — clustering must still label all 100
    // as one component (that connectivity survives the reduction is the
    // guard's contract), plus two singletons.
    val dir = corpus(
      (1L to 100L).map(id => (id, dupText, "srcA")) ++
      Seq((200L, uniqueText(200), "srcA"), (201L, uniqueText(201), "srcB")))
    try {
      val out = Curation.dedupClusters(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(out.length == 102)
      val dupRows = out.filter(_._1 <= 100L)
      assert(dupRows.forall { case (_, cid, sz) => cid == 1L && sz == 100L },
        "every copy labels to the min doc_id with the full cluster size")
      assert(out.filter(_._1 >= 200L)
        .forall { case (id, cid, sz) => cid == id && sz == 1L })
    } finally graft.GraftSession.release(spark, Some(dir))
  }

  test("two disjoint clusters keep distinct labels") {
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val b = "one two three four five six seven eight nine"
    val dir = corpus(Seq(
      (10L, a, "s"), (11L, a, "s"), (20L, b, "s"), (21L, b, "s")))
    try {
      val got = Curation.dedupClusters(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
    } finally graft.GraftSession.release(spark, Some(dir))
  }

  test("stratified sample is deterministic and content-addressed") {
    val dir = "/root/testdata/sf0.001"
    val once = Curation.sampleStratified(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val again = Curation.sampleStratified(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(once == again, "hash-based membership must not vary across runs")
    assert(once.nonEmpty)
    // en strata keeps ~50%, others ~25% — wide tolerance, tiny corpus
    val total = graft.Tables.t(spark, dir, "documents").count()
    assert(once.size > total / 8 && once.size < (3 * total) / 4)
  }

  test("decontamination flags the eval-set copy, not the clean doc") {
    val evalText = "shared secret benchmark passage that must not leak through"
    val dir = corpus(Seq(
      (1L, evalText, "src0"),            // the eval doc itself
      (2L, evalText, "src5"),            // contaminated: full overlap
      (3L, uniqueText(3), "src5")))      // clean
    try {
      val got = Curation.decontaminate(spark, dir)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
      assert(got.keySet == Set(2L), s"flagged ${got.keySet}")
      assert(got(2L) == 1.0, "identical doc overlaps completely")
    } finally graft.GraftSession.release(spark, Some(dir))
  }
}
