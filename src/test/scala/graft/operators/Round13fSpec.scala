package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.Tables.t

/** Round-13f contracts: IVF-PQ recall readout, quality-filter threshold
  * sweep, and the power-iteration PC1 extraction.
  */
class Round13fSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("sim_ivfpq_recall: one row per query, hits bounded by k, and the " +
      "compression loss is measured (recall strictly below perfect)") {
    val rows = Similarity.simIvfPqRecall(spark, dir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val hits = r.getAs[Long]("n_hits")
      assert(hits >= 0 && hits <= 5)
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(math.abs(rec - hits / 5.0) < 1e-9)
    }
    // PQ at 8x8 codes on this corpus cannot be lossless — if every query
    // came back perfect the readout would be measuring nothing
    assert(rows.map(_.getAs[Long]("n_hits")).sum < 50,
      "suspicious: IVF-PQ recall is perfect on every query")
  }

  test("cur_filter_sweep: dense threshold spine, monotone survivors, " +
      "threshold 0.0 row is the whole corpus") {
    val rows = Curation.curFilterSweep(spark, dir).collect()
      .sortBy(_.getAs[Double]("threshold"))
    assert(rows.map(_.getAs[Double]("threshold")).toSeq ==
      (0 to 9).map(_ / 10.0))
    val total = t(spark, dir, "documents").count()
    assert(rows.head.getAs[Long]("n_docs_surviving") == total)
    assert(math.abs(rows.head.getAs[Double]("doc_share") - 1.0) < 1e-9)
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getAs[Long]("n_docs_surviving") >=
        hi.getAs[Long]("n_docs_surviving"))
      assert(lo.getAs[Long]("n_tokens_surviving") >=
        hi.getAs[Long]("n_tokens_surviving"))
    }
    // the sweep must actually discriminate: some cut drops something
    assert(rows.last.getAs[Long]("n_docs_surviving") < total)
  }

  test("sim_pca_power: unit-norm loading, positive spectrum share, and " +
      "the iterate is a fixed point of one more engine round") {
    val rows = Similarity.simPcaPower(spark, dir).collect()
    assert(rows.length == 64)
    val norm2 = rows.map(r => {
      val l = r.getAs[Double]("loading"); l * l
    }).sum
    assert(math.abs(norm2 - 1.0) < 1e-3, s"loading norm^2 $norm2")
    val lambda = rows.head.getAs[Double]("lambda")
    val share = rows.head.getAs[Double]("explained_share")
    assert(lambda > 0.0)
    assert(share > 1.0 / 64 && share < 1.0,
      s"PC1 share $share must beat the flat-spectrum floor 1/64")
    // one more round must not move the direction much (power iteration
    // is converging, not wandering): compare k vs k+1 iterates
    val more = Similarity.simPcaPower(spark, dir, iters = 5).collect()
    val dot = rows.sortBy(_.getAs[Int]("dim"))
      .zip(more.sortBy(_.getAs[Int]("dim")))
      .map { case (a, b) =>
        a.getAs[Double]("loading") * b.getAs[Double]("loading")
      }.sum
    assert(math.abs(dot) > 0.9, s"iterate moved too much: |cos| $dot")
  }
}
