package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.Tables.t

/** Round-13e contracts: snapshot profile drift, held-out interpolated LM
  * evaluation, and the JL projection distortion audit.
  */
class Round13eSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("wh_profile_drift: row counts match the snapshot arithmetic and " +
      "the planted segment migration moves exactly one distinct count") {
    val keys = t(spark, dir, "customer").select("c_custkey")
      .collect().map(_.getLong(0))
    val rows = whRows()
    val byCol = rows.map(r => r.getAs[String]("col_name") -> r).toMap
    assert(byCol.keySet ==
      Set("c_name", "c_nationkey", "bal_cents", "c_mktsegment"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_t0") == keys.count(_ % 13 != 5))
      assert(r.getAs[Long]("n_t1") == keys.count(_ % 11 != 4))
      assert(r.getAs[Long]("nulls_t0") == 0L &&
        r.getAs[Long]("nulls_t1") == 0L)
    }
    // names are unique per key, so their ndv tracks the row counts
    assert(byCol("c_name").getAs[Long]("ndv_t0") ==
      keys.count(_ % 13 != 5))
    // the MIGRATED segment exists only in t1 — structural drift the
    // monitor must surface as a positive distinct-count delta
    assert(byCol("c_mktsegment").getAs[Long]("ndv_t1") >
      byCol("c_mktsegment").getAs[Long]("ndv_t0") - 1)
    assert(byCol("c_mktsegment").getAs[Long]("ndv_t1") <=
      byCol("c_mktsegment").getAs[Long]("ndv_t0") + 1)
  }

  private def whRows() = Warehouse.whProfileDrift(spark, dir).collect()

  test("text_lm_heldout: every source scored, held-out stream meets " +
      "unseen bigrams, perplexity is the exp of the mean log-likelihood") {
    val rows = TextAnalysis.textLmHeldout(spark, dir).collect()
    val sources = t(spark, dir, "documents")
      .filter("doc_id % 2 = 1").select("source")
      .distinct().collect().map(_.getString(0)).toSet
    assert(rows.map(_.getAs[String]("source")).toSet == sources)
    assert(rows.map(_.getAs[Long]("n_oov")).sum > 0,
      "vacuous eval: the held-out half met no unseen bigram")
    rows.filter(_.getAs[Long]("n_bigrams") > 0).foreach { r =>
      val ll = r.getAs[Double]("avg_ll")
      assert(ll < 0.0, "MLE-interpolated log-likelihood must be negative")
      assert(math.abs(r.getAs[Double]("ppl") -
        BigDecimal(math.exp(-ll)).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      assert(r.getAs[Long]("n_oov") <= r.getAs[Long]("n_bigrams"))
    }
  }

  test("sim_jl_audit: normalizer centers the realized ratio near 1 and " +
      "the distortion spread is reported, not assumed") {
    val r = Similarity.simJlAudit(spark, dir).collect().head
    val n = t(spark, dir, "embeddings").count()
    assert(r.getAs[Long]("n_vecs") == n)
    val (mn, mx, mean) = (r.getAs[Double]("min_ratio"),
      r.getAs[Double]("max_ratio"), r.getAs[Double]("mean_ratio"))
    assert(mn <= mean && mean <= mx)
    // the energy normalizer is exact, so the corpus mean sits near 1
    // even though per-vector variance at k=16 is wide (the point of
    // MEASURING: 16 dims does not give ±10% — the audit says so)
    assert(mean > 0.5 && mean < 1.5, s"mean ratio $mean")
    assert(mn < 0.9 || mx > 1.1,
      "suspiciously tight: k=16 JL cannot hold ±10% on every vector")
    val within = r.getAs[Long]("n_within_10pct")
    assert(within >= 0 && within <= n)
  }
}
