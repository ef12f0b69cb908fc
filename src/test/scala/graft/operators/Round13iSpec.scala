package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.SparkTestSession
import graft.Tables.t

/** Round-13i contracts: the Gopher rule funnel, embedding outlier
  * z-scores, and the cross-source shingle-overlap matrix. Each
  * distributed result is checked against a driver-side recompute from
  * the same inputs — the spec owns the semantics, the oracle SQL owns
  * cross-engine parity.
  */
class Round13iSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("text_gopher_rules: funnel equals a driver replay and the " +
      "fixture-splitting rules actually split") {
    val texts = t(spark, dir, "documents")
      .select("text").collect().map(_.getString(0))
    val docs = texts.map(_.split(" ", -1).filter(_.nonEmpty))
      .filter(_.nonEmpty)
    case class Flags(wc: Boolean, ml: Boolean, sym: Boolean,
        al: Boolean, st: Boolean) {
      def all: Boolean = wc && ml && sym && al && st
    }
    val flags = docs.map { w =>
      val n = w.length.toLong
      val mwl = w.map(_.length.toLong).sum * 1000000L / n
      val sym = w.count(x => x.contains("#") || x.contains("..."))
      val al = w.count(_.exists(c => Character.isLetter(c) &&
        (('a' <= c && c <= 'z') || ('A' <= c && c <= 'Z'))))
      val st = w.count(x => x == "a" || x == "the")
      Flags(n >= 50 && n <= 100000, mwl >= 3000000L && mwl <= 10000000L,
        sym * 10 < n, al * 5 > n * 4, st >= 2)
    }
    val nDocs = flags.length.toLong
    val expected = Seq(
      ("r_alpha", flags.count(!_.al)), ("r_all", flags.count(!_.all)),
      ("r_meanlen", flags.count(!_.ml)), ("r_stop", flags.count(!_.st)),
      ("r_symbol", flags.count(!_.sym)),
      ("r_wordcount", flags.count(!_.wc)))
      .map { case (r, f) => (r, nDocs, f.toLong, f * 1000000L / nDocs) }
      .sortBy(_._1)
    val got = TextAnalysis.textGopherRules(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected,
      "distributed funnel must equal the driver replay")
    // non-vacuous: at least one rule must split the fixture both ways
    val split = expected.filter(e => e._3 > 0 && e._3 < nDocs)
    assert(split.nonEmpty, "no rule splits the fixture — funnel vacuous")
  }

  test("sim_outliers: z-scores equal a driver replay over the index's " +
      "own assignments and flag below-mean members") {
    val (_, assigned, _) = Similarity.ivfIndex(spark, dir)
    val rows = assigned.select("vec_id", "cid", "ccos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def rnd(v: Double): Long =
      BigDecimal(v).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def rnd6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val cc = rows.map { case (id, cid, c) => (id, cid, rnd(c * 1e6)) }
    val byCid = cc.groupBy(_._2)
    val expected = cc.flatMap { case (id, cid, u) =>
      val m = byCid(cid)
      val n = m.length.toLong
      if (n < 2) None
      else {
        val s1 = m.map(_._3).sum
        val s2 = m.map(x => x._3 * x._3).sum
        val mean = s1.toDouble / n
        val varr = (s2.toDouble - s1.toDouble * s1.toDouble / n) / n
        if (varr <= 0) None
        else Some((id, cid, rnd6(u / 1e6),
          rnd6((mean - u.toDouble) / math.sqrt(varr))))
      }
    }.sortBy { case (id, _, _, z) => (-z, id) }
      .take(Similarity.OutlierTopK)
      .zipWithIndex.map { case ((id, cid, c, z), i) => (id, cid, c, z, i + 1) }
    val got = Similarity.simOutliers(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getInt(4)))
    assert(got.toSeq == expected.toSeq,
      "distributed outlier ranking must equal the driver replay")
    assert(got.nonEmpty, "fixture produced no rankable clusters")
    // every reported outlier sits BELOW its list mean (that is the sign
    // convention) and strictly anomalous: z > 1
    assert(got.forall(_._4 > 0), "reported z must be positive (below mean)")
    assert(got.head._4 > 1.0, "top outlier should exceed one sigma")
  }

  test("dedup_source_overlap: matrix equals a driver replay and ratios " +
      "obey containment >= jaccard") {
    val docs = t(spark, dir, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val prof = docs.flatMap { case (src, text) =>
      val w = text.split(" ", -1)
      if (w.length < 3) Seq.empty[(String, String)]
      else (0 to w.length - 3).map(i =>
        src -> s"${w(i)} ${w(i + 1)} ${w(i + 2)}")
    }.distinct
    val counts = prof.groupBy(_._1).map { case (s, xs) => s -> xs.length.toLong }
    val byShingle = prof.groupBy(_._2).values
    val shared = new scala.collection.mutable.HashMap[(String, String), Long]()
    byShingle.foreach { grp =>
      val srcs = grp.map(_._1).sorted
      for (i <- srcs.indices; j <- (i + 1) until srcs.length)
        shared((srcs(i), srcs(j))) =
          shared.getOrElse((srcs(i), srcs(j)), 0L) + 1L
    }
    val expected = shared.toSeq.sortBy(_._1).map { case ((a, b), ns) =>
      val (ca, cb) = (counts(a), counts(b))
      (a, b, ca, cb, ns, ns * 1000000L / (ca + cb - ns),
        ns * 1000000L / math.min(ca, cb))
    }
    val got = Dedup.dedupSourceOverlap(spark, dir).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == expected.toSeq,
      "distributed overlap matrix must equal the driver replay")
    assert(got.nonEmpty, "fixture sources share no shingles — vacuous")
    assert(got.forall(r => r._7 >= r._6),
      "containment must dominate jaccard for every pair")
    assert(got.forall(r => r._5 <= math.min(r._3, r._4)),
      "shared count cannot exceed either profile")
  }

  test("dedup_cluster_stats: histogram equals a replay over the cluster " +
      "labels and the planted near-dups surface as size>=2 mass") {
    val clusters = Curation.dedupClusters(spark, dir)
      .select("cluster_id", "cluster_size").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val total = clusters.map(_._2).sum
    val expected = clusters.groupBy(_._2).toSeq.map { case (size, cs) =>
      val nDocs = cs.map(_._2).sum
      (size, cs.length.toLong, nDocs, nDocs * 1000000L / total)
    }.sortBy(_._1)
    val got = Curation.dedupClusterStats(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected,
      "distributed histogram must equal the label replay")
    assert(got.exists(r => r._1 >= 2 && r._2 > 0),
      "planted near-dup clusters missing from the histogram")
    val singles = got.find(_._1 == 1L).map(_._4).getOrElse(0L)
    assert(singles > 500000L, "singletons should dominate the corpus")
    assert(got.map(_._3).sum == total && total > 0)
  }

  test("text_distinct_n: per-source diversity equals a driver replay " +
      "and detects repeated bigrams") {
    val docs = t(spark, dir, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1)))
    val expected = docs.groupBy(_._1).toSeq.map { case (src, ds) =>
      val toks = ds.flatMap(_._2)
      val bgs = ds.flatMap(_._2.sliding(2).filter(_.length == 2)
        .map(p => s"${p(0)} ${p(1)}"))
      val (nt, ty) = (toks.length.toLong, toks.distinct.length.toLong)
      val (nb, bty) = (bgs.length.toLong, bgs.distinct.length.toLong)
      (src, nt, ty, ty * 1000000L / nt, nb, bty,
        if (nb > 0) Some(bty * 1000000L / nb) else None)
    }.sortBy(_._1)
    val got = TextAnalysis.textDistinctN(spark, dir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6))))
    assert(got.toSeq == expected,
      "distributed diversity report must equal the driver replay")
    // non-vacuous: the shared-vocabulary fixture must show BOTH repeated
    // unigrams (distinct1 < 1) and substantial bigram diversity
    assert(got.forall(r => r._4 < 1000000L),
      "every source should repeat unigrams on this fixture")
    assert(got.exists(r => r._7.exists(_ < 1000000L)),
      "some source should repeat bigrams — diversity readout vacuous")
  }
}
