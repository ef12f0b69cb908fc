package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Round-13b contracts: triangle census over the near-dup pair graph.
  * Each distributed result is checked against a driver-side brute-force
  * recompute from the same pair list — the spec owns the semantics, the
  * oracle SQL owns cross-engine parity.
  */
class Round13bSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("graph_triangles: per-node counts match an adjacency-set " +
      "brute-force; clique members close, isolated pairs do not") {
    val pairs = Dedup.dedupMinhashLsh(spark, dir)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "sf0.001 corpus should have planted near-dups")
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val triExpect = adj.map { case (n, ns) =>
      // count unordered neighbor pairs that are themselves adjacent
      n -> ns.toSeq.combinations(2).count {
        case Seq(x, y) => adj(x).contains(y)
        case _         => false
      }.toLong
    }
    val out = Curation.graphTriangles(spark, dir).collect()
    assert(out.length == adj.size, "one row per pair-graph node")
    out.foreach { r =>
      val (id, deg, tri, cc) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(deg == adj(id).size, s"doc $id degree")
      assert(tri == triExpect(id), s"doc $id triangles: $tri vs ${triExpect(id)}")
      val expCc =
        if (deg >= 2) math.rint(2.0 * tri / (deg * (deg - 1)) * 1e6) / 1e6
        else 0.0
      assert(cc == expCc, s"doc $id clustering coeff")
    }
    // the planted duplicate families should produce at least one closed
    // triangle somewhere (three mutual near-dups); a graph with zero
    // triangles would make this operator vacuous on its own fixture
    assert(out.map(_.getLong(2)).sum > 0, "no triangles in pair graph")
    // output ordered by doc_id for deterministic hashing
    val ids = out.map(_.getLong(0)).toSeq
    assert(ids == ids.sorted)
  }

  test("text_zipf: summary and integer-micro least-squares slope match a " +
      "driver-side recompute from raw token counts") {
    val docs = graft.Tables.t(spark, dir, "documents")
      .select("text").collect().map(_.getString(0))
    val counts = docs.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (tok, xs) => tok -> xs.length.toLong }
    val top = counts.toSeq.sortBy { case (tok, n) => (-n, tok) }.take(100)
    val pts = top.zipWithIndex.map { case ((_, n), i) =>
      (math.rint(math.log(i + 1.0) * 1e6).toLong,
        math.rint(math.log(n.toDouble) * 1e6).toLong)
    }
    val m = pts.length.toLong
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map { case (x, y) => x * y }.sum
    val sxx = pts.map { case (x, _) => x * x }.sum
    val slope =
      math.rint((m * sxy - sx * sy).toDouble / (m * sxx - sx * sx) * 1e6) / 1e6
    val r = TextAnalysis.textZipf(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_tokens") == counts.values.sum)
    assert(r.getAs[Long]("n_types") == counts.size.toLong)
    assert(r.getAs[Long]("n_hapax") == counts.values.count(_ == 1L).toLong)
    assert(r.getAs[Long]("n_fit_points") == m)
    assert(r.getAs[Double]("zipf_slope") == slope)
    // a frequency-ranked corpus always fits with non-positive slope
    assert(r.getAs[Double]("zipf_slope") <= 0.0)
  }

  test("ts_stl: decomposition identity holds, trend is null exactly at " +
      "the 3-day edges, seasonal is a zero-mean day-of-week profile") {
    val rows = EventAnalytics.tsStl(spark, dir).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getDate(1).toLocalDate.toEpochDay)
      // centered 7-day MA: undefined for the first and last 3 days only
      sorted.zipWithIndex.foreach { case (r, i) =>
        val defined = i >= 3 && i < sorted.length - 3
        assert(r.isNullAt(3) == !defined,
          s"trend null-ness at index $i of ${sorted.length}")
        assert(r.isNullAt(4) == !defined && r.isNullAt(5) == !defined)
        if (defined) {
          // y = trend + seasonal + resid (terms are exact micro multiples)
          val y = r.getLong(2).toDouble
          val sum3 = r.getDouble(3) + r.getDouble(4) + r.getDouble(5)
          assert(math.abs(sum3 - y) < 1e-6, s"identity: $sum3 vs $y")
          // trend really is the 7-day centered mean
          val win = sorted.slice(i - 3, i + 4).map(_.getLong(2)).sum
          val expTrend = math.rint(win.toDouble * 1e6 / 7) / 1e6
          assert(math.abs(r.getDouble(3) - expTrend) < 1e-9)
        }
      }
      // day-of-week profile sums to ~0 over one distinct week
      val perDow = sorted.filter(!_.isNullAt(4))
        .map(r => r.getDate(1).toLocalDate.getDayOfWeek.getValue ->
          r.getDouble(4)).toMap
      if (perDow.size == 7)
        assert(math.abs(perDow.values.sum) < 7e-6,
          s"seasonal profile not zero-mean: ${perDow.values.sum}")
    }
  }

  test("dedup_lsh_recall: metrics match driver-side set arithmetic over " +
      "the exact and LSH pair sets; the eval-scale guard trips loudly") {
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("da", "db").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(Dedup.dedupNgramJaccard(spark, dir, tau = 0.5))
    val lsh = pairSet(Dedup.dedupMinhashLsh(spark, dir))
    assert(exact.nonEmpty, "fixture should plant true near-dup pairs")
    val hit = (exact intersect lsh).size.toLong
    val r = Dedup.dedupLshRecall(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_exact") == exact.size.toLong)
    assert(r.getAs[Long]("n_lsh") == lsh.size.toLong)
    assert(r.getAs[Long]("n_hit") == hit)
    assert(r.getAs[Double]("recall") ==
      math.rint(hit.toDouble / exact.size * 1e6) / 1e6)
    assert(r.getAs[Double]("precision") ==
      math.rint(hit.toDouble / lsh.size * 1e6) / 1e6)
    val e = intercept[IllegalArgumentException] {
      Dedup.dedupLshRecall(spark, dir, maxRows = 1)
    }
    assert(e.getMessage.contains("EVAL baseline"))
  }

  test("ts_changepoint: the window-identity CUSUM equals the textbook " +
      "sequential recursion, alerts fire iff a statistic exceeds mu") {
    val rows = EventAnalytics.tsChangepoint(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getDate(1).toLocalDate.toEpochDay)
      val ys = sorted.map(_.getLong(2))
      val muU = math.rint(ys.sum.toDouble * 1e6 / ys.length).toLong
      val kU = muU / 20L
      var (up, dn) = (0L, 0L)
      sorted.zip(ys).foreach { case (r, y) =>
        up = math.max(0L, up + (y * 1000000L - muU - kU))
        dn = math.max(0L, dn - (y * 1000000L - muU + kU))
        assert(r.getDouble(3) == math.rint(up.toDouble / 1e6 * 1e6) / 1e6,
          s"cusum_up at ${r.getDate(1)}")
        assert(r.getDouble(4) == math.rint(dn.toDouble / 1e6 * 1e6) / 1e6,
          s"cusum_down at ${r.getDate(1)}")
        assert(r.getBoolean(5) == (up > muU || dn > muU))
      }
    }
  }

  test("dq_benford: digit histogram matches a driver recompute over " +
      "exact cents, shares sum to 1, expectations follow log10(1+1/d)") {
    val cents = graft.Tables.t(spark, dir, "lineitem")
      .select("l_extendedprice").collect()
      .map(r => math.rint(r.getDouble(0) * 100).toLong).filter(_ > 0)
    val hist = cents.map(_.toString.head.asDigit).groupBy(identity)
      .map { case (d, xs) => d -> xs.length.toLong }
    val total = hist.values.sum
    val out = Profiling.dqBenford(spark, dir).collect()
    assert(out.map(_.getInt(0)).toSeq == (1 to 9).filter(hist.contains))
    out.foreach { r =>
      val (d, n, share, p) =
        (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(n == hist(d))
      assert(share == math.rint(n.toDouble / total * 1e6) / 1e6)
      assert(p == math.rint(math.log10(1.0 + 1.0 / d) * 1e6) / 1e6)
      assert(r.getDouble(4) == math.rint(math.abs(share - p) * 1e6) / 1e6)
    }
    assert(math.abs(out.map(_.getDouble(2)).sum - 1.0) < 1e-5)
  }
}
