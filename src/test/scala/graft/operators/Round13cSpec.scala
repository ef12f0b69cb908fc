package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Round-13c contracts: label-propagation communities, the ACF
  * diagnostic, and RAKE keyword extraction. Each distributed result is
  * checked against a driver-side brute-force recompute from the same
  * inputs — the spec owns the semantics, the oracle SQL owns
  * cross-engine parity.
  */
class Round13cSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("graph_label_prop: labels match a driver-side synchronous LPA " +
      "replay and communities refine the connected components") {
    val pairs = Dedup.dedupMinhashLsh(spark, dir)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "sf0.001 corpus should have planted near-dups")
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSeq }
    // synchronous rounds: argmax by (count desc, label asc) over neighbors
    var labels: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to Curation.LabelPropIters) {
      labels = adj.map { case (n, ns) =>
        val best = ns.map(labels).groupBy(identity)
          .map { case (l, xs) => (l, xs.size) }
          .minBy { case (l, c) => (-c, l) }._1
        n -> best
      }
    }
    val out = Curation.graphLabelProp(spark, dir).collect()
    assert(out.length == adj.size, "one row per pair-graph node")
    val sizes = labels.values.groupBy(identity).map { case (l, xs) => l -> xs.size.toLong }
    out.foreach { r =>
      val (id, com, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(com == labels(id), s"doc $id community: $com vs ${labels(id)}")
      assert(n == sizes(com), s"community $com size")
    }
    // refinement: two docs sharing a community must share a component
    var comp: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    var changed = true
    while (changed) {
      changed = false
      adj.foreach { case (n, ns) =>
        val m = (comp(n) +: ns.map(comp)).min
        if (m != comp(n)) { comp += n -> m; changed = true }
        ns.foreach { x => if (comp(x) != m) { comp += x -> m; changed = true } }
      }
    }
    labels.groupBy(_._2).values.foreach { members =>
      assert(members.keys.map(comp).toSet.size == 1,
        "a community may never span two connected components")
    }
    // non-vacuous: the fixture must actually split somewhere — more
    // communities than components, or this is just hash-min again
    assert(sizes.size >= comp.values.toSet.size)
  }

  test("ts_acf: per-type lag correlations match a driver-side Pearson " +
      "recompute over the cent-exact daily series") {
    val daily = graft.Tables.t(spark, dir, "events")
      .selectExpr("event_type", "CAST(ts AS DATE) AS day",
        "CAST(value AS DOUBLE) AS v").collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2)))
      .groupBy { case (t, d, _) => (t, d) }
      .map { case ((t, d), xs) =>
        (t, d, xs.map(x => math.rint(x._3 * 100).toLong).sum / 100.0)
      }.toSeq
    val series = daily.groupBy(_._1).map { case (t, xs) =>
      t -> xs.sortBy(_._2).map(_._3).toArray
    }
    def pearson(a: Array[Double], b: Array[Double]): Double = {
      val n = a.length
      val (ma, mb) = (a.sum / n, b.sum / n)
      val cov = a.indices.map(i => (a(i) - ma) * (b(i) - mb)).sum
      val (va, vb) = (a.map(x => (x - ma) * (x - ma)).sum,
        b.map(x => (x - mb) * (x - mb)).sum)
      cov / math.sqrt(va * vb)
    }
    val out = EventAnalytics.tsAcf(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (t, k, n, acf) =
        (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))
      val s = series(t)
      assert(n == s.length - k, s"$t lag $k pair count")
      val exp = pearson(s.dropRight(k), s.drop(k))
      assert(math.abs(acf - exp) < 1e-5, s"$t lag $k: $acf vs $exp")
    }
    // every type long enough for lag 7 contributes all 7 lags
    val perType = out.groupBy(_.getString(0)).view.mapValues(_.length)
    series.foreach { case (t, s) =>
      if (s.length >= EventAnalytics.AcfMaxLag + 3)
        assert(perType(t) == EventAnalytics.AcfMaxLag, s"$t lag coverage")
    }
  }

  test("text_keywords: top-20 RAKE phrases match a driver-side recompute " +
      "with integer-micro word scores") {
    val docs = graft.Tables.t(spark, dir, "documents")
      .select("text").collect().map(_.getString(0))
    val stop = Set("a", "the")
    val phrases = docs.flatMap { text =>
      // maximal runs of non-stopword tokens
      val out = scala.collection.mutable.Buffer.empty[Seq[String]]
      var cur = scala.collection.mutable.Buffer.empty[String]
      text.split(" ").foreach { w =>
        if (stop(w)) { if (cur.nonEmpty) { out += cur.toSeq; cur.clear() } }
        else if (w.nonEmpty) cur += w
      }
      if (cur.nonEmpty) out += cur.toSeq
      out
    }
    val deg = scala.collection.mutable.Map.empty[String, Long]
    val freq = scala.collection.mutable.Map.empty[String, Long]
    phrases.foreach { p =>
      p.foreach { w =>
        deg(w) = deg.getOrElse(w, 0L) + p.length
        freq(w) = freq.getOrElse(w, 0L) + 1L
      }
    }
    val wscoreU = deg.keys.map { w =>
      w -> math.rint(deg(w) * 1000000.0 / freq(w)).toLong
    }.toMap
    val expected = phrases.map(p => (p.mkString(" "), p.map(wscoreU).sum))
      .groupBy(_._1)
      .map { case (ph, xs) => (ph, xs.length.toLong, xs.head._2) }.toSeq
      .sortBy { case (ph, _, su) => (-su, ph) }
      .take(TextAnalysis.RakeTopK)
    val out = TextAnalysis.textKeywords(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == expected.length)
    out.zip(expected).foreach {
      case ((ph, n, s), (eph, en, esu)) =>
        assert(ph == eph, s"phrase order: $ph vs $eph")
        assert(n == en, s"$ph occurrence count")
        assert(math.abs(s - esu / 1e6) < 1e-9, s"$ph score $s vs ${esu / 1e6}")
    }
    // multi-word phrases must appear — RAKE degenerates to term-frequency
    // if segmentation never yields a run longer than one token
    assert(out.exists(_._1.contains(" ")), "no multi-word keyword")
  }
}
