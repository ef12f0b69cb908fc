package graft.operators

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.Tables.t

/** Round-13h contract: DSIR-style importance selection. The distributed
  * result is checked against a driver-side brute-force recompute of the
  * hashed-unigram importance weights and the deterministic top-N from the
  * same inputs — the spec owns the semantics, the oracle SQL owns
  * cross-engine parity.
  */
class Round13hSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("cur_dsir_select: scores equal a driver recompute of the " +
      "hashed-unigram log-ratio and the selection is quality-shifted") {
    val docs = t(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))

    def bucket(tok: String): Int =
      (BigInt(md5hex(tok).take(8), 16) % Curation.DsirBuckets).toInt

    // quality replay (the corpus_clean formula, round-half-up to 6dp)
    def quality(text: String): Double = {
      val wAll = text.split(" ", -1)
      val stop = wAll.count(x => x == "a" || x == "the")
      val letters = text.replaceAll("[^a-z]", "").length
      val q = 0.4 * math.min(wAll.length / 100.0, 1.0) +
        0.3 * (1.0 - stop.toDouble / wAll.length) +
        0.3 * letters.toDouble / text.length
      BigDecimal(q).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }

    val eligible = docs.map { case (id, text) =>
      (id, text.split(" ", -1).filter(_.nonEmpty), quality(text))
    }.filter(_._2.nonEmpty)
    assert(eligible.length > Curation.DsirTopN,
      "fixture too small to exercise the selection")

    // one-pass (bucket, raw, target) stats, then integer micro-nat weights
    val rc = new Array[Long](Curation.DsirBuckets)
    val tc = new Array[Long](Curation.DsirBuckets)
    eligible.foreach { case (_, w, q) =>
      val tgt = q >= Curation.DsirTargetQuality
      w.foreach { tok =>
        val b = bucket(tok); rc(b) += 1; if (tgt) tc(b) += 1
      }
    }
    val (rtot, ttot) = (rc.sum, tc.sum)
    assert(ttot > 0 && ttot < rtot,
      "quality threshold must split the corpus non-trivially")
    def microLn(c: Long, tot: Long): Long =
      BigDecimal(math.log((c + 1).toDouble / (tot + Curation.DsirBuckets))
        * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val lw = Array.tabulate(Curation.DsirBuckets)(b =>
      microLn(tc(b), ttot) - microLn(rc(b), rtot))

    val expected = eligible.map { case (id, w, _) =>
      val ssum = w.map(tok => lw(bucket(tok))).sum
      (id, w.length, ssum / w.length) // Long / Int truncates like `div`
    }.sortBy { case (id, _, score) => (-score, id) }
      .take(Curation.DsirTopN)
      .zipWithIndex
      .map { case ((id, n, s), i) => (id, n, s, i + 1) }

    val got = Curation.dsirSelect(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    assert(got.toSeq == expected.toSeq,
      "distributed DSIR selection must equal the driver replay")

    // non-vacuous: the ranking must actually separate target-ness. At
    // this fixture size the top-100 vs corpus-MEAN gap is within hash
    // noise (64 buckets), so pin the two robust orderings instead:
    // target docs out-score non-target docs on average, and the top of
    // the ranking is much more target-heavy than the bottom.
    val scoreById = eligible.map { case (id, w, _) =>
      id -> w.map(tok => lw(bucket(tok))).sum / w.length
    }.toMap
    val (tgtDocs, rawDocs) =
      eligible.partition(_._3 >= Curation.DsirTargetQuality)
    assert(tgtDocs.nonEmpty && rawDocs.nonEmpty)
    def meanScore(ds: Array[(Long, Array[String], Double)]): Double =
      ds.map(d => scoreById(d._1).toDouble).sum / ds.length
    assert(meanScore(tgtDocs) > meanScore(rawDocs),
      "target docs must out-score raw docs on average")
    val ranked = eligible.map(e => (e._1, scoreById(e._1), e._3))
      .sortBy { case (id, s, _) => (-s, id) }
    val topTgt = ranked.take(Curation.DsirTopN).count(_._3 >= Curation.DsirTargetQuality)
    val botTgt = ranked.takeRight(Curation.DsirTopN).count(_._3 >= Curation.DsirTargetQuality)
    assert(topTgt > botTgt,
      s"top-N must be more target-heavy than bottom-N ($topTgt vs $botTgt)")
  }

  test("cur_doremi_mix: weights equal a driver replay of the EG loop " +
      "and upweight the high-loss domains") {
    val docs = t(spark, dir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def rnd(v: Double): Long =
      BigDecimal(v).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val split = docs.map { case (id, src, text) =>
      (id, src, text.split(" ", -1),
        BigInt(md5hex(id.toString).take(1), 16) < 8)
    }
    val train = split.filter(_._4)
    val test = split.filterNot(_._4)
    val domains = train.map(_._2).distinct.sorted
    assert(domains.length > 1, "fixture must have multiple train domains")

    // weighted-LM heldout eval, mirroring the engine op independently
    def eval(alpha: Map[String, Long]): Map[String, (Long, Long)] = {
      val cu = new scala.collection.mutable.HashMap[String, Long]()
      val cb = new scala.collection.mutable.HashMap[(String, String), Long]()
      var tot = 0L
      train.foreach { case (_, src, w, _) =>
        val ap = alpha(src)
        w.foreach { tk => cu(tk) = cu.getOrElse(tk, 0L) + ap; tot += ap }
        w.sliding(2).filter(_.length == 2).foreach { p =>
          cb((p(0), p(1))) = cb.getOrElse((p(0), p(1)), 0L) + ap
        }
      }
      val acc = new scala.collection.mutable.HashMap[String, (Long, Long)]()
      test.foreach { case (_, src, w, _) =>
        w.sliding(2).filter(_.length == 2).foreach { pr =>
          val p = math.max(
            0.7 * (cb.getOrElse((pr(0), pr(1)), 0L).toDouble /
              cu.getOrElse(pr(0), 1L)) +
            0.30000000000000004 *
              (cu.getOrElse(pr(1), 0L).toDouble / tot),
            1e-9)
          val llu = rnd(math.log(p) * 1e6)
          val (n, s) = acc.getOrElse(src, (0L, 0L))
          acc(src) = (n + 1, s + llu)
        }
      }
      acc.map { case (s, (n, llu)) =>
        s -> (n, -rnd(llu.toDouble / n))
      }.toMap
    }

    var alpha = domains.map(_ -> 1000000L / domains.length).toMap
    var nll0: Map[String, Long] = Map.empty
    for (r <- 1 to Curation.DoremiRounds) {
      val cur = eval(alpha).filter(kv => alpha.contains(kv._1))
        .map { case (s, (_, nll)) => s -> nll }
      if (r == 1) nll0 = cur
      val ex =
        if (cur.isEmpty) domains.map(_ -> 0L).toMap
        else {
          val m = cur.values.sum / cur.size
          domains.map(d => d -> cur.get(d).map(_ - m).getOrElse(0L)).toMap
        }
      val raw = domains.map { d =>
        val exd = math.min(ex(d), Curation.DoremiExClampMicro)
        d -> alpha(d) * rnd(math.exp(exd.toDouble / 1e6) * 1e6) / 1000000L
      }
      val s = raw.map(_._2).sum
      alpha = raw.map { case (d, v) =>
        d -> ((v * 1000000L / s) *
          (1000000L - Curation.DoremiEpsPpm) / 1000000L
          + Curation.DoremiEpsPpm / domains.length)
      }.toMap
    }
    val fin = eval(alpha)
    val nTrain = train.groupBy(_._2).map { case (s, ds) => s -> ds.length }
    val expected = domains.map { d =>
      (d, nTrain(d).toLong, fin.get(d).map(_._1).getOrElse(0L),
        nll0.get(d), fin.get(d).map(_._2), alpha(d))
    }

    val got = Curation.curDoremiMix(spark, dir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getLong(5)))
    assert(got.toSeq == expected.toSeq,
      "distributed DoReMi loop must equal the driver replay")

    // non-vacuous: the EG update must move weights and move them toward
    // the lossy domains
    assert(alpha.values.toSet.size > 1, "weights never moved off uniform")
    val withN0 = domains.filter(nll0.contains)
    val hi = withN0.maxBy(nll0)
    val lo = withN0.minBy(nll0)
    assert(alpha(hi) > alpha(lo),
      s"max-loss domain $hi must out-weigh min-loss domain $lo")
    val sumA = domains.map(alpha).sum
    assert(math.abs(sumA - 1000000L) <= domains.length * 2,
      s"weights must stay a normalized mixture (sum $sumA)")
  }
}
