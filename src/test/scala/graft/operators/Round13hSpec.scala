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
}
