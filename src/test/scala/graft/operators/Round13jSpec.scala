package graft.operators

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.col

import graft.SparkTestSession
import graft.Tables.t

/** Round-13j contracts: Efraimidis–Spirakis weighted sampling, the
  * Pearson correlation audit, tokenizer fertility, and the DCT
  * perceptual hash. Driver replays own the semantics; planted structure
  * (a derived measure column, near-dup image groups) pins each
  * detector's point.
  */
class Round13jSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def rnd(v: Double): Long =
    BigDecimal(v).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("cur_sample_es: draw equals a driver replay and the weights " +
      "actually steer the selection") {
    val docs = t(spark, dir, "documents")
      .select("doc_id", "lang", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3)))
    def quality(text: String): Double = {
      val wAll = text.split(" ", -1)
      val stop = wAll.count(x => x == "a" || x == "the")
      val letters = text.replaceAll("[^a-z]", "").length
      val q = 0.4 * math.min(wAll.length / 100.0, 1.0) +
        0.3 * (1.0 - stop.toDouble / wAll.length) +
        0.3 * letters.toDouble / text.length
      BigDecimal(q).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val keyed = docs.map { case (id, lang, src, text) =>
      val q = quality(text)
      val qm = rnd(q * 1e6)
      val v = BigInt(md5hex(id.toString).take(8), 16).toLong
      val u = (v.toDouble + 0.5) / 4294967296.0
      (id, lang, src, q, qm, rnd(math.log(u) / (qm / 1000000.0) * 1e6),
        rnd(math.log(u) * 1e6)) // unweighted key for the steering check
    }.filter(_._5 > 0)
    val expected = keyed
      .sortBy { case (id, _, _, _, _, k, _) => (-k, id) }
      .take(Curation.EsSampleN)
      .zipWithIndex
      .map { case ((id, lang, src, q, _, k, _), i) =>
        (id, lang, src, q, k, i + 1) }
    val got = Curation.sampleEsTopN(spark, dir).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3),
        r.getLong(4), r.getInt(5)))
    assert(got.toSeq == expected.toSeq,
      "distributed E-S draw must equal the driver replay")
    // weights matter: the weighted top-N must differ from the top-N the
    // same u-sequence gives under UNIFORM weights
    val uniform = keyed.sortBy { case (id, _, _, _, _, _, k) => (-k, id) }
      .take(Curation.EsSampleN).map(_._1).toSet
    assert(got.map(_._1).toSet != uniform,
      "weighted draw identical to uniform draw — weights inert")
    assert(got.length == Curation.EsSampleN, "draw must be exact-size")
  }

  test("dq_correlation: matrix equals a driver replay and a planted " +
      "derived column reads as |r| = 1") {
    // driver replay on the real fixture
    val rows = t(spark, dir, "lineitem")
      .select("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .collect().map(r => Array(r.getDouble(0), r.getDouble(1),
        r.getDouble(2), r.getDouble(3)).map(x => rnd(x * 100)))
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val n = rows.length.toLong
    def corr(i: Int, j: Int): Option[Double] = {
      val sx = rows.map(_(i)).map(BigInt(_)).sum
      val sy = rows.map(_(j)).map(BigInt(_)).sum
      val sxx = rows.map(r => BigInt(r(i)) * BigInt(r(i))).sum
      val syy = rows.map(r => BigInt(r(j)) * BigInt(r(j))).sum
      val sxy = rows.map(r => BigInt(r(i)) * BigInt(r(j))).sum
      val num = n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble
      val dx = n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
      val dy = n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble
      if (dx > 0 && dy > 0)
        Some(BigDecimal(num / math.sqrt(dx * dy))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      else None
    }
    val expected = (for {
      i <- cols.indices; j <- (i + 1) until cols.length
    } yield (cols(i), cols(j), n, corr(i, j))).sortBy(p => (p._1, p._2))
    val got = Profiling.dqCorrelation(spark, dir).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got.toSeq == expected,
      "distributed correlation matrix must equal the driver replay")
    assert(got.forall(_._4.forall(v => math.abs(v) <= 1.0)))

    // planted fixture: extendedprice EXACTLY 3x quantity -> r = 1 on
    // that pair; tax constant -> zero variance -> NULL, never NaN
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_corr").toString
    t(spark, dir, "lineitem")
      .select(col("l_quantity"),
        (col("l_quantity") * 3).as("l_extendedprice"),
        col("l_discount"),
        org.apache.spark.sql.functions.lit(0.05).as("l_tax"))
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/lineitem.parquet")
    val planted = Profiling.dqCorrelation(spark, tmp).collect().map(r =>
      ((r.getString(0), r.getString(1)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(planted(("l_quantity", "l_extendedprice")).contains(1.0),
      "a derived measure must read as r = 1")
    assert(planted(("l_quantity", "l_tax")).isEmpty,
      "a constant column must read as NULL, not NaN")
  }

  test("text_fertility: per-language rollup equals regrouping the " +
      "oracle-checked per-doc encode by lang") {
    val lang = t(spark, dir, "documents").select("doc_id", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val perDoc = TextAnalysis.textBpeEncode(spark, dir).collect()
      .map(r => (lang(r.getLong(0)), r.getInt(1).toLong,
        r.getLong(2), r.getLong(3)))
    val expected = perDoc.groupBy(_._1).toSeq.map { case (lg, ds) =>
      val (w, b, c) =
        (ds.map(_._2).sum, ds.map(_._3).sum, ds.map(_._4).sum)
      (lg, ds.length.toLong, w, b, c,
        if (w > 0) Some(b * 1000000L / w) else None,
        if (b > 0) Some(c * 1000000L / b) else None)
    }.sortBy(_._1)
    val got = TextAnalysis.textFertility(spark, dir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)),
        if (r.isNullAt(6)) None else Some(r.getLong(6))))
    assert(got.toSeq == expected.toSeq,
      "fertility rollup must equal the per-doc encode regrouped by lang")
    assert(got.length >= 2, "fixture should span several languages")
    // a word is at least one subword: fertility >= 1.0 wherever defined
    assert(got.forall(_._6.forall(_ >= 1000000L)),
      "fertility below one token per word is impossible")
  }

  test("mm_phash: hash equals an independent decode+DCT replay and " +
      "planted image groups cohere in hamming space") {
    val payloads = Multimodal.withDhashPayload(spark, dir)
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    val cij = Array.tabulate(64) { uv =>
      val (v, u) = (uv / 8, uv % 8)
      Array.tabulate(1024) { xy =>
        val (y, x) = (xy / 32, xy % 32)
        BigDecimal(math.cos(math.Pi * ((2 * x + 1) * u) / 64.0) *
            math.cos(math.Pi * ((2 * y + 1) * v) / 64.0) * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }
    }
    val expected = payloads.map { case (id, bytes) =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      val gray = Array.tabulate(1024) { xy =>
        val p = img.getRGB((xy % 32) * img.getWidth / 32,
          (xy / 32) * img.getHeight / 32) & 0xffffff
        (((p >> 16) & 255) + ((p >> 8) & 255) + (p & 255)).toLong
      }
      val f = cij.map(c => gray.indices.map(i => gray(i) * c(i)).sum)
      // AC-only (DC excluded, ADVICE r13): 63 coefficients thresholded
      // on their exact single-element median
      val ac = f.drop(1)
      val med = ac.sorted.apply(31)
      id -> ac.map(v => if (v > med) '1' else '0').mkString
    }.toMap
    val got = Multimodal.mmPhash(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == expected,
      "distributed pHash must equal the independent decode replay")
    // planted 4-member groups must sit closer in hamming space than
    // unrelated images (md5-random pixels, expected distance ~31.5
    // over the 63 AC bits)
    def ham(a: String, b: String): Int =
      a.zip(b).count { case (x, y) => x != y }
    val ids = got.keys.toSeq.sorted
    val (in, cross) = (for {
      i <- ids; j <- ids if j > i
    } yield (i / 4 == j / 4, ham(got(i), got(j)))).partition(_._1)
    val inMean = in.map(_._2).sum.toDouble / in.length
    val crossMean = cross.map(_._2).sum.toDouble / cross.length
    assert(inMean < 20 && crossMean > 28,
      s"hamming separation lost (in-group $inMean, cross $crossMean)")
  }
}
