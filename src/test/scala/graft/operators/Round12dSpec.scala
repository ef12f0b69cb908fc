package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.Tables.t

/** Round-12d contracts: key-uniqueness audit, RFM segmentation,
  * deterministic negative sampling, hashed-feature classifier scoring,
  * and winnowing fingerprints.
  */
class Round12dSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("dq_uniqueness: one row per audited key, keys <= rows, ratio in (0,1]") {
    val rows = Profiling.dqUniqueness(spark, dir).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      val (n, k) = (r.getAs[Long]("n_rows"), r.getAs[Long]("n_keys"))
      assert(k <= n && k > 0, s"${r.getString(0)}: keys $k rows $n")
      assert(r.getAs[Long]("n_dup_rows") == n - k)
      val u = r.getAs[Double]("uniqueness")
      assert(u > 0.0 && u <= 1.0)
    }
    // single-column primary keys in the fixture are actually unique
    rows.filter(r => Set("orders", "events", "documents", "embeddings")
        .contains(r.getString(0)))
      .foreach(r => assert(r.getAs[Long]("n_dup_rows") == 0L,
        s"${r.getString(0)} expected unique"))
  }

  test("ev_rfm: one row per user, scores in 1..5, segment is the concat") {
    val df = EventAnalytics.evRfm(spark, dir)
    val rows = df.collect()
    val users = t(spark, dir, "events").select("user_id").distinct().count()
    assert(rows.length == users)
    rows.foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach { c =>
        val s = r.getAs[Int](c)
        assert(s >= 1 && s <= 5, s"$c=$s")
      }
      assert(r.getAs[String]("segment") ==
        s"${r.getAs[Int]("r_score")}${r.getAs[Int]("f_score")}${r.getAs[Int]("m_score")}")
      assert(r.getAs[Long]("frequency") > 0)
      assert(r.getAs[Int]("recency_days") >= 0)
    }
    // quintile scores are a permutation-free ranking: each score bucket is
    // nonempty when there are >= 5 users
    if (users >= 5)
      assert(rows.map(_.getAs[Int]("f_score")).distinct.length > 1)
  }

  test("sim_negatives: no self pairs, labels always differ, deterministic") {
    val a = Similarity.simNegatives(spark, dir)
    val rows = a.collect()
    assert(rows.nonEmpty)
    val emb = t(spark, dir, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val (anchor, neg) = (r.getAs[Long]("anchor_id"), r.getAs[Long]("neg_id"))
      assert(anchor != neg)
      assert(emb(anchor) != r.getAs[Int]("neg_label"))
      assert(emb(neg) == r.getAs[Int]("neg_label"))
      val c = r.getAs[Double]("cos_sim")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
    // at most k=4 negatives per anchor
    val perAnchor = rows.groupBy(_.getAs[Long]("anchor_id")).values.map(_.size)
    assert(perAnchor.max <= 4)
    // content-addressed draw: a second run returns the identical set
    val again = Similarity.simNegatives(spark, dir).collect()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("anchor_id"), r.getAs[Int]("slot"), r.getAs[Long]("neg_id"))
    assert(rows.map(key).toSet == again.map(key).toSet)
  }

  test("sim_negatives_hard: label-disjoint, rank-ordered, harder than random") {
    val hard = Similarity.simNegativesHard(spark, dir).collect()
    assert(hard.nonEmpty)
    val labels = t(spark, dir, "embeddings").select("vec_id", "label")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    hard.groupBy(_.getAs[Long]("qid")).foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq ==
        (1 to sorted.length).toSeq)
      // cos descends with rank; every negative has a different label
      sorted.sliding(2).foreach {
        case Array(x, y) =>
          assert(x.getAs[Double]("cos_sim") >= y.getAs[Double]("cos_sim"))
        case _ =>
      }
      sorted.foreach(r =>
        assert(labels(qid) != r.getAs[Int]("neg_label"), s"anchor $qid"))
    }
    // mined hard negatives should on average score above the random draw
    val rand = Similarity.simNegatives(spark, dir).collect()
      .map(_.getAs[Double]("cos_sim"))
    val hardMean = hard.map(_.getAs[Double]("cos_sim")).sum / hard.length
    val randMean = rand.sum / rand.length
    assert(hardMean > randMean,
      s"hard negatives mean $hardMean should exceed random mean $randMean")
  }

  test("text_classifier_score: score in (0,1), keep is the 0.5 threshold") {
    val rows = TextAnalysis.textClassifierScore(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[Double]("score")
      assert(s > 0.0 && s < 1.0)
      assert(r.getAs[Boolean]("keep") == (s >= 0.5))
    }
  }

  test("dedup_winnow_pairs: ordered pairs, threshold held, near-dups found") {
    val rows = Dedup.dedupWinnowPairs(spark, dir).collect()
    assert(rows.nonEmpty, "fixture has planted near-duplicates")
    rows.foreach { r =>
      assert(r.getAs[Long]("da") < r.getAs[Long]("db"))
      assert(r.getAs[Long]("n_shared") >= 3)
    }
    // a planted exact duplicate pair must surface: exact dups share every
    // fingerprint, and the fixture plants ~0.3% exact dups
    val texts = t(spark, dir, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val exactPair = texts.groupBy(_._2).values.find(_.length >= 2)
    exactPair.foreach { g =>
      val ids = g.map(_._1).sorted
      val found = rows.exists(r => r.getAs[Long]("da") == ids(0)
        && r.getAs[Long]("db") == ids(1))
      assert(found, s"exact-dup pair ${ids.toSeq} missing from winnow pairs")
    }
  }

  test("o11_latest_per_key: one row per customer, max date, heap plan (no Window)") {
    val df = Relational.o11LatestPerKey(spark, dir)
    val rows = df.collect()
    val orders = t(spark, dir, "orders")
      .select("o_custkey", "o_orderdate").collect()
      .groupBy(_.getLong(0))
    assert(rows.length == orders.size)
    rows.foreach { r =>
      val latest = orders(r.getAs[Long]("o_custkey")).map(_.get(1).toString).max
      assert(r.getAs[AnyRef]("o_orderdate").toString == latest)
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), "native operator must plan")
    assert(!plan.contains("Window"), "no window sort for k=1")
  }

  test("ts_holt: fold matches a driver-side recompute bit-for-bit pre-round") {
    val got = EventAnalytics.tsHolt(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Int]("n_days"), r.getAs[Double]("level"),
          r.getAs[Double]("trend"), r.getAs[Double]("forecast_next"))).toMap
    assert(got.nonEmpty)
    val daily = t(spark, dir, "events")
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(count(lit(1)).cast("double").as("y"))
      .collect().map(r => (r.getString(0), r.getDate(1), r.getDouble(2)))
    daily.groupBy(_._1).foreach { case (tpe, rows) =>
      val ys = rows.sortBy(_._2.toString).map(_._3)
      var l = ys.head; var b = 0.0
      ys.tail.foreach { y =>
        val nl = 0.5 * y + 0.5 * (l + b)
        b = 0.5 * (nl - l) + 0.5 * b
        l = nl
      }
      val (n, gl, gb, gf) = got(tpe)
      assert(n == ys.length, s"$tpe n_days")
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(gl == r6(l), s"$tpe level $gl vs ${r6(l)}")
      assert(gb == r6(b), s"$tpe trend")
      assert(gf == r6(l + b), s"$tpe forecast")
    }
  }

  test("dedup_url: every designed pair collapses to one canonical key") {
    val rows = Dedup.dedupUrl(spark, dir).collect()
    val docs = t(spark, dir, "documents").count()
    assert(rows.length == docs / 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dups") == 2L)
      assert(r.getAs[Long]("keeper_doc_id") % 2 == 0, "keeper is the even id")
      val canon = r.getAs[String]("url_canon")
      assert(canon.startsWith("http://site.example.com/page/")
        && canon.endsWith("?q=1"), canon)
    }
  }

  test("x17_url_normalize: canon strips fragment/port/tracking, sorts params") {
    val rows = Scalars.x17UrlNormalize(spark, dir).collect()
    assert(rows.length ==
      t(spark, dir, "documents").count())
    rows.foreach { r =>
      val canon = r.getAs[String]("url_canon")
      assert(!canon.contains("#"))
      assert(!canon.contains("utm_"))
      assert(!canon.contains(":80/") && !canon.contains(":443/"))
      val scheme = canon.takeWhile(_ != ':')
      assert(scheme == scheme.toLowerCase)
      assert(r.getAs[String]("host") == r.getAs[String]("host").toLowerCase)
      val qm = canon.indexOf('?')
      if (qm >= 0) {
        val params = canon.substring(qm + 1).split("&").toSeq
        assert(params == params.sorted, s"params unsorted in $canon")
        assert(params.length == r.getAs[Int]("n_params"))
      } else assert(r.getAs[Int]("n_params") == 0)
    }
    // canonicalization is a dedup key: distinct raw forms that differ only
    // in case/port/tracking/fragment collapse — here every doc keeps a
    // distinct canon (ids embedded), so |distinct| == |docs|
    assert(rows.map(_.getAs[String]("url_canon")).distinct.length ==
      rows.length)
  }

  test("composite-key audit: delimiter collisions and NULL parts count " +
      "as distinct real keys (ADVICE r12)") {
    import spark.implicits._
    // ('a#b','c') vs ('a','b#c') collide under naive '#'-join; a NULL
    // part drops the row entirely under naive || concatenation
    val df = Seq(
      (Option("a#b"), Option("c")),
      (Option("a"), Option("b#c")),
      (Option("a"), None: Option[String]),
      (None: Option[String], Option("a")),
      (Option("a"), None: Option[String])).toDF("k1", "k2")
    val r = Profiling.keyUniquenessAudit("t", df, Seq("k1", "k2"))
      .collect()(0)
    assert(r.getAs[Long]("n_rows") == 5L)
    // 4 distinct composites: (a#b,c), (a,b#c), (a,NULL) x2, (NULL,a)
    assert(r.getAs[Long]("n_keys") == 4L, r.toString)
    assert(r.getAs[Long]("n_dup_rows") == 1L)
  }

  test("urlParts: default-port strip is scheme-matched (ADVICE r12)") {
    import spark.implicits._
    val df = Seq(
      "http://host:443/x", "https://host:80/x",
      "http://host:80/x", "https://host:443/x",
      "ftp://host:80/x").toDF("u")
    val got = df.select(col("u"),
        Scalars.urlParts(col("u"))("url_canon").as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // mismatched scheme/port pairs are DISTINCT resources — never merged
    assert(got("http://host:443/x") == "http://host:443/x")
    assert(got("https://host:80/x") == "https://host:80/x")
    // matched defaults strip
    assert(got("http://host:80/x") == "http://host/x")
    assert(got("https://host:443/x") == "https://host/x")
    // non-http(s) schemes never strip
    assert(got("ftp://host:80/x") == "ftp://host:80/x")
  }

  test("text_winnowing: counts positive, min is the array head, sum consistent") {
    val rows = TextAnalysis.textWinnowing(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Int]("n_fp")
      assert(n > 0, "fixture docs all exceed k chars")
      assert(r.getAs[Long]("fp_min") <= r.getAs[Long]("fp_sum") / n)
    }
  }
}
