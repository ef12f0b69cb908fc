package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.Tables.t

/** Round-12b contracts: BPE pair stats, event paths, EWMA, curriculum
  * phases, keep-best dedup retention, freshness, and the ST12 streaming
  * user-profile upsert.
  */
class Round12bSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("text_bpe_pairs: top pairs match a driver-side recompute") {
    val got = TextAnalysis.textBpePairs(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(got.length == 20)
    val wc = t(spark, dir, "documents").select("text").collect()
      .flatMap(_.getString(0).split(" ", -1)).filter(_.length >= 2)
      .groupBy(identity).map { case (w, g) => w -> g.length.toLong }
    val pairs = scala.collection.mutable.Map.empty[String, Long]
    wc.foreach { case (w, c) =>
      (0 until w.length - 1).foreach { i =>
        val p = w.substring(i, i + 2)
        pairs(p) = pairs.getOrElse(p, 0L) + c
      }
    }
    val want = pairs.toSeq.sortBy { case (p, c) => (-c, p) }.take(20)
    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
  }

  test("text_bpe_train: merge list matches a driver-side greedy BPE trainer") {
    val got = TextAnalysis.textBpeTrain(spark, dir, nMerges = 6).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(got.length == 6)
    // reference trainer: symbol lists, argmax (count desc, pair asc),
    // greedy left-to-right non-overlapping merge application
    var vocab: Map[Vector[String], Long] =
      t(spark, dir, "documents").select("text").collect()
        .flatMap(_.getString(0).split(" ", -1)).filter(_.length >= 2)
        .groupBy(identity)
        .map { case (w, g) => w.map(_.toString).toVector -> g.length.toLong }
    val want = (1 to 6).map { rank =>
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).filter(_.length == 2).foreach { p =>
          pairs((p(0), p(1))) = pairs.getOrElse((p(0), p(1)), 0L) + c
        }
      }
      val ((l, r), cnt) = pairs.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.head
      vocab = vocab.groupBy { case (syms, _) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        syms.foreach { s =>
          if (out.nonEmpty && out.last == l && s == r)
            out(out.length - 1) = l + r
          else out += s
        }
        out.toVector
      }.map { case (syms, g) => syms -> g.values.sum }
      (rank, l, r, l + r, cnt)
    }
    assert(got.toSeq == want, s"got ${got.toSeq}\nwant $want")
    // merge frequencies are non-increasing (each new pair's support is
    // bounded by a pre-existing pair's support)
    assert(got.map(_._5).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("text_bpe_encode: merge monotonicity and char accounting hold") {
    val enc0 = TextAnalysis.textBpeEncode(spark, dir, nMerges = 0).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_ws_tokens"), r.getAs[Long]("n_bpe_tokens"),
          r.getAs[Long]("n_chars"))).toMap
    val enc8 = TextAnalysis.textBpeEncode(spark, dir, nMerges = 8).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_ws_tokens"), r.getAs[Long]("n_bpe_tokens"),
          r.getAs[Long]("n_chars"))).toMap
    assert(enc8.nonEmpty && enc8.keySet == enc0.keySet)
    enc8.foreach { case (id, (ws, bpe, chars)) =>
      val (ws0, bpe0, chars0) = enc0(id)
      // zero merges: every char is its own symbol
      assert(bpe0 == chars0, s"doc $id")
      // char mass is invariant under merging; token counts only shrink
      assert(chars == chars0 && ws == ws0, s"doc $id")
      assert(bpe <= bpe0 && bpe >= ws, s"doc $id: $bpe vs $bpe0, ws $ws")
    }
    // merges actually fired somewhere on the corpus
    assert(enc8.values.map(_._2).sum < enc0.values.map(_._2).sum)
  }

  test("ev_path_topk: counts match a driver-side recompute; k rows") {
    val got = EventAnalytics.evPathTopk(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(got.length == 15)
    val evs = t(spark, dir, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val paths = evs.groupBy(_._1).values.flatMap { g =>
      val sorted = g.sortBy(e => (e._2.getTime, e._3)).map(_._4)
      sorted.sliding(3).filter(_.length == 3).map(_.mkString(" > "))
    }
    val want = paths.groupBy(identity)
      .map { case (p, g) => p -> g.size.toLong }
      .toSeq.sortBy { case (p, c) => (-c, p) }.take(15)
    assert(got.toSeq == want)
  }

  test("ts_ewma: head rows renormalize, steady-state matches a recompute") {
    val rows = EventAnalytics.tsEwma(spark, dir).collect()
      .map(r => (r.getString(0), r.getDate(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { g =>
      val s = g.sortBy(_._2.getTime)
      // first row: no lags exist → ewma == v exactly
      assert(s.head._4 == s.head._3, s"head ewma ${s.head}")
      val vs = s.map(_._3)
      s.zipWithIndex.drop(1).foreach { case ((_, _, _, ewma), i) =>
        val lags = (0 to 6).flatMap(k => if (i - k >= 0) Some(vs(i - k)) else None)
        val w = lags.indices.map(k => math.pow(0.5, k))
        val want = lags.zip(w).map { case (v, wt) => v * wt }.sum / w.sum
        assert(math.abs(ewma - want) < 1e-9, s"row $i ewma $ewma vs $want")
      }
    }
  }

  test("cur_curriculum: 4 phases partition the corpus, quality bands " +
      "ordered and ~quartile-sized") {
    val rows = Curation.curriculum(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3, 4))
    val nDocs = t(spark, dir, "documents").count()
    assert(rows.map(_._2).sum == nDocs, "phases partition the corpus")
    rows.foreach { case (_, n, _, lo, hi, avg) =>
      assert(lo <= avg + 1e-6 && avg <= hi + 1e-6, "avg within band")
      // exact quartiles with ties can imbalance, but not pathologically
      assert(n > nDocs / 10, s"phase size $n")
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._5 <= b._4 + 1e-9,
        s"phase ${a._1} max ${a._5} <= phase ${b._1} min ${b._4}")
    }
  }

  test("cur_keep_best: winner is the max-quality member of a >1 cluster") {
    val kept = Curation.keepBestPerCluster(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4)))
    assert(kept.nonEmpty, "synthetic corpus has near-dup clusters")
    val clusters = Curation.dedupClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val quality = TextAnalysis.textQuality(spark, dir)
      .select("doc_id", "quality").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val byCluster = clusters.groupBy(_._2)
    val multi = byCluster.filter(_._2.head._3 > 1)
    assert(kept.length == multi.size, "one row per multi-doc cluster")
    kept.foreach { case (cid, size, keptId, keptQ, dropped) =>
      val members = byCluster(cid).map(_._1)
      assert(members.length == size && dropped == size - 1)
      assert(members.contains(keptId))
      val best = members.map(m => (-quality(m), m)).min
      assert(keptId == best._2 && keptQ == -best._1,
        s"cluster $cid kept $keptId/$keptQ vs $best")
    }
  }

  test("dq_freshness: watermark constant, freshest type lags 0, " +
      "24h count bounded") {
    val rows = Profiling.dqFreshness(spark, dir).collect()
    assert(rows.nonEmpty)
    val asOf = rows.map(_.getAs[Timestamp]("as_of")).distinct
    assert(asOf.length == 1, "one corpus watermark")
    assert(rows.exists(_.getAs[Long]("lag_minutes") == 0L),
      "some type produced the max ts")
    rows.foreach { r =>
      assert(r.getAs[Long]("lag_minutes") >= 0L)
      assert(r.getAs[Long]("n_last_24h") <= r.getAs[Long]("n_events"))
      assert(r.getAs[Long]("n_last_24h") > 0L ||
        r.getAs[Long]("lag_minutes") > 24L * 60)
    }
  }

  test("cur_temperature_mix: tau<1 compresses shares toward uniform; " +
      "targets conserve the corpus scale") {
    val rows = Curation.temperatureMix(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getDouble(6)))
    assert(rows.length == 20, "one row per source")
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4, "raw shares sum to 1")
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-4, "temp shares sum to 1")
    rows.foreach { case (src, _, _, raw, temp, target, rf) =>
      // τ=0.7 moves every share toward uniform (1/20): big sources give
      // up share, small sources gain
      if (raw > 0.05 + 1e-6) assert(temp < raw, s"$src big source shrinks")
      if (raw < 0.05 - 1e-6) assert(temp > raw, s"$src small source grows")
      assert(math.abs(rf - target.toDouble / rows.find(_._1 == src).get._3)
        < 1e-3)
    }
    val totTokens = rows.map(_._3).sum
    val totTargets = rows.map(_._6).sum
    assert(totTargets <= totTokens && totTargets > totTokens * 995 / 1000,
      s"targets $totTargets ≈ corpus $totTokens")
  }

  test("ts_anomaly: flagged days recompute, median/MAD robust definitions") {
    val daily = t(spark, dir, "events")
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getDate(1), r.getLong(2)))
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val want = daily.groupBy(_._1).toSeq.flatMap { case (et, g) =>
      val med = median(g.map(_._3.toDouble).toSeq)
      val mad = median(g.map(x => math.abs(x._3 - med)).toSeq)
      g.toSeq.flatMap { case (_, day, c) =>
        val z = (c - med) / (1.4826 * mad)
        if (math.abs(z) > 2.0) Some((et, day.toString, c)) else None
      }
    }.toSet
    val got = EventAnalytics.tsAnomaly(spark, dir).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2))).toSet
    assert(got == want, s"got $got\nwant $want")
    assert(got.nonEmpty, "threshold 2.0 surfaces tail days on this corpus")
  }

  test("ev_cohort_value: cohorts partition events; week-0 cell exists " +
      "for every cohort") {
    val rows = EventAnalytics.evCohortValue(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val totalEvents = t(spark, dir, "events").count()
    assert(rows.map(_._4).sum == totalEvents, "cells partition the fact")
    rows.groupBy(_._1).foreach { case (cw, g) =>
      assert(g.exists(_._2 == 0L), s"cohort $cw has its week-0 cell")
      assert(g.forall(_._2 >= 0L), "no negative week offsets")
    }
    rows.foreach { case (_, _, nUsers, nEvents, v) =>
      assert(nUsers <= nEvents && v >= 0.0)
    }
  }

  test("u6_cdc_apply: deletes erase, updates win, inserts land, " +
      "untouched base survives") {
    val base = t(spark, dir, "customer")
      .select("c_custkey", "c_acctbal").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = Relational.u6CdcApply(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getString(3))).toMap
    val dels = base.keySet.filter(_ % 17 == 0)
    val upds = base.keySet.filter(k => k % 13 == 0 && k % 17 != 0)
    val ins = base.keySet
      .filter(k => k % 19 == 0 && k % 17 != 0 && k % 13 != 0)
      .map(_ + 1000000L)
    assert(dels.forall(k => !got.contains(k)), "deleted keys erased")
    assert(upds.forall(k => got(k)._1 == base(k) + 100.0), "updates applied")
    assert(ins.forall(k => got.contains(k) && got(k)._2 == "MIGRATED"),
      "inserts landed")
    val untouched = base.keySet -- dels -- upds
    assert(untouched.forall(k => got(k)._1 == base(k)), "base survives")
    assert(got.size == base.size - dels.size + ins.size, "row accounting")
  }

  test("dq_referential: consistent corpus reports zero orphans, " +
      "child counts tie out") {
    val rows = Profiling.dqReferential(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 3)
    assert(rows.forall(_._3 == 0L), s"no orphans in the fixture: $rows")
    val counts = Map(
      "lineitem.l_orderkey -> orders" -> t(spark, dir, "lineitem").count(),
      "orders.o_custkey -> customer" -> t(spark, dir, "orders").count(),
      "customer.c_nationkey -> nation" -> t(spark, dir, "customer").count())
    rows.foreach { case (rel, nChild, _) =>
      assert(nChild == counts(rel), s"$rel child count")
    }
  }

  test("st12 streaming user-profile upsert: final state == batch twin") {
    import graft.streaming.EventConsumer
    val stage = java.nio.file.Files.createTempDirectory("graft_prof").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$stage/events.parquet"))
    val q = EventConsumer.streamingUserProfile(spark, stage).toDF.writeStream
      .outputMode("update").format("memory").queryName("st12_profiles")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.processAllAvailable()
      // update mode re-emits a user's row each batch it changes in; one
      // staged file → one batch → exactly one emission per user (the
      // count equality guards that assumption loudly)
      val streamed = spark.table("st12_profiles")
      val batch = EventConsumer.batchUserProfile(spark, dir)
      assert(streamed.count() == batch.count(),
        "single-batch replay: one profile emission per user")
      assert(streamed.exceptAll(batch).count() == 0,
        "every final profile matches the batch twin")
    } finally q.stop()
  }
}
