package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.Tables.t

/** Round-7 batch 2: normalization, chunking, span dedup, embedding
  * normalize/quantize, fuzzy match, mode/median, value windows,
  * ORC/partitioned layouts, sliding + session windows.
  */
class Round7bSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("text normalize: output is idempotent and genuinely dirty on input") {
    val out = TextAnalysis.textNormalize(spark, dir).cache()
    try {
      // injection produced work to do on most docs
      assert(out.filter(col("changed")).count() > 0)
      // norm_text is a fixpoint: lower+trim+collapse changes nothing more
      assert(out.filter(
        lower(trim(regexp_replace(col("norm_text"), " +", " ")))
          =!= col("norm_text")).isEmpty)
      // no doubled spaces or edge whitespace survive
      assert(out.filter(col("norm_text").contains("  ")).isEmpty)
      assert(out.filter(col("norm_text").rlike("^ | $")).isEmpty)
    } finally out.unpersist()
  }

  test("text chunk: no token loss, bounded size, correct overlap") {
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
    val chunks = TextAnalysis.textChunk(spark, dir).cache()
    try {
      // every chunk is at most chunkSize tokens
      assert(chunks.filter(col("chunk_tokens") > 32).isEmpty)
      // stride-24 cover: Σ chunk_tokens per doc = n + 8·(chunks whose
      // predecessor ran the full 32) — simpler exact check: the LAST
      // token of the doc appears at the end of the LAST chunk
      val last = chunks.groupBy("doc_id")
        .agg(max(struct(col("chunk_id"), col("chunk_text"))).as("m"))
        .select(col("doc_id"), col("m.chunk_text").as("tail_chunk"))
      val joined = docs.join(last, "doc_id")
        .join(t(spark, dir, "documents"), "doc_id")
        .filter(!expr("text").endsWith(col("tail_chunk")))
      assert(joined.isEmpty)
      // chunk count = ceil(n / 24) (starts at 1, 25, ... ≤ n)
      val badCount = chunks.groupBy("doc_id").agg(count(lit(1)).as("c"))
        .join(docs, "doc_id")
        .filter(col("c") =!= ceil(col("n") / 24.0).cast("long"))
      assert(badCount.isEmpty)
    } finally chunks.unpersist()
  }

  test("span dedup: planted cross-doc duplicate span is flagged") {
    import spark.implicits._
    // two docs sharing their first 16 tokens, one disjoint doc
    val shared = (1 to 16).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, s"$shared alpha beta gamma delta"),
      (2L, s"$shared epsilon zeta eta theta"),
      (3L, (1 to 20).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_span").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // the other tables aren't read by dedupSpan; only documents matters
    val out = Dedup.dedupSpan(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L)._2 == 1L, "doc 1 shares exactly its first span")
    assert(out(2L)._2 == 1L)
    assert(out(3L)._2 == 0L)
    assert(out(1L)._1 == 2L, "20 tokens -> spans at 1 and 17")
  }

  test("l2 normalize: unit vectors have norm 1") {
    val out = Similarity.simL2Normalize(spark, dir)
      .groupBy("vec_id")
      .agg(sum(col("unit_val") * col("unit_val")).as("sq"))
      .filter(abs(col("sq") - 1.0) > 1e-4)
    assert(out.isEmpty)
  }

  test("quantize int8: codes within [0,255] bounds imply rms error ≤ scale/2") {
    val emb = t(spark, dir, "embeddings")
      .withColumn("mn", array_min(col("embedding")).cast("double"))
      .withColumn("mx", array_max(col("embedding")).cast("double"))
      .select(col("vec_id"), ((col("mx") - col("mn")) / 255.0).as("scale"))
    val out = Similarity.simQuantizeInt8(spark, dir).join(emb, "vec_id")
    // per-dim rounding error ≤ scale/2 ⇒ RMS over dims ≤ scale/2
    assert(out.filter(col("dq_err") > col("scale") / 2 + 1e-12).isEmpty)
    // q_sum within [0, 255·64]
    assert(out.filter(col("q_sum") < 0 || col("q_sum") > 255L * 64).isEmpty)
  }

  test("fuzzy match: dropping one char still resolves to the source name") {
    val out = Relational.j8FuzzyMatch(spark, dir)
    // each probe came from a name by deleting 1 char -> best dist ≤ 1
    assert(out.filter(col("dist") > 1).isEmpty)
    assert(out.count() == 25)
  }

  test("mode/median: spot-check against direct computation") {
    val ord = t(spark, dir, "orders")
    val out = Relational.a16ModeMedian(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val statuses = ord.select("o_orderstatus").distinct().collect()
      .map(_.getString(0))
    assert(out.keySet == statuses.toSet)
    // mode count really is the max count for that status
    statuses.foreach { st =>
      val counts = ord.filter(col("o_orderstatus") === st)
        .groupBy("o_orderpriority").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val m = out(st)
      assert(m.getAs[Long]("mode_n") == counts.values.max)
      assert(counts(m.getAs[String]("mode_priority")) == counts.values.max)
    }
  }

  test("value windows: top/bottom/second match per-nation order stats") {
    val out = Relational.o9ValueWindows(spark, dir).cache()
    try {
      val perNation = t(spark, dir, "customer")
        .groupBy("c_nationkey")
        .agg(max(col("c_acctbal")).as("mx"), min(col("c_acctbal")).as("mn"))
      assert(out.join(perNation, "c_nationkey")
        .filter(col("top_bal") =!= col("mx") || col("bottom_bal") =!= col("mn"))
        .isEmpty)
      // second_bal ≤ top_bal everywhere it exists
      assert(out.filter(col("second_bal") > col("top_bal")).isEmpty)
    } finally out.unpersist()
  }

  test("partitioned scan: plan prunes to the filtered partition") {
    val df = graft.sources.Sources.s14PartitionedScan(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // partition filter on event_type must reach the scan (pruned listing)
    assert(plan.contains("PartitionFilters") &&
      plan.contains("event_type"), s"no partition pruning in plan:\n$plan")
    assert(df.count() == 1)
  }

  test("orc roundtrip: format survives with schema intact") {
    val df = graft.sources.Sources.s13OrcRoundtrip(spark, dir)
    assert(df.schema.fieldNames.toSeq ==
      Seq("doc_id", "lang", "source", "n_chars"))
    assert(df.count() == t(spark, dir, "documents").count())
  }

  test("sliding window: every event lands in exactly two windows") {
    val nEvents = graft.Tables.t(spark, dir, "events").count()
    val agg = graft.streaming.EventConsumer.batchSlidingWindow(spark, dir)
      .agg(sum("n_events")).collect()(0).getLong(0)
    assert(agg == 2 * nEvents)
  }

  test("malformed csv: exactly the parseable rows survive DROPMALFORMED") {
    val out = graft.sources.Sources.s16MalformedCsv(spark, dir).collect()
    assert(out.map(_.getInt(0)).sorted.toSeq == Seq(1, 3, 5))
    assert(out.find(_.getInt(0) == 3).get.isNullAt(1),
      "null field is data, not malformation")
  }

  test("audio stats: waveform round-trips the byte boundary intact") {
    val out = Multimodal.mmAudioStats(spark, dir).cache()
    try {
      // sample values are in [-1024, 1023] by construction -> |peak| ≤ 1024
      assert(out.filter(col("peak") > 1024).isEmpty)
      assert(out.filter(col("n_samples") < 256 || col("n_samples") > 511)
        .isEmpty)
      // rms of a ~uniform(-1024,1024) signal sits well inside (0, 1024)
      assert(out.filter(col("rms") <= 0 || col("rms") >= 1024).isEmpty)
      assert(out.count() == t(spark, dir, "documents").count())
    } finally out.unpersist()
  }

  test("compaction: merges the small files, keeps every row") {
    val frag = java.nio.file.Files.createTempDirectory("spec_frag").toString
    val out = java.nio.file.Files.createTempDirectory("spec_compact").toString
    val orders = t(spark, dir, "orders")
    orders.repartition(16).write.mode("overwrite").parquet(frag)
    graft.sources.Sources.compactParquet(spark, frag, out, targetFiles = 2)
    def parts(d: String) = new java.io.File(d).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parts(frag) == 16)
    assert(parts(out) <= 2)
    assert(spark.read.parquet(out).count() == orders.count())
  }

  test("transitions: counts descending, pairs from the event-type domain") {
    val types = t(spark, dir, "events").select("event_type")
      .distinct().collect().map(_.getString(0)).toSet
    val out = EventAnalytics.evTransitions(spark, dir).collect()
    assert(out.nonEmpty && out.length <= 20)
    val ns = out.map(_.getLong(2)).toSeq
    assert(ns == ns.sorted.reverse)
    assert(out.forall(r => types(r.getString(0)) && types(r.getString(1))))
  }

  test("anomaly report: exactly the rows above the z threshold") {
    val out = Profiling.dqAnomaly(spark, dir).cache()
    try {
      assert(out.filter(col("zscore") <= 1.6).isEmpty)
      // independent recount of one group
      val ord = t(spark, dir, "orders")
      val st = ord.groupBy("o_orderpriority")
        .agg(avg("o_totalprice").as("mu"), stddev_pop("o_totalprice").as("sd"))
      val expected = ord.join(st, "o_orderpriority")
        .filter((col("o_totalprice") - col("mu")) / col("sd") > 1.6).count()
      assert(out.count() == expected)
    } finally out.unpersist()
  }

  test("fuzzy verify: a subset of the LSH pairs, sims in range") {
    val out = Dedup.dedupFuzzyVerify(spark, dir).cache()
    try {
      assert(out.filter(col("edit_sim") < 0.6 || col("edit_sim") > 1.0)
        .isEmpty)
      val lsh = Dedup.dedupMinhashLsh(spark, dir)
        .select("da", "db")
      assert(out.select("da", "db").exceptAll(lsh).isEmpty,
        "verification can only REMOVE candidates, never add")
    } finally out.unpersist()
  }

  test("data card: one row per source, doc counts reconcile") {
    val card = Curation.corpusDataCard(spark, dir).cache()
    try {
      val docs = t(spark, dir, "documents")
      assert(card.count() ==
        docs.select("source").distinct().count())
      assert(card.agg(sum("n_docs")).collect()(0).getLong(0) == docs.count())
      assert(card.filter(col("n_dup_docs") > col("n_docs")).isEmpty)
      assert(card.filter(col("avg_quality") < 0 || col("avg_quality") > 1)
        .isEmpty)
    } finally card.unpersist()
  }

  test("session window: built-in operator agrees with hand-rolled twin") {
    val builtin = graft.streaming.EventConsumer.batchSessionWindow(spark, dir)
    val handRolled = graft.streaming.EventConsumer.batchSessionize(spark, dir)
    // same number of sessions and same per-user totals (end-definition
    // differs by +gap; starts/counts/values must agree)
    assert(builtin.count() == handRolled.count())
    val a = builtin.groupBy("user_id")
      .agg(sum("n_events").as("n"), sum("total_value").as("v"))
    val b = handRolled.groupBy("user_id")
      .agg(sum("n_events").as("n"), sum("total_value").as("v"))
    assert(a.join(b, Seq("user_id"))
      .filter(a("n") =!= b("n") || abs(a("v") - b("v")) > 1e-9).isEmpty)
  }
}
