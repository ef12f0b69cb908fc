package graft.operators

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.functions.TextFunctions._

/** Corpus-curation operators a training-data pipeline runs AFTER the dedup
  * sketches exist: duplicate-cluster assignment, deterministic stratified
  * sampling, and benchmark decontamination.
  *
  * Scale design:
  *  - CLUSTERS is hash-min label propagation over the LSH pair set — each
  *    iteration is one O(E) shuffle join plus an O(components) aggregate;
  *    it converges in O(graph diameter) rounds. The pair set comes from
  *    [[Dedup.minhashPairs]], whose hot-bucket anchor-star guard already
  *    collapses giant clusters into stars (diameter 2), so the diameter is
  *    bounded by the CHAIN length of genuine near-dup overlaps, not by
  *    cluster size — planted 10k-copy clusters still converge in ~2 rounds.
  *  - SAMPLE is pure map-side: a per-row digest decides membership, so the
  *    sample is deterministic across re-runs, backfills, and engines — no
  *    RNG state, no seed-per-partition coupling, nothing to coordinate at
  *    1000 executors.
  *  - DECONTAMINATE joins train-side shingles against the DISTINCT shingle
  *    set of the eval source. Eval/benchmark sets are tiny next to a
  *    100 TB train corpus, so the eval side broadcasts and the join stays
  *    shuffle-free on the train side.
  */
object Curation {

  /** Session-memoized converged cluster labels per (session, corpus) —
    * the propagation loop runs driver-side actions, so its result is
    * materialized once and reread by every consumer (same lifecycle as
    * Dedup's signature index; released via [[graft.GraftSession.release]]).
    */
  private val clusterCache = TrieMap.empty[(String, String), DataFrame]

  private[graft] def release(spark: SparkSession, dir: Option[String]): Unit = {
    val sid = graft.GraftSession.sessionId(spark)
    clusterCache.keys.toSeq
      .filter { case (s, d) => s == sid && dir.forall(_ == d) }
      .foreach(clusterCache.remove(_).foreach(freeCheckpoint))
  }

  /** Unpersist a localCheckpoint-backed frame's storage: the blocks live
    * on the checkpoint RDD inside the LogicalRDD leaf, not in the SQL
    * cache manager, so DataFrame.unpersist alone leaves them pinned
    * until GC.
    */
  private def freeCheckpoint(df: DataFrame): Unit = {
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = true)
    }
    df.unpersist(blocking = true)
  }

  /** Converged (doc_id, cluster_id) labels: every document labeled with the
    * minimum doc_id reachable through the near-dup pair graph
    * (singletons keep their own id). Hash-min propagation to fixpoint; the
    * per-iteration convergence check is a count on the persisted join
    * frame, not a second pass over the graph.
    */
  private def clusterLabels(spark: SparkSession, dir: String,
      maxIter: Int = 20): DataFrame =
    clusterCache.getOrElseUpdate(
        (graft.GraftSession.sessionId(spark), dir), {
      val pairs = Dedup.dedupMinhashLsh(spark, dir).select(col("da"), col("db"))
      // The loop runs over PAIR-GRAPH NODES only — docs that appear in at
      // least one near-dup pair. Singletons (the overwhelming majority of
      // any corpus) never change labels, so keeping them out of the
      // iteration shrinks every per-round frame from O(corpus) to
      // O(near-dup docs); they rejoin once at the end via a left join.
      // LINEAGE TRUNCATION: every iteration ends in localCheckpoint, which
      // materializes the frame AND replaces its logical plan with a flat
      // LogicalRDD. Without it each round's plan NESTS the previous
      // round's (InMemoryRelation embeds the full child plan), and
      // analysis/canonicalization of that tower comes to dominate — the
      // measured loop went 3-4× slower on pure driver-side planning. On a
      // cluster the same role is played by reliable checkpointing; the
      // blocks are freed by the ContextCleaner when the memo is released.
      val scratch = scala.collection.mutable.Buffer.empty[DataFrame]
      def ckpt(df: DataFrame): DataFrame = {
        val c = df.localCheckpoint(); scratch += c; c
      }
      val edges = ckpt(pairs.select(col("da").as("src"), col("db").as("dst"))
        .union(pairs.select(col("db").as("src"), col("da").as("dst"))))
      var labels = ckpt(edges.select(col("src").as("node")).distinct()
        .select(col("node"), col("node").as("lbl")))
      var iter = 0
      var converged = false
      while (!converged && iter < maxIter) {
        val nbrMin = edges.join(labels, col("src") === col("node"))
          .groupBy(col("dst")).agg(min(col("lbl")).as("nbr_min"))
        val joined = ckpt(labels.join(nbrMin, labels("node") === nbrMin("dst"))
          .select(labels("node"), col("lbl"),
            least(col("lbl"), col("nbr_min")).as("nxt")))
        val changed = joined.filter(col("nxt") < col("lbl")).count()
        labels = joined.select(col("node"), col("nxt").as("lbl"))
        converged = changed == 0
        iter += 1
      }
      require(converged,
        s"cluster propagation did not converge in $maxIter iterations — " +
          "pair graph diameter exceeds the bound; raise maxIter")
      // Every node in an edge has a neighbor, so the inner join above never
      // drops nodes; singletons get their own id back here.
      val memo = t(spark, dir, "documents").select(col("doc_id"))
        .join(labels, col("doc_id") === col("node"), "left")
        .select(col("doc_id"),
          coalesce(col("lbl"), col("doc_id")).as("cluster_id"))
        .localCheckpoint() // eager: safe to drop the scratch frames now
      scratch.foreach(freeCheckpoint)
      memo
    })

  /** Duplicate clustering: (doc_id, cluster_id, cluster_size) for every
    * document, cluster_id = min doc_id of its connected near-dup component
    * (ref: the reference dedups row-wise with pandas drop_duplicates —
    * dags/projectde_dag.py's clean step; component-level identity is the
    * corpus-scale generalization).
    */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val labels = clusterLabels(spark, dir)
    // sizes is O(components) ≈ O(docs) — mostly singletons — so it is NOT
    // broadcastable at corpus scale; both sides shuffle on cluster_id.
    val sizes = labels.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
  }

  /** The stratum membership predicate: first byte of md5(doc_id) under the
    * per-language rate — 128/256 for English, 64/256 otherwise.
    */
  private def sampleKeep: org.apache.spark.sql.Column = {
    val hv = conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
      .cast("int")
    hv < when(col("lang") === "en", 128).otherwise(64)
  }

  /** Deterministic stratified sample: keep a doc iff the first byte of
    * md5(doc_id) falls under its stratum's rate — 50% for English, 25%
    * for every other language. Content-addressed membership: the same doc
    * is in or out on every engine, every re-run, every backfill.
    */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .filter(sampleKeep)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))

  /** Benchmark decontamination: flag training documents (source <> the
    * eval source) whose distinct-3-gram overlap with the ENTIRE eval
    * source's shingle set is ≥ τ. Returns (doc_id, n_shared, overlap) —
    * the removal list a pipeline anti-joins against.
    */
  def decontaminate(spark: SparkSession, dir: String,
      evalSource: String = "src0", tau: Double = 0.8): DataFrame = {
    graft.plans.GraftFunctions.register(spark)
    val sh = t(spark, dir, "documents")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("source"), tokens(col("text")).as("w"))
      .select(col("doc_id"), col("source"),
        explode(call_function("graft_shingles3", col("w"))).as("s"))
    val evalShingles = sh.filter(col("source") === evalSource)
      .select(col("s")).distinct()
    val train = sh.filter(col("source") =!= evalSource)
      .select(col("doc_id"), col("s"))
    // per-doc totals are O(train docs) — shuffled join, not broadcast; the
    // hit side after the eval filter is tiny so AQE localizes it anyway
    val counts = train.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    train.join(broadcast(evalShingles), "s")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      .join(counts, "doc_id")
      .withColumn("overlap",
        round(col("n_shared").cast("double") / col("n_sh"), 6))
      .filter(col("n_shared").cast("double") / col("n_sh") >= tau)
      .select(col("doc_id"), col("n_shared"), col("overlap"))
  }

  /** The full training-data prep pipeline — what the operator families
    * compose into at 100 TB: exclude the eval source, keep docs above the
    * quality floor, drop benchmark-contaminated docs, keep exactly one
    * representative per near-dup cluster (the min doc_id), then take the
    * deterministic stratified sample. Every stage is one of this module's
    * oracle-checked operators; cluster labels come from the session memo,
    * contamination and quality are computed over the FULL corpus (as their
    * standalone operators do), and all the row-level predicates are
    * map-side.
    */
  def corpusCurate(spark: SparkSession, dir: String,
      evalSource: String = "src0", minQuality: Double = 0.7): DataFrame = {
    val quality = TextAnalysis.textQuality(spark, dir)
      .select(col("doc_id"), col("quality"))
    val reps = clusterLabels(spark, dir)
      .filter(col("doc_id") === col("cluster_id"))
      .select(col("doc_id"))
    val contaminated = decontaminate(spark, dir, evalSource)
      .select(col("doc_id"))
    t(spark, dir, "documents")
      .filter(col("source") =!= evalSource)
      .filter(sampleKeep)
      .join(quality, "doc_id")
      .filter(col("quality") >= minQuality)
      .join(contaminated, Seq("doc_id"), "left_anti")
      .join(reps, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("lang"), col("source"), col("quality"))
  }

  /** Deterministic shard id from md5 hex chars 3–4 (independent of the
    * sampling window, chars 1–2): the export layout is content-addressed,
    * so re-running the export on any engine or partitioning lands every
    * doc in the same shard file.
    */
  private def shardOf(nShards: Int): org.apache.spark.sql.Column =
    (conv(substring(md5(col("doc_id").cast("string")), 3, 2), 16, 10)
      .cast("int") % nShards).as("shard")

  /** Curated corpus with its export shard assignment — what the writer
    * partitions by (see graft.Main --curate).
    */
  def curatedShards(spark: SparkSession, dir: String,
      nShards: Int = 8): DataFrame =
    corpusCurate(spark, dir).withColumn("shard", shardOf(nShards))

  /** The export plan: per-shard doc counts and byte totals over the
    * CURATED corpus — the balance check run before a training export.
    */
  def shardPlan(spark: SparkSession, dir: String,
      nShards: Int = 8): DataFrame =
    curatedShards(spark, dir, nShards)
      .join(t(spark, dir, "documents").select(col("doc_id"), col("n_chars")),
        "doc_id")
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_bytes"))

  /** Top-k quality docs per source via the native TopKPerKey operator —
    * the custom plan stack (marker → rewrite → bounded-heap exec, no sort,
    * no window) doing real work inside the curation family.
    */
  def topQualityPerSource(spark: SparkSession, dir: String,
      k: Int = 5): DataFrame = {
    graft.plans.GraftFunctions.register(spark)
    t(spark, dir, "documents").select(col("doc_id"), col("source"))
      .join(TextAnalysis.textQuality(spark, dir)
        .select(col("doc_id"), col("quality")), "doc_id")
      .filter(call_function("graft_topk", lit(k),
        col("quality"), col("doc_id"), col("source")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cur_top_quality" -> ((s, d) => topQualityPerSource(s, d)),
    "cur_shard_plan" -> ((s, d) => shardPlan(s, d)),
    "cur_dedup_clusters" -> ((s, d) => dedupClusters(s, d)),
    "cur_sample_stratified" -> ((s, d) => sampleStratified(s, d)),
    "cur_decontaminate" -> ((s, d) => decontaminate(s, d)),
    "cur_corpus_curate" -> ((s, d) => corpusCurate(s, d)),
  )

  /** The curation funnel as DuckDB CTEs ending in `curated(doc_id, lang,
    * source, quality)` — shared by the curate and shard-plan oracles.
    */
  private val curateCtes = s"""${Dedup.minhashPairsCte},
      edges AS (SELECT da AS src, db AS dst FROM pairs
                UNION SELECT db, da FROM pairs),
      walk(node, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node),
      labels AS (SELECT node AS doc_id, min(label) AS cluster_id
                 FROM walk GROUP BY node),
      ${CorpusPipeline.qualityCte},
      evs AS (SELECT DISTINCT s.s FROM sh s JOIN documents d
                ON s.doc_id = d.doc_id WHERE d.source = 'src0'),
      tr AS (SELECT s.doc_id, s.s FROM sh s JOIN documents d
               ON s.doc_id = d.doc_id WHERE d.source <> 'src0'),
      cnt AS (SELECT doc_id, count(*) AS n_sh FROM tr GROUP BY 1),
      hit AS (SELECT t.doc_id, count(*) AS n_shared
              FROM tr t JOIN evs e ON t.s = e.s GROUP BY 1),
      contaminated AS (SELECT h.doc_id FROM hit h JOIN cnt c
                         ON h.doc_id = c.doc_id
                       WHERE CAST(h.n_shared AS DOUBLE) / c.n_sh >= 0.8),
      curated AS (
        SELECT d.doc_id, d.lang, d.source, q.quality
        FROM documents d
        JOIN qual q ON d.doc_id = q.doc_id
        JOIN labels l ON d.doc_id = l.doc_id
        WHERE d.source <> 'src0'
          AND (strpos('0123456789abcdef',
                 substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 1)) - 1) * 16
            + (strpos('0123456789abcdef',
                 substr(md5(CAST(d.doc_id AS VARCHAR)), 2, 1)) - 1)
            < CASE WHEN d.lang = 'en' THEN 128 ELSE 64 END
          AND q.quality >= 0.7
          AND l.cluster_id = d.doc_id
          AND NOT EXISTS (SELECT 1 FROM contaminated c
                          WHERE c.doc_id = d.doc_id))"""

  val oracle: Map[String, String] = Map(
    "cur_top_quality" -> s"""
      WITH ${CorpusPipeline.qualityCte}
      SELECT doc_id, source, quality FROM (
        SELECT d.doc_id, d.source, q.quality,
          row_number() OVER (PARTITION BY d.source
            ORDER BY q.quality DESC, d.doc_id ASC) AS rn
        FROM documents d JOIN qual q ON d.doc_id = q.doc_id)
      WHERE rn <= 5""",
    "cur_shard_plan" -> s"""
      WITH RECURSIVE $curateCtes,
      assigned AS (
        SELECT c.doc_id,
          ((strpos('0123456789abcdef',
              substr(md5(CAST(c.doc_id AS VARCHAR)), 3, 1)) - 1) * 16
           + (strpos('0123456789abcdef',
              substr(md5(CAST(c.doc_id AS VARCHAR)), 4, 1)) - 1)) % 8
            AS shard
        FROM curated c)
      SELECT CAST(a.shard AS INT) AS shard,
             count(*) AS n_docs,
             CAST(sum(d.n_chars) AS BIGINT) AS n_bytes
      FROM assigned a JOIN documents d ON a.doc_id = d.doc_id
      GROUP BY 1""",
    "cur_dedup_clusters" -> s"""
      WITH RECURSIVE ${Dedup.minhashPairsCte},
      edges AS (SELECT da AS src, db AS dst FROM pairs
                UNION SELECT db, da FROM pairs),
      walk(node, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node)
      SELECT node AS doc_id, CAST(min(label) AS BIGINT) AS cluster_id,
             CAST(count(*) OVER (PARTITION BY min(label)) AS BIGINT)
               AS cluster_size
      FROM walk GROUP BY node""",
    "cur_sample_stratified" -> """
      SELECT doc_id, lang, source, n_chars FROM documents
      WHERE (strpos('0123456789abcdef',
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
          + (strpos('0123456789abcdef',
               substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
          < CASE WHEN lang = 'en' THEN 128 ELSE 64 END""",
    "cur_corpus_curate" -> s"""
      WITH RECURSIVE $curateCtes
      SELECT doc_id, lang, source, quality FROM curated""",
    "cur_decontaminate" -> """
      WITH tok AS (SELECT doc_id, source, string_split(text, ' ') AS w
                   FROM documents),
      shn AS (SELECT doc_id, source,
                CASE WHEN len(w) >= 3
                  THEN list_transform(generate_series(1, len(w) - 2),
                         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                  ELSE [] END AS sh
              FROM tok),
      sh AS (SELECT DISTINCT doc_id, source, unnest(sh) AS s FROM shn),
      evs AS (SELECT DISTINCT s FROM sh WHERE source = 'src0'),
      tr  AS (SELECT doc_id, s FROM sh WHERE source <> 'src0'),
      cnt AS (SELECT doc_id, count(*) AS n_sh FROM tr GROUP BY 1),
      hit AS (SELECT t.doc_id, count(*) AS n_shared
              FROM tr t JOIN evs e ON t.s = e.s GROUP BY 1)
      SELECT h.doc_id, CAST(h.n_shared AS BIGINT) AS n_shared,
             round(CAST(h.n_shared AS DOUBLE) / c.n_sh, 6) AS overlap
      FROM hit h JOIN cnt c ON h.doc_id = c.doc_id
      WHERE CAST(h.n_shared AS DOUBLE) / c.n_sh >= 0.8""",
  )
}
