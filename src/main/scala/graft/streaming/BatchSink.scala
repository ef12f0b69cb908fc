package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Idempotent micro-batch parquet sink (`foreachBatch`). After a failure
  * or restart, Structured Streaming MAY replay the last uncommitted
  * micro-batch — a plain append sink then duplicates its rows. This sink
  * lands each batch at `out/batch_id=<id>` in overwrite mode, so a replay
  * rewrites the same path instead of appending: effectively-once parquet
  * output without a transactional table format (the same batch-id-keyed
  * idempotence Delta/Iceberg implement with commit metadata).
  *
  * Readers treat `out` as a partitioned table; `batch_id` is just the
  * partition column and drops out of queries that don't select it. At
  * scale each micro-batch directory is written by the batch's own tasks
  * in parallel — no single-writer bottleneck; compaction of many small
  * batch dirs is the usual follow-up job (Sources.s5CsvSink-style
  * coalesce, or a scheduled rewrite).
  */
object BatchSink {

  /** The per-batch landing logic, exposed so tests (and a recovery tool)
    * can invoke exactly what the stream runs — calling it twice with the
    * same id must be a no-op in aggregate.
    */
  def landBatch(batch: Dataset[Row], id: Long, outDir: String): Unit =
    batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$id")

  def start(df: DataFrame, outDir: String, checkpoint: String): StreamingQuery =
    df.writeStream
      .foreachBatch((batch: Dataset[Row], id: Long) =>
        landBatch(batch, id, outDir))
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Batch ids the stream has COMMITTED, from the checkpoint's commit
    * log (`<checkpoint>/commits/<id>` — Structured Streaming writes the
    * commit marker only AFTER foreachBatch returns). Hadoop FileSystem
    * API, so the manifest reads the same on HDFS/S3 as on local disk.
    * foreachBatch commits are sequential and gap-free, so the committed
    * set is exactly 0..max.
    */
  def committedBatchIds(spark: SparkSession, checkpoint: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(s"$checkpoint/commits")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.matches("\\d+")).map(_.toLong).sorted
  }

  /** The READ-side half of the exactly-once contract: scan `outDir` but
    * admit only batch_id partitions the checkpoint manifest has
    * committed. A crash can leave an IN-FLIGHT batch directory whose
    * commit marker never landed (foreachBatch data files exist, commit
    * file doesn't); a plain `read.parquet(outDir)` would count those
    * rows once now and AGAIN after the restart rewrites the same
    * batch_id — this reader never sees them until the rewrite commits.
    *
    * Scale shape: the filter is on the PARTITION column, so it prunes
    * whole batch directories at planning time (PartitionFilters — data
    * files of uncommitted dirs are never opened), and the manifest read
    * is one directory listing, O(batches). No committed batches →
    * empty frame.
    */
  def readCommitted(spark: SparkSession, outDir: String,
      checkpoint: String): DataFrame = {
    val ids = committedBatchIds(spark, checkpoint)
    if (ids.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(outDir).filter(col("batch_id") <= ids.max)
  }
}
