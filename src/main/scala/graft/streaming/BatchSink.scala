package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
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
}
