package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Document-ingest streaming: stateful exact dedup — the streaming twin of
  * [[graft.operators.Dedup.dedupExact]], for the pipeline that ingests a
  * document FEED rather than a landed corpus.
  *
  * Scale shape: state is keyed by the md5 digest (32 bytes/entry, never
  * the document body), so the state store holds one marker per DISTINCT
  * document ever seen inside the TTL window. A processing-time TTL bounds
  * state growth — the standard streaming-dedup trade-off: a duplicate
  * arriving after the TTL re-emits. Within a micro-batch the minimum
  * doc_id wins, so replaying the same feed gives identical output.
  */
object DocStream {

  case class DocIn(doc_id: Long, text: String)
  case class FirstSeen(text_md5: String, doc_id: Long)

  /** Batch twin (and the driver's oracle surface): first doc_id per
    * distinct text — exactly what the stream emits when fed in doc_id
    * order (ref spark-project.py's groupBy aggregations; the reference
    * declares the Kafka feed this operator would consume).
    */
  def batchFirstSeen(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.t(spark, dir, "documents")
      .select(md5(col("text")).as("text_md5"), col("doc_id"))
      .groupBy(col("text_md5"))
      .agg(min(col("doc_id")).as("doc_id"))

  /** Streaming flavor: emit the first arrival per digest, drop the rest.
    * The digest is computed by the engine's own md5 Column (bit-identical
    * to the batch twin); state is a presence marker.
    *
    * `stateTtl = Some(duration)` switches on processing-time state expiry
    * — the production configuration for an unbounded feed, where a
    * duplicate arriving after the TTL re-emits (the standard trade-off
    * that bounds the store to one 32-byte digest per distinct doc seen
    * inside the window). With a TTL the engine self-triggers batches to
    * fire timeouts, so tests (and any finite replay) use the default
    * NoTimeout and bound state by the corpus' distinct count instead.
    */
  def dedupStream(docs: Dataset[DocIn],
      stateTtl: Option[String] = None): Dataset[FirstSeen] = {
    import docs.sparkSession.implicits._
    val timeoutConf = if (stateTtl.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    docs
      .select(col("doc_id"), md5(col("text")).as("text_md5"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Boolean, FirstSeen](
        OutputMode.Append, timeoutConf) {
        (digest: String, rows: Iterator[(Long, String)],
         state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            // seen inside the TTL → everything in this batch is a dup
            stateTtl.foreach(state.setTimeoutDuration)
            Iterator.empty
          } else {
            state.update(true)
            stateTtl.foreach(state.setTimeoutDuration)
            Iterator.single(FirstSeen(digest, rows.map(_._1).min))
          }
      }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st5_stream_dedup" -> (batchFirstSeen _),
  )

  val oracle: Map[String, String] = Map(
    "st5_stream_dedup" -> """
      SELECT md5(text) AS text_md5, CAST(min(doc_id) AS BIGINT) AS doc_id
      FROM documents GROUP BY 1""",
  )
}
