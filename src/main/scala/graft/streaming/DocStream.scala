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

  case class DocEvent(doc_id: Long, text: String, event_ts: java.sql.Timestamp)

  /** Event-time TTL flavor — the production semantics for an unbounded
    * feed: a digest's state drops when the WATERMARK passes its last-seen
    * event time + TTL, so expiry follows the data's own clock (replays,
    * backfills, and lagging partitions all age state identically), not
    * the wall clock of whichever executor happens to run the batch.
    *
    * Two expiry paths cover the engine's timeout contract:
    *  - no new data for the digest → EventTimeTimeout fires once the
    *    watermark passes the registered timestamp → state removed;
    *  - new data arrives in the SAME batch the digest expires (the engine
    *    only fires timeouts for groups with no data) → the data path
    *    checks `last_seen + ttl ≤ watermark` itself and re-admits.
    * Both paths give exact event-time TTL semantics; a duplicate arriving
    * within the TTL refreshes last-seen and is suppressed.
    *
    * State stays one 40-byte (digest, last-seen) entry per distinct doc
    * inside the TTL horizon; the watermark bounds it at scale exactly as
    * the processing-time flavor's TTL does, minus the wall-clock skew.
    */
  def dedupStreamEventTtl(docs: Dataset[DocEvent], ttlMs: Long,
      watermarkDelay: String = "10 seconds"): Dataset[FirstSeen] = {
    import docs.sparkSession.implicits._
    docs
      .withWatermark("event_ts", watermarkDelay)
      .select(col("doc_id"), md5(col("text")).as("text_md5"), col("event_ts"))
      .as[(Long, String, java.sql.Timestamp)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, FirstSeen](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (digest: String, rows: Iterator[(Long, String, java.sql.Timestamp)],
         state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val wm = state.getCurrentWatermarkMs()
            val rs = rows.toSeq
            val maxTs = rs.iterator.map(_._3.getTime).max
            val expired = state.exists && state.get + ttlMs <= wm
            if (state.exists && !expired) {
              // duplicate inside the TTL: refresh last-seen, stay quiet
              state.update(math.max(state.get, maxTs))
              state.setTimeoutTimestamp(math.max(state.get + ttlMs, wm + 1))
              Iterator.empty
            } else {
              if (expired) state.remove()
              state.update(maxTs)
              state.setTimeoutTimestamp(math.max(maxTs + ttlMs, wm + 1))
              Iterator.single(FirstSeen(digest, rs.iterator.map(_._1).min))
            }
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
