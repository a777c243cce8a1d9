package graft.stream

import graft.core.EntryPattern
import graft.engine.{BucketStore, QueryEngine, QuerySpec}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured-Streaming surfaces (SURVEY §2.6).
  *
  *  - ingest: a file-source stream of record batches appended to the
  *    bucket store (duplicate-ts conflicts dropped per micro-batch — the
  *    idempotent analog of the reference's 409s under replay);
  *  - continuous query: the reference's never-ending tail
  *    (storage/query/continuous.rs:16-84) as a readStream over the store
  *    with the same compiled `when` predicate — new files picked up per
  *    trigger ≈ re-arm from `last_ts + 1` (exactly-once from the source's
  *    file tracking, so no explicit re-arm bookkeeping is needed);
  *  - replication: per-write stream → filter (entry globs + strict `when`,
  *    replication/transaction_filter.rs:52-110) → `foreachBatch` into a
  *    destination store with `dst_prefix`, honoring
  *    enabled/paused/disabled modes (msg/replication_api.rs:38-66).
  */
object Streaming {

  /** Streaming ingest from a directory of record-schema parquet files. */
  def ingest(spark: SparkSession, sourceDir: String, store: BucketStore,
      checkpoint: String, trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream
      .schema(graft.core.Records.schema)
      .parquet(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        store.write(batch, BucketStore.Conflict.Skip)
      }
      .start()

  /** Continuous query: stream of records matching the spec as they arrive
    * in the store. The compiled condition applies per micro-batch; row
    * `when` semantics are identical to the batch path (same compiler). */
  def continuousQuery(store: BucketStore, spec: QuerySpec): DataFrame = {
    val stream = store.spark.readStream
      .schema(BucketStore.storedSchema)
      .option("basePath", store.root)
      .parquet(store.root)
      .drop("dt")
    QueryEngine.matching(stream, spec)
  }

  /** Event-time windowed per-entry stats with a watermark — the streaming
    * analog of the reference's `$system` usage aggregation
    * (syslog/aggregate): record counts + payload bytes per (entry,
    * window), tolerating `lateness` of belated writes before a window
    * finalizes.
    */
  def windowedStats(stream: DataFrame, windowDur: String = "1 hour",
      lateness: String = "10 minutes"): DataFrame =
    stream
      .withColumn("event_time", timestamp_micros(col("ts")))
      .withWatermark("event_time", lateness)
      .groupBy(window(col("event_time"), windowDur),
        col("bucket"), col("entry"))
      .agg(count(lit(1)).as("n_records"),
        sum(coalesce(length(col("payload")), lit(0))).as("payload_bytes"))

  sealed trait ReplicationMode
  object ReplicationMode {
    case object Enabled extends ReplicationMode
    case object Paused extends ReplicationMode
    case object Disabled extends ReplicationMode
  }

  /** Replication settings (reduct_base/src/msg/replication_api.rs:38-66).
    * `srcBucket` scopes the stream to one source bucket (the reference's
    * replications are per-bucket); None replicates the whole store. */
  final case class ReplicationSettings(
      entries: Option[Seq[String]] = None, // glob patterns incl. '!'
      when: Option[String] = None,         // strict condition
      srcBucket: Option[String] = None,
      dstBucket: String = "default",
      dstPrefix: String = "",
      mode: ReplicationMode = ReplicationMode.Enabled)

  /** Start a replication stream src → dst. Disabled → no-op (returns
    * None); Paused → the stream runs but batches are skipped (transaction
    * log keeps accumulating via the checkpoint, like the reference's
    * paused mode).
    *
    * Known limit: a *stateful* `when` ($each_n/$each_t/$gate) evaluates
    * per micro-batch here — counters reset at batch boundaries, whereas
    * the reference keeps them for the replication's lifetime. Wire
    * [[StatefulStream]] (state-store-backed) in front for exact
    * cross-batch semantics; pure conditions (the overwhelmingly common
    * replication filters) are exact as-is. */
  def replicate(src: BucketStore, dst: BucketStore,
      settings: ReplicationSettings, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): Option[StreamingQuery] = {
    if (settings.mode == ReplicationMode.Disabled) return None
    val stream0 = src.spark.readStream
      .schema(BucketStore.storedSchema)
      .option("basePath", src.root)
      .parquet(src.root)
      .drop("dt")
    val stream = settings.srcBucket
      .fold(stream0)(b => stream0.filter(col("bucket") === b))
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (settings.mode == ReplicationMode.Enabled) {
          // entry globs resolve against this batch's entries (strict when)
          val entryFiltered = settings.entries match {
            case None => batch
            case Some(pats) =>
              val all = batch.select("entry").distinct()
                .collect().map(_.getString(0)).toSeq
              val keep = EntryPattern.resolve(all, Some(pats))
              batch.filter(col("entry").isin(keep: _*))
          }
          val matched = QueryEngine.matching(entryFiltered,
            QuerySpec(when = settings.when, strict = true))
          val renamed = matched
            .withColumn("bucket", lit(settings.dstBucket))
            .withColumn("entry", concat(lit(settings.dstPrefix), col("entry")))
          dst.write(renamed, BucketStore.Conflict.Skip)
        }
      }
      .start()
    Some(q)
  }
}
