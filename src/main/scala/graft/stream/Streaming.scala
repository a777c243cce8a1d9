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
    * `when` semantics are identical to the batch path (same compiler).
    *
    * Label PATCHes are NOT re-emitted: the file stream sees new BASE
    * files only, and patches land in the hidden `_labels` overlay
    * (BucketStore r15). Before the overlay this was accidentally worse —
    * a patch REWROTE partitions, so the stream re-emitted every record
    * of those partitions as spurious new-file rows; now a patch emits
    * nothing, matching the batch cursors' reference semantics (a cursor
    * serves records as written; label updates don't replay history). */
  def continuousQuery(store: BucketStore, spec: QuerySpec): DataFrame = {
    val stream = store.spark.readStream
      .schema(BucketStore.storedSchema)
      .option("basePath", store.root)
      .parquet(store.root)
      .drop("dt")
    // stateful operators (and strict conditions that can error) run on
    // the batch path's sequential kernel, whose sortWithinPartitions is
    // UNSUPPORTED on streaming frames — route those through the
    // streaming state store instead (the same filter replication uses;
    // counters persist across micro-batches, the right continuous-tail
    // semantic: the reference keeps one filter chain for the query's
    // lifetime). Pure conditions keep the compiled batch predicate.
    val parsed = spec.when.map(w => graft.cond.Parser.parse(w))
    val kernelPath = parsed.exists(p => graft.cond.Node.isStateful(p.root)) ||
      (spec.strict && parsed.exists(p => QueryEngine.mayError(p.root)))
    if (!kernelPath) QueryEngine.matching(stream, spec)
    else {
      var scoped = stream.filter(col("state") === graft.core.Records.State.Finished)
      spec.bucket.foreach(b => scoped = scoped.filter(col("bucket") === b))
      spec.start.foreach(v => scoped = scoped.filter(col("ts") >= v))
      spec.stop.foreach(v => scoped = scoped.filter(col("ts") < v))
      scoped = scoped.filter(EntryPattern.predicateCol(col("entry"), spec.entries))
      StatefulStream.whenFilter(scoped, spec.when.get, strict = spec.strict)
    }
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
    * replications are per-bucket); None replicates the whole store.
    *
    * `compression` (replication_api.rs:28-36: none|zstd|gzip, default
    * none): the reference compresses batch payloads *in transfer*; here
    * the transfer IS the destination write, so zstd/gzip select the
    * parquet codec of the replicated files, and `none` — like the
    * reference, where transfer compression never dictates destination
    * storage — means no override (files land with the store's default
    * codec). */
  final case class ReplicationSettings(
      entries: Option[Seq[String]] = None, // glob patterns incl. '!'
      when: Option[String] = None,         // strict condition
      srcBucket: Option[String] = None,
      dstBucket: String = "default",
      dstPrefix: String = "",
      mode: ReplicationMode = ReplicationMode.Enabled,
      compression: String = "none")        // none|zstd|gzip

  /** Start a replication stream src → dst. Disabled → no-op (returns
    * None). Paused → ALSO no-op: the checkpoint must not advance while
    * paused — the reference's paused worker skips the whole sync pass
    * (`continue` before sender.run(), replication_task.rs:236-245) and
    * pending transactions ACCUMULATE until resume. Running the stream
    * with a skipping sink would commit the file-source offsets anyway
    * and permanently drop everything written while paused (a round-16
    * review fix: the previous behavior did exactly that). Resuming
    * re-runs from the untouched checkpoint and drains the backlog.
    *
    * Entry globs compile to a static Column predicate
    * ([[EntryPattern.predicateCol]] — equality/startsWith/rlike, all
    * codegen'd), so glob filtering is map-only on the stream with no
    * per-batch driver round-trip.
    *
    * A *stateful* `when` ($each_n/$each_t/$gate/$limit) routes through
    * [[StatefulStream.whenFilter]]: operator state lives in the streaming
    * state store keyed by (bucket, entry), so counters survive micro-batch
    * boundaries AND restarts of the same checkpoint — the reference keeps
    * them for the replication's lifetime
    * (replication/transaction_filter.rs:52-110). The stateful filter runs
    * on the stream itself (state stores don't exist inside foreachBatch);
    * it only sees records that pass the bucket + entry predicates, which
    * matches the reference's filter-chain order (entry scoping before the
    * condition ticks). Pure conditions keep the batch path: the compiled
    * predicate inside foreachBatch (same compiler as queries). */
  def replicate(src: BucketStore, dst: BucketStore,
      settings: ReplicationSettings, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      /** (records, payload bytes) per replicated micro-batch — feeds the
        * hourly diagnostics and the `$system` replication events. */
      onReplicated: (Long, Long) => Unit = (_, _) => (),
      /** Entry globs to EXCLUDE — the `$system` feedback-loop guard
        * (syslog PR-1567): a `$system`-source replication must not
        * replicate its own diagnostics events, or every run would feed
        * the next one a new record forever. The façade passes
        * `replications/STAR/<name>` for `$system` sources. */
      excludeEntries: Seq[String] = Nil,
      /** Injectable batch sender — the RemoteBucket seam
        * (replication_sender.rs:31): tests inject transfer latency or
        * failures here; None sends by writing to `dst` with the
        * settings' codec. Receives already-renamed (dst bucket/prefix)
        * record batches. */
      sendBatch: Option[DataFrame => Unit] = None,
      /** Depth-1 pipelined sending (PR-1527,
        * replication_sender.rs:120-155), applied when a custom
        * `sendBatch` (remote wire) is set and the micro-batch spans
        * multiple entries: prepare entry group k+1 — materialize its
        * slice of the micro-batch — while group k's send is in flight on
        * a background thread. Sends stay strictly ordered (single sender
        * thread), and the LAST send joins before foreachBatch returns,
        * so the exactly-once checkpoint contract is untouched: a failed
        * send fails the batch before it commits, and the replay dedups
        * via Conflict.Skip. false sends the per-entry slices serially
        * (the A/B baseline the spec measures). */
      pipelined: Boolean = true,
      /** Test seam: invoked (with the entry name) the moment a slice's
        * prepare — its eager localCheckpoint — completes. Lets the spec
        * assert overlap STRUCTURALLY (a prepare finished while a send
        * was in flight) instead of racing wall clocks. */
      onPrepared: String => Unit = _ => ()): Option[StreamingQuery] = {
    if (settings.mode != ReplicationMode.Enabled) return None
    val parsed = settings.when.map(w => graft.cond.Parser.parse(w))
    val statefulWhen = parsed.exists(p => graft.cond.Node.isStateful(p.root))
    val stream0 = src.spark.readStream
      .schema(BucketStore.storedSchema)
      .option("basePath", src.root)
      .parquet(src.root)
      .drop("dt")
    val bucketScoped = settings.srcBucket match {
      case Some(b) => stream0.filter(col("bucket") === b)
      case None if src.root == dst.root =>
        // whole-store replication into the SAME store: the destination
        // bucket must never feed itself — run N's output would
        // replicate again in run N+1 under another dstPrefix layer,
        // growing entries unboundedly (library-level belt; the HTTP
        // facade requires src_bucket outright, like the reference)
        stream0.filter(col("bucket") =!= settings.dstBucket)
      case None => stream0
    }
    // predicateCol with entries=None applies the default non-system
    // guard — $meta entries never replicate implicitly, matching the
    // batch path's resolve(None) semantics (round-16 review: the
    // stateful-when stream previously saw them when entries was unset)
    val entryScoped0 = bucketScoped
      .filter(EntryPattern.predicateCol(col("entry"), settings.entries))
      // only finished records replicate (and tick stateful counters) —
      // the batch path gets this from QueryEngine.matching's state flag
      .filter(col("state") === graft.core.Records.State.Finished)
    val entryScoped =
      if (excludeEntries.isEmpty) entryScoped0
      else entryScoped0.filter(
        !EntryPattern.predicateCol(col("entry"), Some(excludeEntries)))
    // mode gating happens ABOVE (paused/disabled never open the
    // checkpoint), so the stream shape is constant per checkpoint — a
    // pause toggle can't flip the stateful operator's presence under
    // Spark's state-metadata validation
    val stream =
      if (statefulWhen)
        StatefulStream.whenFilter(entryScoped, settings.when.get, strict = true)
      else entryScoped
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        {
          val matched = (
            if (statefulWhen) batch // already filtered on the stream
            else QueryEngine.matching(batch,
              QuerySpec(when = settings.when, strict = true))
          ).persist() // one compute feeds both the stats and the write
          // ONE agg job yields the record/byte totals, the per-entry
          // slice list for the pipelined sender, AND the usage traffic
          // rows (was three separate jobs). Bounded: one row per entry
          // in the micro-batch.
          val perEntry = matched.groupBy("entry")
            .agg(count(lit(1)).as("n"),
              coalesce(sum(length(col("payload"))), lit(0L)).as("b"))
            .collect()
            .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
            .sortBy(_._1)
          val n = perEntry.map(_._2).sum
          val bytes = perEntry.map(_._3).sum
          val renamed = matched
            .withColumn("bucket", lit(settings.dstBucket))
            .withColumn("entry", concat(lit(settings.dstPrefix), col("entry")))
          val codec = settings.compression.toLowerCase match {
            case "none" | "" => None          // no override: store default
            case "zstd"      => Some("zstd")
            case "gzip"      => Some("gzip")
            case other => throw new IllegalArgumentException(
              s"Invalid replication compression '$other'")
          }
          val doSend: DataFrame => Unit = sendBatch.getOrElse(
            df => dst.write(df, BucketStore.Conflict.Skip, codec = codec))
          // The default sink is one partitioned Spark write into the local
          // dst store — splitting it per entry would only multiply fixed
          // job costs. A custom sender is the remote-wire seam, where the
          // reference's per-entry batches apply: slice the micro-batch by
          // entry (its transaction logs are per-entry too) and send the
          // slices in order.
          val entryNames =
            if (sendBatch.isDefined) perEntry.map(_._1)
            else Array.empty[String]
          try {
            if (entryNames.length <= 1) doSend(renamed)
            else {
              // depth-1 pipelining across entry groups: slice k+1
              // materializes (localCheckpoint job) while slice k's send
              // runs on the sender thread; a single-thread executor keeps
              // sends strictly ordered, and joining the previous future
              // BEFORE submitting the next bounds the queue at one
              // in-flight batch. Send failures surface on join → the
              // micro-batch fails before its checkpoint commit.
              val sender = java.util.concurrent.Executors
                .newSingleThreadExecutor(r => {
                  val t = new Thread(r, "graft-repl-send")
                  t.setDaemon(true); t
                })
              try {
                var inFlight: Option[java.util.concurrent.Future[_]] = None
                for (e <- entryNames) {
                  val slice = renamed
                    .filter(col("entry") === lit(settings.dstPrefix + e))
                    .localCheckpoint(true) // the "prepare": eager materialize
                  onPrepared(e)
                  inFlight.foreach(_.get())
                  if (pipelined)
                    inFlight = Some(sender.submit(new Runnable {
                      def run(): Unit = doSend(slice)
                    }))
                  else { doSend(slice); inFlight = None } // serial baseline
                }
                inFlight.foreach(_.get()) // drain the final send
              } catch {
                case e: java.util.concurrent.ExecutionException =>
                  throw e.getCause // fail the batch with the real error
              } finally sender.shutdownNow()
            }
          } finally matched.unpersist()
          // count destination writes AFTER the send, like the reference's
          // storage choke point (storage/usage.rs: "external, replication
          // and Zenoh traffic count uniformly") — counting before it
          // would double-tally on a Spark retry of a failed batch and
          // count writes a failing custom sender never delivered
          for ((e, en, eb) <- perEntry)
            dst.usage.countWrite(settings.dstBucket,
              settings.dstPrefix + e, en, eb)
          onReplicated(n, bytes) // diagnostics hook (msg/diagnostics.rs)
        }
      }
      .start()
    Some(q)
  }

  /** Propagate label UPDATES src → dst — the reference replicates label
    * PATCHes as `Transaction::UpdateRecord` through the same pipeline as
    * writes and PATCHes the destination batch-wise
    * (api/http/entry/update_single.rs:84, remote_bucket/states/
    * bucket_available.rs:79-88). Here the store's `_updates/` tree IS
    * that transaction log (append-only, written by every PATCH path), so
    * update replication is a second file stream over it: each row
    * carries the full post-patch label map, the destination applies the
    * latest per key to records it holds and skips the rest (the
    * reference's per-record error map).
    *
    * Scoping matches [[replicate]]: srcBucket, entry globs, excludes,
    * dstBucket/dstPrefix rename; Paused never opens the checkpoint, so
    * the update backlog accumulates until resume (same as [[replicate]]). A PURE `when` evaluates against the updated record's
    * labels (transaction_filter semantics); a STATEFUL `when` is a
    * record-stream property — its counters live in the record query's
    * state store — so updates do not propagate under one (documented
    * divergence: the reference shares one filter chain; replaying
    * updates through a second state store would double-tick counters).
    *
    * Ordering: records and updates drain as two streams, so an update
    * whose record lands at the destination only in a LATER pass is
    * dropped by this pass (reported in the `dropped` count — the
    * reference's per-record error map is the same outcome: its sender
    * records the failure and moves on, remote_bucket states). */
  def replicateLabelUpdates(src: BucketStore, dst: BucketStore,
      settings: ReplicationSettings, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      /** (applied, dropped) per micro-batch — dropped covers
        * destination-missing records (the reference's per-record error
        * map) and already-current no-ops. */
      onReplicated: (Long, Long) => Unit = (_, _) => (),
      excludeEntries: Seq[String] = Nil,
      /** Remote-wire seam: receives renamed (dstBucket/dstPrefix) update
        * rows (bucket, entry, ts, labels, seq); None applies to `dst`. */
      sendUpdates: Option[DataFrame => Unit] = None): Option[StreamingQuery] = {
    // paused must not advance this checkpoint either — same backlog
    // semantics as [[replicate]] (replication_task.rs:236-245)
    if (settings.mode != ReplicationMode.Enabled) return None
    val parsed = settings.when.map(w => graft.cond.Parser.parse(w))
    if (parsed.exists(p => graft.cond.Node.isStateful(p.root))) return None
    // ensure future patches log — callers managing tasks set this at
    // task CREATION (HttpApi); direct library use gets it here at the
    // latest, so at worst pre-first-drain patches don't replicate
    // (reference: the transaction log starts with the task)
    src.updateLogEnabled = true
    val updatesRoot = s"${src.root}/${BucketStore.UpdatesDir}"
    // a store that has never been PATCHed has no `_updates` yet — the
    // stream must still start (and pick updates up as they appear)
    val urPath = new org.apache.hadoop.fs.Path(updatesRoot)
    urPath.getFileSystem(src.spark.sparkContext.hadoopConfiguration)
      .mkdirs(urPath)
    // the hidden `_updates` root itself would be filtered by Spark's
    // listing — glob its non-hidden `bucket=` children (the same shape
    // as the batch overlay read) with basePath anchoring the partitions
    val stream0 = src.spark.readStream
      .schema(BucketStore.overlayStoredSchema)
      .option("basePath", updatesRoot)
      .parquet(s"$updatesRoot/bucket=*")
      .drop("dt")
    val bucketScoped = settings.srcBucket match {
      case Some(b) => stream0.filter(col("bucket") === b)
      case None if src.root == dst.root =>
        // whole-store replication into the SAME store: the destination
        // bucket must never feed itself — run N's output would
        // replicate again in run N+1 under another dstPrefix layer,
        // growing entries unboundedly (library-level belt; the HTTP
        // facade requires src_bucket outright, like the reference)
        stream0.filter(col("bucket") =!= settings.dstBucket)
      case None => stream0
    }
    val entryScoped0 = bucketScoped
      .filter(EntryPattern.predicateCol(col("entry"), settings.entries))
    val entryScoped =
      if (excludeEntries.isEmpty) entryScoped0
      else entryScoped0.filter(
        !EntryPattern.predicateCol(col("entry"), Some(excludeEntries)))
    val q = entryScoped.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        {
          // pure `when` evaluates on a synthetic record built from the
          // update row (post-patch labels; no payload) — the same
          // compiled-condition path as everything else
          val matched = settings.when.fold(batch) { w =>
            QueryEngine.matching(
              batch.select(col("bucket"), col("entry"), col("ts"),
                col("labels"),
                map().cast("map<string,string>").as("computed_labels"),
                lit("").as("content_type"),
                lit(graft.core.Records.State.Finished).as("state"),
                lit(null).cast("binary").as("payload"),
                col("seq")),
              QuerySpec(when = Some(w), strict = true))
              .select("bucket", "entry", "ts", "labels", "seq")
          }
          val renamed = matched
            .withColumn("bucket", lit(settings.dstBucket))
            .withColumn("entry", concat(lit(settings.dstPrefix), col("entry")))
          sendUpdates match {
            case Some(send) => send(renamed); onReplicated(-1L, 0L)
            case None =>
              val (applied, dropped) = dst.applyReplicatedLabels(renamed)
              onReplicated(applied, dropped)
          }
        }
      }
      .start()
    Some(q)
  }
}
