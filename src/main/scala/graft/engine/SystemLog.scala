package graft.engine

import org.apache.spark.sql.Row

/** Captures the engine's own log messages as records in
  * `$system/logs/<instance>/messages` (syslog/capture/logs.rs, payload/
  * log.rs): each persisted message becomes a record carrying the
  * reference's label set — `status` always, `level` as a queryable label
  * (syslog/path.rs record_labels) — and a JSON payload with the
  * level/target/message fields of LogSystemEventPayload.
  *
  * The persist-level gate runs BEFORE any write (capture/logs.rs
  * enqueue): messages less severe than `persistLevel` — or all messages
  * when `persistLevel` is None (RS_SYSTEM_EVENTS_LOG_LEVEL=OFF or
  * invalid) — are dropped. An empty instance name falls back to
  * `unknown` (path.rs entry_path). Writes use Conflict.Skip so a
  * same-microsecond duplicate never turns logging into a failure —
  * logging must not take the server down.
  */
final class SystemLog(store: BucketStore, instance: String,
    persistLevel: Option[String],
    /** Gates the non-log event families (replication/lifecycle
      * diagnostics) — RS_SYSTEM_EVENTS_ENABLED; log capture is gated by
      * `persistLevel` alone, matching cfg/system_events.rs. */
    eventsEnabled: Boolean = true,
    /** Remote sink for non-owning roles (syslog.rs:61,132: local on
      * primary/standalone, FORWARD on a replica — which keeps no local
      * `$system`). When set, [[events]] forwards instead of writing;
      * [[log]] capture is node-local and SKIPPED on a replica
      * (syslog.rs:332 — avoids the forward loop). */
    forwarder: Option[SystemEventForwarder] = None) {
  import SystemLog._

  private val inst = if (instance.isEmpty) "unknown" else instance

  /** Strictly increasing event timestamps: ts is the record id, so two
    * messages inside one millisecond (a startup warning burst) would
    * otherwise collide and the second would be silently skipped. */
  private val lastUs = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Persist one log message; returns true when it was written (at or
    * above the persist level), false when dropped by the gate. */
  def log(level: String, target: String, message: String,
      nowUs: Long = System.currentTimeMillis() * 1000L): Boolean = {
    if (forwarder.isDefined) return false // node-local: skipped on replicas
    val lvl = level.trim.toUpperCase
    val persist = persistLevel.exists(p =>
      Rank.getOrElse(lvl, Int.MaxValue) <= Rank.getOrElse(p, 0))
    if (persist) {
      val ts = lastUs.updateAndGet(prev => math.max(prev + 1, nowUs))
      import scala.jdk.CollectionConverters._
      val payload =
        s"""{"event_type":"log_message","level":${jstr(lvl)},""" +
          s""""target":${jstr(target)},"message":${jstr(message)}}"""
      val row = Row("$system", s"logs/$inst/messages", ts,
        Map("status" -> "200", "level" -> lvl),
        Map.empty[String, String], "application/json",
        graft.core.Records.State.Finished, payload.getBytes("UTF-8"))
      // writeWithSettings so $system's provisioned FIFO quota and the
      // free-disk preflight apply to log records like any other write.
      // GUARDED: telemetry must never take the serving path down — a
      // full disk (507 preflight) would otherwise abort server startup
      // (the ctor logs provisioning warnings) or turn an already-
      // completed operation into an error response.
      try {
        store.writeWithSettings("$system", store.spark.createDataFrame(
          Seq(row).asJava, graft.core.Records.schema),
          BucketStore.Conflict.Skip,
          incomingBytes = payload.getBytes("UTF-8").length.toLong)
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[system-log] dropped log write: $e")
        return false
      }
    }
    persist
  }

  /** Generic `$system` diagnostics event at
    * `<entryPrefix>/<instance>/<name>` — the replication / lifecycle
    * families (syslog/payload/{replication,lifecycle}.rs): a `status`
    * label plus a flat JSON payload. Timestamps share the log writer's
    * strictly-increasing clock. */
  def event(entryPrefix: String, name: String, status: Int,
      payloadJson: String,
      nowUs: Long = System.currentTimeMillis() * 1000L,
      /** Additional queryable labels (the usage family pins
        * written_entries / read_entries / record_count here, PR-1474). */
      extraLabels: Map[String, String] = Map.empty): Boolean =
    events(Seq(Event(entryPrefix, name, status, payloadJson, nowUs,
      extraLabels)))

  /** Persist a BURST of events as ONE `$system` write. A per-event
    * write is one full Spark job each — the usage snapshot emits one
    * event per bucket, so flushing a many-bucket instance event-by-event
    * costs minutes (measured: 300 buckets ≈ 7.5 min) and the 60-second
    * usage flusher could never drain a 10k-bucket instance. Sequence
    * order fixes the ts order: each event takes the next strictly-
    * increasing microsecond, so `usage/total` emitted first still sorts
    * before the per-bucket events it summarizes. */
  def events(items: Seq[Event]): Boolean = {
    if (!eventsEnabled || items.isEmpty) return false
    forwarder.foreach { fwd =>
      // replica: every event forwards to the primary's HTTP API as its
      // own single-record write (forward_writer.rs log_forward) — but
      // dispatched with BOUNDED CONCURRENCY (r19): sent serially, each
      // event is one primary mutation job (~0.5 s), so a many-bucket
      // usage flush backs up the 60 s flusher — the same arithmetic the
      // local path's batched write below exists for. In flight
      // together, the primary's MutationCoalescer folds them into
      // jobs-per-drain (SCALE.md r18: 7.3x fan-in at 16 writers).
      // Timestamps are assigned serially BEFORE dispatch, so the
      // strictly-increasing clock and event ordering are unchanged, and
      // the wire shape stays the reference's per-event POST; per-event
      // failure semantics are unchanged (all attempted, AND of results).
      val tasks = items.map { e =>
        val ts = lastUs.updateAndGet(prev => math.max(prev + 1, e.nowUs))
        () => fwd.send(s"${e.entryPrefix}/$inst/${e.name}", ts,
          Map("status" -> e.status.toString) ++ e.extraLabels,
          e.payloadJson.getBytes("UTF-8"))
      }
      if (tasks.size == 1) return tasks.head()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(8, tasks.size))
      try {
        val futs = tasks.map(t => pool.submit(
          new java.util.concurrent.Callable[Boolean] { def call(): Boolean = t() }))
        return futs.map(f =>
          try f.get()
          catch { case scala.util.control.NonFatal(e) =>
            System.err.println(s"[system-log] forward dispatch failed: $e")
            false
          }).forall(identity)
      } finally pool.shutdownNow()
    }
    import scala.jdk.CollectionConverters._
    val rows = items.map { e =>
      val ts = lastUs.updateAndGet(prev => math.max(prev + 1, e.nowUs))
      Row("$system", s"${e.entryPrefix}/$inst/${e.name}", ts,
        Map("status" -> e.status.toString) ++ e.extraLabels,
        Map.empty[String, String], "application/json",
        graft.core.Records.State.Finished,
        e.payloadJson.getBytes("UTF-8"))
    }
    // same no-throw guard as log(); byte count, not char count — CJK
    // payloads are 3 bytes/char and the quota/preflight admission must
    // see the real size
    try {
      store.writeWithSettings("$system", store.spark.createDataFrame(
        rows.asJava, graft.core.Records.schema),
        BucketStore.Conflict.Skip,
        incomingBytes = items.iterator
          .map(_.payloadJson.getBytes("UTF-8").length.toLong).sum)
      true
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[system-log] dropped ${items.size}-event write: $e")
      false
    }
  }
}

object SystemLog {
  /** One diagnostics event, pre-clock: ts is assigned at write time by
    * the log's shared strictly-increasing clock, in sequence order. */
  final case class Event(entryPrefix: String, name: String, status: Int,
      payloadJson: String,
      nowUs: Long = System.currentTimeMillis() * 1000L,
      extraLabels: Map[String, String] = Map.empty)

  /** Severity rank, ERROR most severe (log::Level's ordering). */
  val Rank: Map[String, Int] =
    Map("ERROR" -> 1, "WARN" -> 2, "INFO" -> 3, "DEBUG" -> 4, "TRACE" -> 5)

  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
