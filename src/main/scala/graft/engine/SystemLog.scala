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
        // touchedEntries declared: an undeclared write marks the WHOLE
        // store dirty, so on a live server every 60 s usage flush and
        // every captured log line would re-arm the full-walk compaction
        // probe — defeating the r19 incremental-candidate optimization
        // for exactly the steady-state ticks it exists for (ADVICE r19)
        store.writeWithSettings("$system", store.spark.createDataFrame(
          Seq(row).asJava, graft.core.Records.schema),
          BucketStore.Conflict.Skip,
          incomingBytes = payload.getBytes("UTF-8").length.toLong,
          touchedEntries = Some(Seq(("$system", s"logs/$inst/messages"))),
          knownTsBounds = Some((ts, ts)))
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
      // replica: the whole flush forwards to the primary as ONE
      // multi-entry io-v2 batch (r20, replacing r19's bounded-concurrent
      // per-event POSTs): the flusher holds every event of a flush in
      // hand, so a many-bucket usage flush costs one primary mutation
      // instead of ~N (r19 pricing: ~21 drains / 25 events on loopback,
      // 0.29-0.40 s/event — the per-event POSTs outran the coalescer).
      // Timestamps are assigned serially BEFORE encoding, so the
      // strictly-increasing clock and event ordering are unchanged; a
      // single event keeps the reference's per-event POST wire shape;
      // per-record conflicts come back as the batch's error headers and
      // report false exactly like the per-event 409 did.
      val recs = items.map { e =>
        val ts = lastUs.updateAndGet(prev => math.max(prev + 1, e.nowUs))
        (s"${e.entryPrefix}/$inst/${e.name}", ts,
          Map("status" -> e.status.toString) ++ e.extraLabels,
          e.payloadJson.getBytes("UTF-8"))
      }
      return fwd.sendBatch(recs)
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
      // touchedEntries declared — see log()'s guard: the batched usage
      // flush is THE steady-state write on a live server, and leaving it
      // undeclared re-armed the full-walk probe every tick (ADVICE r19)
      store.writeWithSettings("$system", store.spark.createDataFrame(
        rows.asJava, graft.core.Records.schema),
        BucketStore.Conflict.Skip,
        incomingBytes = items.iterator
          .map(_.payloadJson.getBytes("UTF-8").length.toLong).sum,
        touchedEntries = Some(items.iterator
          .map(e => ("$system", s"${e.entryPrefix}/$inst/${e.name}"))
          .toSeq.distinct),
        // ts are assigned serially above — min is the first, max the last
        knownTsBounds = Some((rows.head.getLong(2), rows.last.getLong(2))))
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
