package graft.stream

import graft.cond.StateMachines
import graft.cond.StateMachines.{EachTState, GateState}
import graft.engine.QueryEngine
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sequential-state operators over *streams*: the batch kernel's per-entry
  * scan becomes `flatMapGroupsWithState` keyed by (bucket, entry) — the
  * same state machines ([[StateMachines]]) with their state persisted in
  * the streaming state store across micro-batches. Rows inside one
  * micro-batch are sorted by ts per key (the group iterator itself is
  * unordered); late data that time-travels backwards triggers the
  * machines' documented reset semantics, exactly like the reference's
  * continuous query observing a belated write.
  */
object StatefulStream {

  private type KV = ((String, String), Row)

  /** One flagged event from [[anomalies]], with the moments as they
    * stood when it was judged. */
  final case class AnomalyFlag(key: String, id: Long, tsUs: Long,
      value: Double, runMean: Double, runSigma: Double)

  /** One silence alert from [[silenceAlerts]]. */
  final case class SilenceAlert(bucket: String, entry: String,
      lastTsUs: Long)

  /** `$each_t` over a streaming record frame: emits the debounced records
    * (one per >= interval per entry). */
  def eachT(records: DataFrame, intervalSec: Double): DataFrame =
    statefulFilter[EachTState](records, EachTState()) {
      (state, tsUs) => StateMachines.eachT(state, tsUs, intervalSec)
    }

  /** `$gate` over a streaming record frame: `inputFlag` must be a boolean
    * column computable per record (e.g. a compiled pure condition). */
  def gate(records: DataFrame, durationUs: Long, inputFlag: org.apache.spark.sql.Column): DataFrame = {
    val flagged = records.withColumn("__in", coalesce(inputFlag, lit(false)))
    val out = statefulFilterFlag[GateState](flagged, GateState()) {
      (state, tsUs, in) => StateMachines.gate(state, tsUs, durationUs, in)
    }
    out.drop("__in")
  }

  /** A full `when` tree over a streaming record frame, with every stateful
    * operator's state ($each_n/$limit counters, $each_t/$gate machines)
    * persisted in the streaming state store across micro-batches — keyed
    * by (bucket, entry), matching the reference's one-filter-chain-per-
    * entry model for the lifetime of a replication
    * (replication/transaction_filter.rs:52-110).
    *
    * Rows are sorted by ts within each (key, micro-batch); the condition
    * evaluates through the same [[graft.cond.Interp]] as the batch kernel
    * (StatefulKernel), so semantics are identical — only the state's
    * lifetime differs. Directives (#ctx_*, #select_labels) don't apply
    * here: replication filters are bare conditions in the reference too.
    */
  def whenFilter(records: DataFrame, when: String,
      strict: Boolean = true): DataFrame = {
    val root = graft.cond.Parser.parse(when).root
    val schema = records.schema
    val tsIdx = schema.fieldIndex("ts")
    // hoisted like tsIdx: fieldIndex is a per-call map lookup,
    // and the key extractor runs per RECORD on the hot path
    val bucketIdx = schema.fieldIndex("bucket")
    val entryIdx = schema.fieldIndex("entry")
    val labelsIdx = schema.fieldIndex("labels")
    val computedIdx = schema.fieldIndex("computed_labels")
    implicit val rowEnc = Encoders.row(schema)
    implicit val keyEnc = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    implicit val stateEnc = Encoders.kryo[Vector[Any]]
    records.groupByKey { r: Row =>
      (r.getString(bucketIdx), r.getString(entryIdx))
    }.flatMapGroupsWithState[Vector[Any], Row](
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (_: (String, String), rows: Iterator[Row], gs: GroupState[Vector[Any]]) =>
        val interp = new graft.cond.Interp(root)
        gs.getOption.foreach(interp.restoreState)
        val sorted = rows.toArray.sortBy(_.getLong(tsIdx))
        var interrupted = false
        val out = sorted.flatMap { row =>
          if (interrupted) None
          else {
            val labels =
              if (row.isNullAt(labelsIdx)) Map.empty[String, String]
              else row.getMap[String, String](labelsIdx)
            val computed =
              if (row.isNullAt(computedIdx)) Map.empty[String, String]
              else row.getMap[String, String](computedIdx)
            val ctx = graft.cond.Ctx(row.getLong(tsIdx), labels, computed)
            try { if (interp(ctx).asBool) Some(row) else None }
            catch {
              case _: graft.cond.InterruptSignal => interrupted = true; None
              case e: graft.cond.CondError => if (strict) throw e else None
            }
          }
        }
        gs.update(interp.stateSnapshot)
        out.iterator
    }.toDF()
  }

  /** Streaming exact dedup for ingest: the FIRST record carrying a given
    * content digest passes; every later duplicate — across micro-batches
    * and across restarts of the same checkpoint — drops. Same state-store
    * shape as the built-in streaming `dropDuplicates` (one boolean per
    * distinct digest), but with a DETERMINISTIC first-occurrence rule:
    * within a micro-batch the smallest ts wins, where dropDuplicates
    * keeps an arbitrary row. Unbounded corpora should bound the state
    * with an event-time horizon (derive a timestamp column,
    * `dropDuplicatesWithinWatermark`) so expired digests age out;
    * digest-equal records are content-equal, so which survives only
    * matters for its ts/labels metadata. */
  def dedupExact(records: DataFrame,
      digest: org.apache.spark.sql.Column = md5(col("payload"))): DataFrame = {
    val schema = records.schema
    val withDigest = records.withColumn("__digest", digest)
    val tsIdx = schema.fieldIndex("ts")
    implicit val rowEnc = Encoders.row(withDigest.schema)
    implicit val keyEnc = Encoders.STRING
    implicit val stateEnc = Encoders.scalaBoolean
    val dIdx = withDigest.schema.fieldIndex("__digest")
    withDigest.groupByKey { r: Row => r.getString(dIdx) }
      .flatMapGroupsWithState[Boolean, Row](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[Row], gs: GroupState[Boolean]) =>
          if (gs.getOption.contains(true)) Iterator.empty
          else {
            gs.update(true)
            // deterministic first-occurrence: min ts within the batch
            Iterator.single(rows.minBy(_.getLong(tsIdx)))
          }
      }.toDF().drop("__digest")
  }

  /** Streaming NEAR-dup suppression per (bucket, entry): a record whose
    * minhash signature agrees with any recent survivor of its entry on
    * ≥ `simThreshold` of the hash slots (the standard minhash Jaccard
    * estimator) drops; survivors join the entry's history. The batch
    * near-dup operators answer "which pairs exist in this corpus" —
    * this answers the ingest-time question "is this record a near-copy
    * of what this stream already carried", across micro-batches and
    * restarts of the same checkpoint.
    *
    * State is BOUNDED: per entry, a FIFO of the last `maxHistory`
    * survivor signatures (64 longs each — ~0.5 MB/entry at the 1000
    * default). A near-dup of an evicted survivor re-enters; that is
    * the documented trade for bounded state on an unbounded stream —
    * the same reasoning as the batch hot-bucket caps. Signatures are
    * computed codegen-side ([[graft.pipeline.DedupExprs.minhashSig]])
    * before the state function; the stateful step is a primitive
    * slot-compare loop. Shingle-less records (empty text) pass through
    * and never enter history — an all-empty signature would otherwise
    * match every other empty doc at 100%.
    *
    * Deterministic: rows sort by ts per (key, micro-batch), so the
    * survivor set is a pure function of the record stream. */
  def dedupNearMinhash(records: DataFrame,
      text: org.apache.spark.sql.Column,
      simThreshold: Double = 0.8, maxHistory: Int = 1000,
      k: Int = 3, numHashes: Int = 64): DataFrame = {
    import graft.pipeline.DedupExprs
    val shingles = DedupExprs.shingleHash60(text, k)
    val withSig = records.withColumn("__sig",
      when(size(shingles) > 0, DedupExprs.minhashSig(shingles, numHashes)))
    val schema = withSig.schema
    val tsIdx = schema.fieldIndex("ts")
    // hoisted like tsIdx: fieldIndex is a per-call map lookup,
    // and the key extractor runs per RECORD on the hot path
    val bucketIdx = schema.fieldIndex("bucket")
    val entryIdx = schema.fieldIndex("entry")
    val sigIdx = schema.fieldIndex("__sig")
    implicit val rowEnc = Encoders.row(schema)
    implicit val keyEnc = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    implicit val stateEnc = Encoders.kryo[Vector[Array[Long]]]
    withSig.groupByKey { r: Row =>
      (r.getString(bucketIdx), r.getString(entryIdx))
    }.flatMapGroupsWithState[Vector[Array[Long]], Row](
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (_: (String, String), rows: Iterator[Row], gs: GroupState[Vector[Array[Long]]]) =>
        var hist = gs.getOption.getOrElse(Vector.empty)
        val sorted = rows.toArray.sortBy(_.getLong(tsIdx))
        val out = sorted.flatMap { row =>
          if (row.isNullAt(sigIdx)) Some(row)
          else {
            val sig = row.getSeq[Long](sigIdx).toArray
            val isDup = hist.exists { h =>
              var m = 0; var i = 0
              while (i < sig.length) { if (h(i) == sig(i)) m += 1; i += 1 }
              m.toDouble / sig.length >= simThreshold
            }
            if (isDup) None
            else {
              hist = (hist :+ sig).takeRight(maxHistory)
              Some(row)
            }
          }
        }
        gs.update(hist)
        out.iterator
    }.toDF().drop("__sig")
  }

  /** CAUSAL streaming anomaly detection: each event is judged against
    * the running moments of its key as they stood BEFORE it arrived —
    * the ingest-time monitor a store emits alerts from, where the batch
    * [[graft.pipeline.TimeSeries.anomalies]] judges against the whole
    * corpus in hindsight. State per key is three doubles (Welford count /
    * mean / M2), updated by every event, across micro-batches and
    * restarts. Events inside one micro-batch process in (ts, event_id)
    * order, so the flag sequence is a pure function of the stream. The
    * first `minHistory` events of a key are never flagged (no stable σ
    * yet) but still train the moments.
    *
    * Emits only the flagged events, with the mean/σ that convicted them.
    */
  def anomalies(events: DataFrame, keyCol: String, tsUsCol: String,
      valueCol: String, idCol: String, nSigma: Double,
      minHistory: Int = 30): DataFrame = {
    val schema = events.schema
    val tsIdx = schema.fieldIndex(tsUsCol)
    val idIdx = schema.fieldIndex(idCol)
    val vIdx = schema.fieldIndex(valueCol)
    val kIdx = schema.fieldIndex(keyCol)
    implicit val rowEnc = Encoders.row(schema)
    implicit val keyEnc = Encoders.STRING
    implicit val stateEnc = Encoders.kryo[(Long, Double, Double)]
    implicit val outEnc = Encoders.product[AnomalyFlag]
    events.groupByKey { r: Row => r.getString(kIdx) }
      .flatMapGroupsWithState[(Long, Double, Double), AnomalyFlag](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Row],
            gs: GroupState[(Long, Double, Double)]) =>
          var (n, mean, m2) = gs.getOption.getOrElse((0L, 0.0, 0.0))
          val sorted = rows.toArray.sortBy(r =>
            (r.getLong(tsIdx), r.getLong(idIdx)))
          val out = sorted.flatMap { row =>
            val v = row.getDouble(vIdx)
            val preMean = mean
            val sigma = if (n > 1) math.sqrt(m2 / (n - 1)) else 0.0
            val flagged = n >= minHistory && sigma > 0 &&
              math.abs(v - preMean) > nSigma * sigma
            // Welford update AFTER the judgment (strictly causal)
            n += 1
            val d = v - mean
            mean += d / n
            m2 += d * (v - mean)
            if (flagged)
              Some(AnomalyFlag(key, row.getLong(idIdx), row.getLong(tsIdx),
                v, preMean, sigma))
            else None
          }
          gs.update((n, mean, m2))
          out.iterator
      }.toDF(keyCol, idCol, tsUsCol, valueCol, "run_mean", "run_sigma")
  }

  /** Heartbeat monitoring: one alert per (bucket, entry) that goes
    * SILENT — no record for `silenceUs` of event time past its last
    * record. Event-time `GroupStateTimeout` drives it: each batch with
    * data re-arms the entry's timeout at last-ts + silence; when the
    * WATERMARK (not the wall clock) passes that point with no new data,
    * the state-store callback fires with an empty iterator and emits the
    * alert — deterministic and replayable, because silence is judged
    * against stream time, exactly like the reference's TTL'd query
    * cursors are judged against record time. New data after an alert
    * re-arms (a recovered entry can alert again on its next outage).
    *
    * The caller must put `withWatermark` on an event-time column derived
    * from `ts` BEFORE calling, and the column must remain in the frame
    * (Spark requires it for event-time timeouts); the watermark delay is
    * the alert latency bound. State per entry: 8 bytes of last-seen ts.
    */
  def silenceAlerts(records: DataFrame, silenceUs: Long): DataFrame = {
    val schema = records.schema
    val tsIdx = schema.fieldIndex("ts")
    // hoisted like tsIdx: fieldIndex is a per-call map lookup,
    // and the key extractor runs per RECORD on the hot path
    val bucketIdx = schema.fieldIndex("bucket")
    val entryIdx = schema.fieldIndex("entry")
    implicit val rowEnc = Encoders.row(schema)
    implicit val keyEnc = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    implicit val stateEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[SilenceAlert]
    records.groupByKey { r: Row =>
      (r.getString(bucketIdx), r.getString(entryIdx))
    }.flatMapGroupsWithState[Long, SilenceAlert](
      OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
      (key: (String, String), rows: Iterator[Row], gs: GroupState[Long]) =>
        if (gs.hasTimedOut) {
          val last = gs.get
          gs.remove() // re-arms on the entry's next record
          Iterator.single(SilenceAlert(key._1, key._2, last))
        } else {
          val maxTs = rows.map(_.getLong(tsIdx)).max
          val last = math.max(gs.getOption.getOrElse(Long.MinValue), maxTs)
          gs.update(last)
          gs.setTimeoutTimestamp(last / 1000L + silenceUs / 1000L)
          Iterator.empty
        }
    }.toDF("bucket", "entry", "last_ts_us")
  }

  /** One ranked term from a closed [[trendingTerms]] window. */
  final case class TrendingTerm(windowStartUs: Long, term: String,
      count: Long, err: Long, rank: Long)

  /** Trending terms: top-`k` most frequent `term` values per tumbling
    * event-time window, each window summarized by a bounded SpaceSaving
    * sketch ([[graft.pipeline.Sketches]]) held in the streaming state
    * store — at most `capacity` counters per OPEN window regardless of
    * stream volume or vocabulary, the property that keeps this viable on
    * an unbounded token stream where exact per-window counts would grow
    * state with distinct-term cardinality.
    *
    * A window's ranking emits exactly once, when the WATERMARK passes its
    * end (event-time `GroupStateTimeout`), then its state drops — so the
    * output is deterministic under replay and late data inside the
    * watermark still counts. The caller must `withWatermark` an
    * event-time column derived from `ts` before calling (the watermark
    * delay bounds both lateness tolerance and emission latency). Input
    * needs `ts` (µs long) and `term` (string) columns.
    */
  def trendingTerms(records: DataFrame, windowUs: Long, capacity: Int,
      k: Int): DataFrame = {
    import graft.pipeline.Sketches
    val agg = new Sketches.SpaceSavingAgg(capacity, k)
    val schema = records.schema
    val tsIdx = schema.fieldIndex("ts")
    val termIdx = schema.fieldIndex("term")
    implicit val rowEnc = Encoders.row(schema)
    implicit val keyEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.kryo[Sketches.SpaceSavingBuffer]
    implicit val outEnc = Encoders.product[TrendingTerm]
    records.groupByKey { r: Row =>
      val ts = r.getLong(tsIdx); ts - Math.floorMod(ts, windowUs)
    }.flatMapGroupsWithState[Sketches.SpaceSavingBuffer, TrendingTerm](
      OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
      (start: Long, rows: Iterator[Row],
          gs: GroupState[Sketches.SpaceSavingBuffer]) =>
        if (gs.hasTimedOut) {
          val ranked = agg.finish(gs.get).items.zipWithIndex.map {
            case (h, i) => TrendingTerm(start, h.term, h.count, h.err, i + 1L)
          }
          gs.remove()
          ranked.iterator
        } else {
          var buf = gs.getOption.getOrElse(agg.zero)
          rows.foreach(r => buf = agg.reduce(buf, r.getString(termIdx)))
          gs.update(buf)
          gs.setTimeoutTimestamp((start + windowUs) / 1000L)
          Iterator.empty
        }
    }.toDF("window_start_us", "term", "count", "err", "rank")
  }

  /** One closed window from [[activeUsersWindows]]. */
  final case class WindowUsers(windowStartUs: Long, activeUsers: Long,
      nEvents: Long)

  /** Streaming twin of [[graft.pipeline.TimeSeries.activeUsers]]: EXACT
    * distinct users per tumbling event-time window. Streaming append
    * mode cannot run a distinct aggregate natively, so each open window
    * keeps its user-id set in the state store (state ∝ distinct users
    * per window — the same cardinality the batch shuffle carries) and
    * emits exactly once when the watermark closes the window. For
    * unbounded per-window cardinality swap the set for an HLL sketch at
    * the call site; the emit-on-close contract stays identical. Input
    * needs `ts` (µs long) and `user_id` (long); caller sets the
    * watermark.
    */
  def activeUsersWindows(records: DataFrame, windowUs: Long): DataFrame = {
    val schema = records.schema
    val tsIdx = schema.fieldIndex("ts")
    val uidIdx = schema.fieldIndex("user_id")
    implicit val rowEnc = Encoders.row(schema)
    implicit val keyEnc = Encoders.scalaLong
    implicit val stateEnc =
      Encoders.kryo[(scala.collection.mutable.HashSet[Long], Long)]
    implicit val outEnc = Encoders.product[WindowUsers]
    records.groupByKey { r: Row =>
      val ts = r.getLong(tsIdx); ts - Math.floorMod(ts, windowUs)
    }.flatMapGroupsWithState[(scala.collection.mutable.HashSet[Long], Long),
        WindowUsers](
      OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
      (start: Long, rows: Iterator[Row],
          gs: GroupState[(scala.collection.mutable.HashSet[Long], Long)]) =>
        if (gs.hasTimedOut) {
          val (users, n) = gs.get
          gs.remove()
          Iterator.single(WindowUsers(start, users.size.toLong, n))
        } else {
          val (users, n0) = gs.getOption
            .getOrElse((scala.collection.mutable.HashSet.empty[Long], 0L))
          var n = n0
          rows.foreach { r => users += r.getLong(uidIdx); n += 1 }
          gs.update((users, n))
          gs.setTimeoutTimestamp((start + windowUs) / 1000L)
          Iterator.empty
        }
    }.toDF("window_start_us", "active_users", "n_events")
  }

  private def statefulFilter[S: scala.reflect.ClassTag](records: DataFrame, init: S)(
      step: (S, Long) => (S, Boolean)): DataFrame =
    statefulFilterFlag[S](records.withColumn("__in", lit(true)), init) {
      (s, ts, _) => step(s, ts)
    }.drop("__in")

  private def statefulFilterFlag[S: scala.reflect.ClassTag](records: DataFrame, init: S)(
      step: (S, Long, Boolean) => (S, Boolean)): DataFrame = {
    val schema = records.schema
    val tsIdx = schema.fieldIndex("ts")
    // hoisted like tsIdx: fieldIndex is a per-call map lookup,
    // and the key extractor runs per RECORD on the hot path
    val bucketIdx = schema.fieldIndex("bucket")
    val entryIdx = schema.fieldIndex("entry")
    val inIdx = schema.fieldIndex("__in")
    implicit val rowEnc = Encoders.row(schema)
    implicit val keyEnc = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    implicit val stateEnc = Encoders.kryo[S]
    val grouped = records.groupByKey { r: Row =>
      (r.getString(bucketIdx), r.getString(entryIdx))
    }
    grouped.flatMapGroupsWithState[S, Row](
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (_: (String, String), rows: Iterator[Row], gs: GroupState[S]) =>
        var state = gs.getOption.getOrElse(init)
        val sorted = rows.toArray.sortBy(_.getLong(tsIdx))
        val out = sorted.flatMap { row =>
          val (next, emit) = step(state, row.getLong(tsIdx), row.getBoolean(inIdx))
          state = next
          if (emit) Some(row) else None
        }
        gs.update(state)
        out.iterator
    }.toDF()
  }
}
