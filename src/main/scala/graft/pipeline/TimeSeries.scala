package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series analytics over the raw event stream — the operations a
  * user of a timestamped record store (reference: ReductStore's
  * µs-keyed entries, `storage.proto:38`) runs downstream of the store:
  * sessionization, as-of joins, tumbling rollups, gap fill, and
  * deviation-based anomaly flags.
  *
  * Scale notes (100 TB): the user-keyed operators shuffle once on
  * `user_id` and run a single window scan per key. The event_type-keyed
  * operators (movingAggregate / derivative / gapFill) CANNOT lean on
  * key cardinality — a handful of types would serialize whole series
  * through single tasks — so they lower to a TWO-PHASE chunked form:
  * per-(type, chunk) windows plus a boundary pass over per-chunk tables
  * whose size tracks the time span, not the data (a couple of bounded
  * exchanges instead of one unbounded sort). The lowering is ADAPTIVE
  * (TwoPhase.useChunked): a plan-time probe keeps the plain single
  * window while every key's series fits one task, so small/medium runs
  * don't pay the boundary-pass tax; past the bound the chunked plan
  * takes over. Differential specs pin the branches identical. No
  * self-joins, no per-key driver loops anywhere. Double aggregations route through
  * `DECIMAL(38,6)` partial sums so results are order-independent
  * (bit-identical across engines and across retries at any
  * parallelism), then surface as doubles.
  */
object TimeSeries {

  private val Dec = "decimal(38,6)"

  /** Deterministic event ordering within equal timestamps. */
  private def eventOrder: Seq[Column] = Seq(col("ts_us"), col("event_id"))

  /** Exact floor-division chunk index for the two-phase window
    * lowerings: `(c - pmod(c, width)) / width`. The numerator is an
    * exact multiple of `width` and epoch-µs magnitudes stay below 2^53,
    * so the double division is exact — a plain `c / width` cast could
    * round across an integer boundary and misfile a row into the
    * neighboring chunk. */
  private def chunkOf(c: Column, width: Long): Column =
    ((c - pmod(c, lit(width))) / lit(width)).cast("long")

  private def withTsUs(events: DataFrame): DataFrame =
    events.withColumn("ts_us", graft.core.Records.eventTsUs(events))

  /** Gap-based sessionization: a new session starts when a user is idle
    * longer than `gapUs`. One shuffle (by `user_id`), two window scans
    * over the same partitioning (Catalyst reuses the exchange), then a
    * partial-aggregated groupBy on (user, session).
    *
    * Output: one row per session with start/end (µs), event count, and an
    * order-independent decimal sum of `value`.
    */
  def sessionize(events: DataFrame, gapUs: Long): DataFrame = {
    require(gapUs > 0, s"gapUs must be positive, got $gapUs")
    val byUser = Window.partitionBy(col("user_id")).orderBy(eventOrder: _*)
    val prevTs = lag(col("ts_us"), 1).over(byUser)
    val isNew = when(prevTs.isNull || col("ts_us") - prevTs > gapUs, 1L)
      .otherwise(0L)
    withTsUs(events)
      .withColumn("session_idx", sum(isNew).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("ts_us")).as("session_start"),
        max(col("ts_us")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(Dec)).cast("double").as("sum_value"))
  }

  /** As-of join expressed as a single interleaved window scan (the
    * scalable formulation: tag both sides, sort once per key, carry the
    * left side forward) rather than a per-row lookup join. For every
    * `rightType` event, attaches the value and timestamp of the latest
    * STRICTLY EARLIER `leftType` event of the same user.
    *
    * One shuffle on `user_id`; no join node at all — `.explain` shows a
    * single Window over one Exchange, which is the plan an as-of join
    * should have at 100 TB (a lookup-join formulation would shuffle both
    * sides AND build a per-key index).
    */
  def asofJoin(events: DataFrame, leftType: String, rightType: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(eventOrder: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    // the (ts, value) pair travels as ONE struct — carrying two
    // independent ignoreNulls columns would let a null-valued left
    // event split the pair: its ts is skipped by the value column but
    // not the ts column, pairing an older event's value with a newer
    // event's timestamp (asofJoinTables fixed this the same way)
    val leftPair = when(col("event_type") === leftType,
      struct(col("ts_us").as("t"), col("value").as("v")))
    withTsUs(events)
      .where(col("event_type").isin(leftType, rightType))
      .withColumn("__asof", last(leftPair, ignoreNulls = true).over(w))
      .where(col("event_type") === rightType)
      .select(col("event_id"), col("user_id"), col("ts_us").as("ts"),
        col("value"), col("__asof")("v").as("asof_value"),
        col("__asof")("t").as("asof_ts"))
  }

  /** Tumbling-window rollup per event type: count / decimal sum / min /
    * max of `value` per `widthUs` bucket. Pure groupBy — partial
    * aggregation map-side, one shuffle on (type, bucket); the natural
    * downsampling query over a µs-keyed store.
    */
  def tumblingRollup(events: DataFrame, widthUs: Long): DataFrame = {
    require(widthUs > 0, s"widthUs must be positive, got $widthUs")
    // floor bucketing (pmod, not %): truncate-toward-zero would put a
    // pre-epoch event in the bucket STARTING AFTER it and diverge from
    // rollupWindows, this operator's declarative twin (window() floors)
    withTsUs(events)
      .withColumn("bucket_ts", col("ts_us") - pmod(col("ts_us"), lit(widthUs)))
      .groupBy(col("event_type"), col("bucket_ts"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(Dec)).cast("double").as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
  }

  /** Regular-grid downsample with forward fill: per event type, one row
    * per `stepUs` tick from the type's first tick to its last, carrying
    * the latest observed value forward into empty ticks.
    *
    * Shape: (1) one groupBy collapses events to at most one row per
    * occupied tick (`max_by` keeps the in-tick latest); (2) the tick grid
    * generates from each type's min/max via `sequence` — grid size is
    * (span / step) per type, independent of event count, so the explode
    * is bounded by time span, not data volume; (3) a TWO-PHASE forward
    * fill: the tick axis is cut into `chunkTicks`-tick chunks, each
    * chunk fills locally under a (type, chunk) window, and the value a
    * chunk must inherit from its past comes from a boundary pass over
    * the per-chunk last-known values — a table with one row per chunk
    * (∝ span, thousands of rows at any data volume), never the series
    * itself. `event_type` has a handful of values, so a plain per-type
    * fill window would sort EVERY tick of a type through one task; the
    * chunked lowering keeps the per-task slice bounded by `chunkTicks`
    * regardless of how long the series runs (same two-phase pattern as
    * `Packing.withRunningOffset`).
    */
  def gapFill(events: DataFrame, stepUs: Long,
      chunkTicks: Int = 256,
      naiveMaxRows: Long = TwoPhase.NaiveMaxRows): DataFrame = {
    require(stepUs > 0, s"stepUs must be positive, got $stepUs")
    require(chunkTicks > 0, s"chunkTicks must be positive, got $chunkTicks")
    val chunkUs = Math.multiplyExact(stepUs, chunkTicks.toLong)
    // every grid/boundary join keys on a STRUCT-wrapped type ("__k") so
    // a NULL event_type series — its own partition under a window — is
    // filled like any other instead of dropping through the equi-joins
    val ev = withTsUs(events)
      .withColumn("tick", col("ts_us") - pmod(col("ts_us"), lit(stepUs)))
      .withColumn("__k", struct(col("event_type")))
    val perTick = ev.groupBy(col("__k"), col("tick"))
      .agg(max_by(col("value"), struct(eventOrder: _*)).as("tick_value"))
    val span = ev.groupBy(col("__k"))
      .agg(min(col("tick")).as("t0"), max(col("tick")).as("t1"))
    // ADAPTIVE: the fill window runs over the tick GRID, so the probe is
    // the largest per-type tick count (from the already-aggregated span
    // table — a types-sized collect), not the event count. When every
    // grid fits one task (naiveMaxRows <= 0 forces the chunked form,
    // Long.MaxValue the plain form — no probe either way), a single
    // per-type fill window needs no boundary pass. Stats-gated like
    // TwoPhase.useChunked: past the byte budget no probe job runs
    // (chunked is correct at every scale); under it the span scan is
    // budget-bounded by the same estimate.
    val naive =
      if (naiveMaxRows <= 0) false
      else if (naiveMaxRows == TwoPhase.ProbeHint.Naive) true
      else !TwoPhase.memoProbe(events, s"gapFill|$stepUs|$naiveMaxRows", { () =>
        TwoPhase.statsBytes(events) > TwoPhase.ProbeByteBudget || {
          val r = span.agg(max((col("t1") - col("t0")) / stepUs + 1)).collect()(0)
          !(r.isNullAt(0) || r.getDouble(0) <= naiveMaxRows.toDouble)
        }
      })
    if (naive) {
      val fillW = Window.partitionBy(col("__k")).orderBy(col("tick"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      return span.select(col("__k"),
          explode(sequence(col("t0"), col("t1"), lit(stepUs))).as("tick"))
        .join(perTick, Seq("__k", "tick"), "left")
        .withColumn("value",
          last(col("tick_value"), ignoreNulls = true).over(fillW))
        .withColumn("filled", col("tick_value").isNull)
        .select(col("__k.event_type").as("event_type"), col("tick"),
          col("value"), col("filled"))
    }
    val grid = span.select(col("__k"),
        explode(sequence(col("t0"), col("t1"), lit(stepUs))).as("tick"))
      .withColumn("__chunk", chunkOf(col("tick"), chunkUs))
    // phase 1: last OBSERVED (non-null) value per occupied chunk
    val chunkLast = perTick.filter(col("tick_value").isNotNull)
      .groupBy(col("__k"),
        chunkOf(col("tick"), chunkUs).as("__chunk"))
      .agg(max_by(col("tick_value"), col("tick")).as("__cl"))
    // boundary pass: what each chunk inherits from strictly-earlier
    // chunks — computed over the chunk GRID (so runs of empty chunks
    // still inherit), one row per chunk per type
    val chunkGrid = span.select(col("__k"),
      explode(sequence(chunkOf(col("t0"), chunkUs),
        chunkOf(col("t1"), chunkUs))).as("__chunk"))
    val wCarry = Window.partitionBy(col("__k")).orderBy(col("__chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = chunkGrid.join(chunkLast, Seq("__k", "__chunk"), "left")
      .withColumn("__carry", last(col("__cl"), ignoreNulls = true).over(wCarry))
      .select(col("__k"), col("__chunk"), col("__carry"))
    // phase 2: local fill within each (type, chunk), fall back to the
    // inherited boundary value before the chunk's first observation
    val fill = Window.partitionBy(col("__k"), col("__chunk"))
      .orderBy(col("tick"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perTick, Seq("__k", "tick"), "left")
      .join(carry, Seq("__k", "__chunk"), "left")
      .withColumn("value", coalesce(
        last(col("tick_value"), ignoreNulls = true).over(fill),
        col("__carry")))
      .withColumn("filled", col("tick_value").isNull)
      .select(col("__k.event_type").as("event_type"), col("tick"),
        col("value"), col("filled"))
  }

  /** Sessionization via Spark's native `session_window` — the declarative
    * twin of [[sessionize]] that runs unchanged over BATCH and STREAMING
    * frames (Catalyst plans the session merge; with `withWatermark`
    * upstream, Structured Streaming emits each session once it can no
    * longer grow). Differences from [[sessionize]], by definition of the
    * built-in: `session_end` here is last-event + gap (window end), not
    * the last event's timestamp, and sessions are not numbered.
    *
    * `tsCol` must be a timestamp-typed column. One shuffle on the
    * session-window key; streaming state is the store's session index.
    */
  def sessionWindows(events: DataFrame, tsCol: Column, gap: String): DataFrame =
    events
      .groupBy(session_window(tsCol, gap), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(Dec)).cast("double").as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start"),
        unix_micros(col("session_window.end")).as("session_end"),
        col("n_events"), col("sum_value"))

  /** Trailing moving aggregate per event type: for every event, the
    * count and mean of `value` over the preceding `windowUs` (inclusive).
    *
    * TWO-PHASE CHUNKED lowering: `event_type` has a handful of values,
    * so a plain per-type RANGE window would sort every event of a type —
    * the whole 100-TB series — through ONE task. Instead the time axis
    * is cut into chunks of `chunkFactor × windowUs`; every event is
    * routed to its own chunk, and events within `windowUs` of a chunk's
    * end are REPLICATED into the next chunk as context-only rows (frame
    * members there, never outputs). Because a trailing frame of width W
    * reaches at most W behind a chunk boundary, each (type, chunk)
    * partition then holds every frame member its output rows need —
    * identical results, per-task work bounded by the chunk span,
    * replication overhead ≤ 1/chunkFactor.
    *
    * Within each (type, chunk) slice the frame is computed by an O(n)
    * SLIDING-DEQUE KERNEL (sorted mapPartitions, the StatefulKernel
    * shape), NOT a RANGE window: Spark's sliding window frame
    * re-aggregates its buffer as rows leave, which is O(rows × frame
    * width) — measured 100x-probe pathology: at 10M events the per-type
    * frame holds thousands of rows and the windowed form ran minutes
    * where the kernel runs seconds. The kernel adds each row once and
    * retracts it once; sums ride exact DECIMAL(38,6) arithmetic
    * (BigDecimal mirrors Spark's double→decimal HALF_UP cast), so
    * retraction is exact and results match the window bit-for-bit —
    * pinned by the randomized differential spec. The below-threshold
    * naive branch keeps the codegen'd RANGE window: its frames are
    * small at the densities where the adaptive probe selects it.
    */
  def movingAggregate(events: DataFrame, windowUs: Long,
      chunkFactor: Int = 4,
      naiveMaxRows: Long = TwoPhase.NaiveMaxRows): DataFrame = {
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    require(chunkFactor >= 1, s"chunkFactor >= 1, got $chunkFactor")
    val chunkUs = Math.multiplyExact(windowUs, chunkFactor.toLong)
    val ev0 = withTsUs(events)
    // the output schema AND semantics are branch-independent: (event_id
    // long, event_type string, ts long, value double, win_n long,
    // win_avg double) — the kernel's encoder types, which the naive
    // branch normalizes to as well, and BOTH branches aggregate the
    // value AS A DOUBLE (the kernel must: its rows ride a Double
    // encoder — so the naive branch casts before its decimal sum too,
    // or a >2^53 long value would sum differently per branch). Ids are
    // gated to long-safe types: a lossy/saturating cast must never
    // silently corrupt ids when data growth flips the branch.
    locally {
      import org.apache.spark.sql.types._
      val idT = ev0.schema("event_id").dataType
      val idOk = idT match {
        case ByteType | ShortType | IntegerType | LongType => true
        case d: DecimalType => d.scale == 0 && d.precision <= 18 // fits long
        case _ => false
      }
      require(idOk,
        s"movingAggregate needs a long-safe event_id, got $idT")
      val vT = ev0.schema("value").dataType
      require(vT.isInstanceOf[NumericType],
        s"movingAggregate needs a numeric value, got $vT")
    }
    // ADAPTIVE: when every type's series fits one task (plan-time
    // probe; naiveMaxRows <= 0 forces the chunked form), the plain
    // per-type RANGE window computes the identical frame with no
    // routing/replication pass — same decimal slide, same division
    if (!TwoPhase.useChunked(ev0, Seq(col("event_type")), naiveMaxRows)) {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ts_us")).rangeBetween(-windowUs, 0)
      return ev0
        .withColumn("win_n", count(lit(1)).over(w))
        .withColumn("win_avg",
          // double FIRST (the kernel's value representation), then the
          // exact decimal slide: branch parity over any numeric input
          sum(col("value").cast("double").cast(Dec)).over(w)
            .cast("double") / col("win_n"))
        .select(col("event_id").cast("long").as("event_id"),
          col("event_type").cast("string").as("event_type"),
          col("ts_us").as("ts"), col("value").cast("double").as("value"),
          col("win_n"), col("win_avg"))
    }
    val ev = ev0.withColumn("__chunk", chunkOf(col("ts_us"), chunkUs))
    // one scan: each row lands in its own chunk, plus the next chunk as
    // context when its trailing-W shadow crosses the boundary
    val routed = ev.select(col("*"), explode(
        when(pmod(col("ts_us"), lit(chunkUs)) >= chunkUs - windowUs,
          array(struct(col("__chunk").as("c"), lit(false).as("ctx")),
            struct((col("__chunk") + 1).as("c"), lit(true).as("ctx"))))
          .otherwise(array(struct(col("__chunk").as("c"), lit(false).as("ctx"))))
        ).as("__r"))
      .withColumn("__chunk", col("__r.c"))
      .withColumn("__ctx", col("__r.ctx"))
      .drop("__r")
    // one Dataset plan: exchange on (type, chunk) → in-partition sort →
    // the deque kernel; the sort order (type, chunk, ts, id) lets one
    // task hold several (type, chunk) groups and reset state between them
    val sp = events.sparkSession
    import sp.implicits._
    val W = windowUs
    val kin = routed.select(
        col("event_id").cast("long").as("event_id"),
        col("event_type").cast("string").as("event_type"),
        col("ts_us").cast("long").as("ts_us"),
        col("value").cast("double").as("value"),
        col("__chunk").cast("long").as("chunk"),
        col("__ctx").as("ctx"))
      .as[MovIn]
    val kpart = graft.core.Partitioning
      .pinned(kin, col("event_type"), col("chunk"))
      .sortWithinPartitions(col("event_type"), col("chunk"), col("ts_us"),
        col("event_id"))
    kpart.mapPartitions(slidingKernel(_, W)).toDF()
    // win_avg is NOT rounded: the decimal sum is exact, so the double
    // division is bit-identical on any engine — while rounding a value
    // that lands exactly on a half-way digit (e.g. 64.0153125 at 6
    // places) diverges between HALF_UP and HALF_EVEN engines
  }

  private[pipeline] final case class MovIn(event_id: Long,
      event_type: String, ts_us: Long, value: Option[Double], chunk: Long,
      ctx: Boolean)
  private[pipeline] final case class MovOut(event_id: Long,
      event_type: String, ts: Long, value: Option[Double], win_n: Long,
      win_avg: Option[Double])

  /** O(n) trailing-frame slide over one sorted partition: every row
    * enters the deque once and retracts once. The RANGE-frame tie rule
    * is preserved by ingesting each equal-timestamp RUN whole before any
    * of its rows emits (a frame's upper bound is the row's ts VALUE, so
    * later rows at the same ts are frame members too). Decimal adds and
    * retracts are exact, so the running sum equals the window's
    * aggregated sum regardless of slide order; the per-value rounding
    * mirrors Spark's double→decimal(38,6) HALF_UP cast. */
  private def slidingKernel(rows: Iterator[MovIn],
      windowUs: Long): Iterator[MovOut] = {
    val it = rows.buffered
    val out = scala.collection.mutable.Queue.empty[MovOut]
    val deque = new java.util.ArrayDeque[(Long, java.math.BigDecimal)]()
    var sum = java.math.BigDecimal.ZERO
    var defined = 0L
    var count = 0L
    var curType: String = null
    var curChunk = 0L
    var inGroup = false
    def sameGroup(r: MovIn): Boolean =
      inGroup && r.chunk == curChunk && r.event_type == curType
    // mirrors the non-ANSI double→decimal(38,6) cast EXACTLY, including
    // its null cases: NaN/±Inf and magnitudes past 32 integer digits
    // cast to NULL in the window branch, so they must leave the running
    // sum (and `defined`) here too — BigDecimal.valueOf(NaN) would
    // throw, and an overflowing value would silently diverge.
    // (the overflow test runs in the double domain: |v| >= 1e32 is
    // exactly "more than 32 integer digits", i.e. precision > 38 at
    // scale 6 — no BigDecimal built for a value the cast would null)
    def dec(v: Double): java.math.BigDecimal =
      if (!java.lang.Double.isFinite(v) || math.abs(v) >= 1e32) null
      else java.math.BigDecimal.valueOf(v)
        .setScale(6, java.math.RoundingMode.HALF_UP)
    def fill(): Unit = while (out.isEmpty && it.hasNext) {
      if (!sameGroup(it.head)) {
        deque.clear(); sum = java.math.BigDecimal.ZERO
        defined = 0L; count = 0L
        curType = it.head.event_type; curChunk = it.head.chunk
        inGroup = true
      }
      val ts = it.head.ts_us
      // retract rows that left the trailing frame [ts - W, ts]
      while (!deque.isEmpty && deque.peekFirst()._1 < ts - windowUs) {
        val (_, bd) = deque.pollFirst()
        count -= 1
        if (bd != null) { sum = sum.subtract(bd); defined -= 1 }
      }
      // ingest the whole equal-ts run, then emit its non-context rows
      val run = scala.collection.mutable.ArrayBuffer.empty[MovIn]
      while (it.hasNext && sameGroup(it.head) && it.head.ts_us == ts) {
        val r = it.next()
        val bd = r.value.map(dec).orNull
        deque.addLast((ts, bd))
        count += 1
        if (bd != null) { sum = sum.add(bd); defined += 1 }
        run += r
      }
      for (r <- run if !r.ctx)
        out += MovOut(r.event_id, r.event_type, ts, r.value, count,
          if (defined == 0) None else Some(sum.doubleValue / count))
    }
    new Iterator[MovOut] {
      def hasNext: Boolean = { fill(); out.nonEmpty }
      def next(): MovOut = { fill(); out.dequeue() }
    }
  }

  /** Discrete derivative per event type: value delta over time delta
    * (per second) between consecutive events. Events sharing a timestamp
    * order by event_id; a zero gap yields a null rate rather than ±Inf.
    *
    * TWO-PHASE CHUNKED lowering (same motivation as [[movingAggregate]]:
    * a handful of event types must not serialize a 100-TB series through
    * one per-type task). The time axis is cut into `chunkUs` chunks;
    * phase 1 collapses each occupied (type, chunk) to its LAST event — a
    * boundary table with one row per occupied chunk, ∝ span not data —
    * and a per-type lag over that tiny table hands every chunk the
    * newest event strictly before it (runs of empty chunks fall through
    * naturally, because only occupied chunks exist in the table).
    * Phase 2 lags within each (type, chunk) partition and falls back to
    * the inherited boundary event for the chunk's first row. The lag
    * pair travels as a (ts_us, value) struct so "no previous row" stays
    * distinguishable from "previous value is NULL".
    */
  def derivative(events: DataFrame,
      chunkUs: Long = 86400000000L,
      naiveMaxRows: Long = TwoPhase.NaiveMaxRows): DataFrame = {
    require(chunkUs > 0, s"chunkUs must be positive, got $chunkUs")
    val ev0 = withTsUs(events)
    // shared tail: rate from the (ts_us, value) struct of the previous row
    def rates(withPrev: DataFrame): DataFrame = withPrev
      .where(col("__prev").isNotNull)
      .withColumn("__dt", col("ts_us") - col("__prev.ts_us"))
      .withColumn("rate",
        when(col("__dt") > 0, round((col("value") - col("__prev.value")) /
          (col("__dt").cast("double") / 1e6), 6)))
      .select(col("event_id"), col("event_type"), col("ts_us").as("ts"),
        col("value"), col("rate"))
    // ADAPTIVE: when every type's series fits one task (plan-time
    // probe; naiveMaxRows <= 0 forces the chunked form), a plain
    // per-type lag computes the identical previous row with no
    // boundary pass
    if (!TwoPhase.useChunked(ev0, Seq(col("event_type")), naiveMaxRows)) {
      val w = Window.partitionBy(col("event_type")).orderBy(eventOrder: _*)
      return rates(ev0.withColumn("__prev",
        lag(struct(col("ts_us"), col("value")), 1).over(w)))
    }
    // the boundary join keys on a STRUCT-wrapped type so a NULL
    // event_type series — its own partition under a window — inherits
    // across chunks instead of losing each chunk's first row
    val ev = ev0
      .withColumn("__chunk", chunkOf(col("ts_us"), chunkUs))
      .withColumn("__k", struct(col("event_type")))
    val bounds = ev.groupBy(col("__k"), col("__chunk"))
      .agg(max_by(struct(col("ts_us"), col("value")),
        struct(eventOrder: _*)).as("__last"))
    val wB = Window.partitionBy(col("__k")).orderBy(col("__chunk"))
    val inherited = bounds
      .withColumn("__prev0", lag(col("__last"), 1).over(wB))
      .select(col("__k"), col("__chunk"), col("__prev0"))
    val wC = Window.partitionBy(col("__k"), col("__chunk"))
      .orderBy(eventOrder: _*)
    val prevRow = coalesce(
      lag(struct(col("ts_us"), col("value")), 1).over(wC), col("__prev0"))
    rates(ev.join(inherited, Seq("__k", "__chunk"), "left")
      .withColumn("__prev", prevRow))
  }

  /** Interval join at scale: pairs each `leftType` event with every
    * `rightType` event of the SAME user whose timestamp falls within
    * `[ts - beforeUs, ts + afterUs]`. A naive θ-join plans a nested-loop
    * cartesian; this lowers to an EQUI-join by quantizing time into
    * buckets of width `beforeUs + afterUs`: each left event explodes to
    * its (at most 3) candidate buckets, the right side maps to one, the
    * join runs hash-partitioned on (user, bucket), and the exact range
    * predicate filters the candidates. Shuffle volume is linear in the
    * event count times a small constant — no quadratic node at any scale.
    */
  def intervalJoin(events: DataFrame, leftType: String, rightType: String,
      beforeUs: Long, afterUs: Long): DataFrame = {
    require(beforeUs >= 0 && afterUs >= 0,
      s"interval bounds must be non-negative, got [$beforeUs, $afterUs]")
    // checked add FIRST: bounds whose sum overflows Long must report
    // overflow, not the misleading zero-width message below
    val width = Math.addExact(beforeUs, afterUs)
    // width 0 would make every pmod NULL (non-ANSI x % 0) and silently
    // return zero rows; an exact-ts pairing is an equi-join, not this
    require(width > 0, "zero-width interval: join on ts equality instead")
    val ev = withTsUs(events)
    val left = ev.where(col("event_type") === leftType)
      .select(col("user_id"), col("event_id").as("l_id"),
        col("ts_us").as("l_ts"),
        explode(sequence(
          (col("ts_us") - beforeUs) - pmod(col("ts_us") - beforeUs, lit(width)),
          (col("ts_us") + afterUs) - pmod(col("ts_us") + afterUs, lit(width)),
          lit(width))).as("bucket"))
    val right = ev.where(col("event_type") === rightType)
      .select(col("user_id"), col("event_id").as("r_id"),
        col("ts_us").as("r_ts"),
        (col("ts_us") - pmod(col("ts_us"), lit(width))).as("bucket"))
    left.join(right, Seq("user_id", "bucket"))
      .where(col("r_ts") >= col("l_ts") - beforeUs &&
        col("r_ts") <= col("l_ts") + afterUs)
      .select(col("user_id"), col("l_id"), col("r_id"),
        (col("r_ts") - col("l_ts")).as("delta_us"))
    // no dedup needed: the right side maps to exactly ONE bucket, so each
    // (left, right) pair joins at most once
  }

  /** Per-type linear trend (least-squares slope of value over time) —
    * the drift-detection signal monitoring fits per metric:
    * (event_type, n, slope, intercept). x is INTEGER MICROSECONDS since
    * the type's first event; Σx/Σx² accumulate as DECIMAL(38,0) and
    * Σy/Σxy as DECIMAL(38,6) — exact, order-independent, inside 38
    * digits for month-scale spans — and only the final closed-form
    * arithmetic runs in doubles (each sum cast once, correctly rounded,
    * so both engines compute bit-identical slopes before the output
    * rounding; the slope converts to per-second by a final ×1e6). One
    * map-side-combined groupBy; no window, no second pass.
    */
  def trendSlope(events: DataFrame): DataFrame = {
    val ev = withTsUs(events)
    val tmin = ev.groupBy("event_type").agg(min("ts_us").as("tmin"))
    // x stays in integer µs (decimal scale 0) — NO decimal division
    // anywhere, whose scale rules differ across engines; Σx² ≤ ~7e30
    // fits 38 digits for month-scale spans
    val d = ev.join(broadcast(tmin), "event_type")
      .withColumn("x", (col("ts_us") - col("tmin")).cast("decimal(38,0)"))
      .withColumn("y", col("value").cast("decimal(38,6)"))
    val m = d.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum("x").cast("double").as("sx"),
      sum("y").cast("double").as("sy"),
      sum(col("x") * col("y")).cast("double").as("sxy"),
      sum(col("x") * col("x")).cast("double").as("sxx"))
    val nD = col("n").cast("double")
    val slopeUs = (nD * col("sxy") - col("sx") * col("sy")) /
      (nD * col("sxx") - col("sx") * col("sx"))
    m.select(col("event_type"), col("n"),
      round(slopeUs * lit(1e6), 8).as("slope"), // per second
      round((col("sy") - slopeUs * col("sx")) / nD, 8).as("intercept"))
  }

  /** Robust anomaly flags via MAD (median absolute deviation): events
    * whose value sits more than `k`·MAD from their type's MEDIAN. Unlike
    * the 3σ z-score (whose mean and σ are themselves dragged by the
    * outliers being hunted), median/MAD have a 50% breakdown point — the
    * robust variant for heavy-tailed telemetry. Two exact `percentile`
    * passes (each shuffles one counts-map entry per distinct value per
    * type, not per row) broadcast back onto the stream; flagging is
    * map-only.
    */
  def madAnomalies(events: DataFrame, k: Double): DataFrame = {
    val ev = withTsUs(events)
    val med = ev.groupBy("event_type")
      .agg(percentile(col("value"), lit(0.5)).as("med"))
    val mad = ev.join(broadcast(med), "event_type")
      .groupBy("event_type", "med")
      .agg(percentile(abs(col("value") - col("med")), lit(0.5)).as("mad"))
    ev.join(broadcast(mad), "event_type")
      .where(col("mad") > 0 && abs(col("value") - col("med")) > lit(k) * col("mad"))
      .select(col("event_id"), col("event_type"), col("ts_us").as("ts"),
        col("value"), round(col("med"), 6).as("med"),
        round(col("mad"), 6).as("mad"))
  }

  /** Active users per tumbling period: (period_ts, active_users) with an
    * EXACT distinct count — one shuffle carrying a row per distinct
    * (period, user), which is the right exact plan while
    * period-cardinality × users fits the cluster; at the scale where it
    * doesn't, swap the aggregate for `approx_count_distinct` (HLL++,
    * fixed memory — [[Analytics.approxDistinctPerGroup]]) at the call
    * site. The standard DAU/WAU panel signal.
    */
  def activeUsers(events: DataFrame, periodUs: Long): DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    val ev = withTsUs(events)
    ev.groupBy((col("ts_us") - pmod(col("ts_us"), lit(periodUs)))
        .as("period_ts"))
      .agg(countDistinct(col("user_id")).as("active_users"),
        count(lit(1)).as("n_events"))
  }

  /** Sliding-window active users (the WAU curve): for every period P
    * (with data at or after it), the distinct users active in the
    * trailing `nPeriods` periods ending at P. Computed EXACTLY without
    * any sliding-window state: the compact distinct (user, period) table
    * (one row per user-period, map-side combined) explodes each row into
    * the ≤`nPeriods` windows it contributes to, then one distinct count
    * per window — shuffle volume ∝ user-periods × nPeriods, independent
    * of raw event count. Windows past the last observed period are
    * trimmed (they'd be partial).
    */
  def slidingActiveUsers(events: DataFrame, periodUs: Long,
      nPeriods: Int): DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    require(nPeriods > 0, s"nPeriods must be positive, got $nPeriods")
    val ev = withTsUs(events)
    val userPeriods = ev.select(
        (col("ts_us") - pmod(col("ts_us"), lit(periodUs))).as("period"),
        col("user_id"))
      .distinct()
    val mx = userPeriods.agg(max("period").as("mx"))
    userPeriods.crossJoin(broadcast(mx))
      .select(explode(sequence(col("period"),
          least(col("period") + lit((nPeriods - 1) * periodUs), col("mx")),
          lit(periodUs))).as("window_end"),
        col("user_id"))
      .groupBy("window_end")
      .agg(countDistinct("user_id").as("active_users"))
  }

  /** Streaming twin of [[intervalJoin]] for the attribution case: a
    * watermarked STREAM-STREAM inner join pairing each click with the
    * same user's purchases within `maxLag` after it. Spark's native
    * stream-stream join machinery does exactly what the batch bucketing
    * hand-builds: state is hash-partitioned on the equi-key (`user_id`),
    * the event-time range condition bounds how long each side's rows are
    * retained, and the two watermarks let the state store evict
    * out-of-range rows — bounded state on unbounded streams.
    *
    * Both inputs need (`user_id`, `event_id`, `ts` TIMESTAMP) and a
    * `withWatermark("ts", …)` no looser than `maxLag` on the click side
    * (that delay is what bounds click-state retention). Emits
    * (user_id, click_id, purchase_id, lag_us) as matches arrive.
    */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame,
      maxLag: String): DataFrame = {
    val c = clicks.select(col("user_id"), col("event_id").as("click_id"),
      col("ts").as("click_ts"))
    val p = purchases.select(col("user_id").as("p_user_id"),
      col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
    c.join(p,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr(s"interval $maxLag"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
          .as("lag_us"))
  }

  /** Ordered funnel analysis: for each user, the timestamp of the first
    * `stages(0)` event, the first `stages(1)` event strictly after it,
    * and so on — the "click then view then purchase, in order" question.
    * Each stage is a whole-partition conditional-min window conditioned
    * on the previous stage's column; all k windows plus the final
    * per-user collapse share ONE user_id exchange. Depth reached =
    * number of non-null stage times.
    */
  def funnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val w = Window.partitionBy(col("user_id")) // whole-partition frame
    var cur = withTsUs(events)
      .where(col("event_type").isin(stages.map(x => x: Any): _*))
      .select(col("user_id"), col("event_type"), col("ts_us"))
      .withColumn("t0",
        min(when(col("event_type") === stages.head, col("ts_us"))).over(w))
    // stage k's min is conditioned on stage k-1's min — a chain of
    // whole-partition window aggregates over ONE user_id exchange (each
    // projection step references the previous step's window column)
    stages.zipWithIndex.drop(1).foreach { case (stage, i) =>
      cur = cur.withColumn(s"t$i",
        min(when(col("event_type") === stage &&
          col(s"t${i - 1}").isNotNull && col("ts_us") > col(s"t${i - 1}"),
          col("ts_us"))).over(w))
    }
    val depth = stages.indices.map(i =>
      when(col(s"t$i").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    // stage times are constant within a user partition: collapse on the
    // SAME key, so the final agg reuses the window's partitioning
    val aggs = stages.indices.map(i => min(col(s"t$i")).as(s"t$i")) :+
      min(depth).cast("int").as("depth")
    cur.groupBy(col("user_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Cohort retention: users cohorted by the period of their FIRST event;
    * one row per (cohort, period offset) with the distinct users active
    * in that offset. Two shuffles — first-seen per user, then the
    * (cohort, offset) distinct-user count; the classic engagement matrix.
    */
  def cohortRetention(events: DataFrame, periodUs: Long): DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    val ev = withTsUs(events)
      .withColumn("period", chunkOf(col("ts_us"), periodUs))
      .select(col("user_id"), col("period"))
    val cohorts = ev.groupBy(col("user_id"))
      .agg(min(col("period")).as("cohort"))
    ev.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort"), (col("period") - col("cohort")).as("offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** OHLC bars: per (event_type, bucket), the opening (first), highest,
    * lowest, and closing (last) value — the canonical financial/telemetry
    * downsample. Same one-shuffle partial-agg shape as [[tumblingRollup]];
    * first/last resolve by (ts, event_id) via `min_by`/`max_by`, so bars
    * are deterministic under ties and any parallelism.
    */
  def ohlcBars(events: DataFrame, widthUs: Long): DataFrame = {
    require(widthUs > 0, s"widthUs must be positive, got $widthUs")
    val ord = struct(eventOrder: _*)
    withTsUs(events)
      .withColumn("bucket_ts", col("ts_us") - pmod(col("ts_us"), lit(widthUs)))
      .groupBy(col("event_type"), col("bucket_ts"))
      .agg(
        min_by(col("value"), ord).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), ord).as("close"),
        count(lit(1)).as("n_events"))
  }

  /** General two-table as-of join: each `right` row picks up the latest
    * `left` row with the same `keyCol` whose `tsCol` is <= (or < with
    * `strict`) its own. Tag both inputs, sort once per key, carry the
    * left value forward — a lookup-join formulation would shuffle both
    * sides AND build a per-key index. `valueCol` names the left column
    * to attach (as `asof_value`, with its timestamp as `asof_ts`).
    *
    * ADAPTIVE two-phase lowering: below the `naiveMaxRows` probe bound,
    * one interleaved keyed window scan (no join node at all, same as
    * [[asofJoin]]); above it — the quotes→trades shape this operator
    * documents has a few hundred symbols, so one symbol's history must
    * not sort through one task — the µs axis chunks on `chunkUs` and the
    * LOCF carry crosses chunks via a boundary table ∝ time span (the
    * [[gapFill]] pattern). Differential specs pin the branches and the
    * strict/inclusive matrix identical.
    */
  def asofJoinTables(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, valueCol: String, strict: Boolean = true,
      chunkUs: Long = 86400000000L,
      naiveMaxRows: Long = TwoPhase.NaiveMaxRows): DataFrame = {
    require(chunkUs > 0, s"chunkUs must be positive, got $chunkUs")
    val l = left.select(col(keyCol), col(tsCol).as("__ts"),
      col(valueCol).cast("double").as("__v"), lit(0).as("__side"))
    val r = right.select(col(keyCol), col(tsCol).as("__ts"),
      lit(null).cast("double").as("__v"), lit(1).as("__side"))
    // left rows order before right rows at an equal timestamp iff the
    // match is inclusive (non-strict); among equal-timestamp LEFT rows
    // the largest value wins (ties totalized — both branches and the
    // boundary max_by agree bit-for-bit). The carried (ts, value) pair
    // travels as ONE struct, so a null-valued left row still advances
    // asof_ts with its own null rather than splitting the pair.
    val sideOrd = if (strict) col("__side").desc else col("__side").asc
    val tieOrd = Seq(col("__ts").asc, sideOrd, col("__v").asc_nulls_first)
    val frameEnd = if (strict) -1L else 0L
    val leftPair = when(col("__side") === 0, struct(col("__ts"), col("__v")))
    def finish(withAsof: DataFrame): DataFrame = withAsof
      .where(col("__side") === 1)
      .select(col(keyCol), col("__ts").as(tsCol),
        col("__asof.__v").as("asof_value"), col("__asof.__ts").as("asof_ts"))
    val u = l.unionByName(r)
    // ADAPTIVE: when every key's interleaved history fits one task
    // (plan-time probe; naiveMaxRows <= 0 forces the chunked form), one
    // keyed window scan carries the left value forward — no join node
    if (!TwoPhase.useChunked(u, Seq(col(keyCol)), naiveMaxRows)) {
      val w = Window.partitionBy(col(keyCol)).orderBy(tieOrd: _*)
        .rowsBetween(Window.unboundedPreceding, frameEnd)
      return finish(u.withColumn("__asof",
        last(leftPair, ignoreNulls = true).over(w)))
    }
    // TWO-PHASE CHUNKED (the gapFill LOCF pattern): the documented shape
    // is quotes→trades over hundreds of symbols — low key cardinality,
    // where the naive window would sort one symbol's entire 100-TB
    // history through ONE task. Cut the µs axis into `chunkUs` chunks;
    // phase 1 collapses each occupied (key, chunk) to its LAST left
    // event (ties by value, same rule) and a carry pass over the chunk
    // table — one row per occupied chunk, ∝ span not data — hands every
    // chunk the newest left event strictly before it (equal timestamps
    // land in the SAME chunk, so the cross-chunk carry never meets the
    // strict/inclusive tie rule). Phase 2 runs the identical window
    // within each (key, chunk), falling back to the inherited pair.
    val ev = u.withColumn("__chunk", chunkOf(col("__ts"), chunkUs))
      .withColumn("__k", struct(col(keyCol)))
    val bounds = ev.filter(col("__side") === 0)
      .groupBy(col("__k"), col("__chunk"))
      .agg(max_by(struct(col("__ts"), col("__v")),
        struct(col("__ts"), col("__v"))).as("__cl"))
    // carry over ALL occupied chunks (right-only chunks must inherit
    // through runs of chunks with no left events)
    val allChunks = ev.select(col("__k"), col("__chunk")).distinct()
    val wCarry = Window.partitionBy(col("__k")).orderBy(col("__chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = allChunks.join(bounds, Seq("__k", "__chunk"), "left")
      .withColumn("__carry",
        last(col("__cl"), ignoreNulls = true).over(wCarry))
      .select(col("__k"), col("__chunk"), col("__carry"))
    val wC = Window.partitionBy(col("__k"), col("__chunk"))
      .orderBy(tieOrd: _*)
      .rowsBetween(Window.unboundedPreceding, frameEnd)
    finish(ev.join(carry, Seq("__k", "__chunk"), "left")
      .withColumn("__asof", coalesce(
        last(leftPair, ignoreNulls = true).over(wC), col("__carry"))))
  }

  /** Tumbling rollup via the native `window` function — the declarative
    * twin of [[tumblingRollup]] that runs unchanged over batch and
    * streaming frames (with `withWatermark` upstream, each bucket emits
    * once it can no longer receive data). `tsCol` must be
    * timestamp-typed; output buckets are epoch-µs starts like the batch
    * form.
    */
  def rollupWindows(events: DataFrame, tsCol: Column, width: String): DataFrame =
    events
      .groupBy(window(tsCol, width), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(Dec)).cast("double").as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .select(col("event_type"),
        unix_micros(col("window.start")).as("bucket_ts"),
        col("n_events"), col("sum_value"), col("min_value"), col("max_value"))

  /** Deviation-based anomaly flags: events whose value sits more than
    * `nSigma` sample standard deviations from their type's mean. The
    * moments come from decimal partial sums (sum, sum of squares, count)
    * so mean/σ are order-independent; the per-type moments broadcast back
    * onto the stream (tiny dimension — one row per event type).
    */
  def anomalies(events: DataFrame, nSigma: Double): DataFrame = {
    val moments = withTsUs(events).groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(Dec)).cast("double").as("s1"),
        sum((col("value") * col("value")).cast(Dec)).cast("double").as("s2"))
      .where(col("n") > 1)
      .select(col("event_type"),
        (col("s1") / col("n")).as("mean"),
        sqrt((col("s2") - col("s1") * col("s1") / col("n")) /
          (col("n") - 1)).as("sigma"))
    withTsUs(events)
      .join(broadcast(moments), Seq("event_type"))
      .where(abs(col("value") - col("mean")) > lit(nSigma) * col("sigma"))
      .select(col("event_id"), col("event_type"), col("ts_us").as("ts"),
        col("value"),
        round((col("value") - col("mean")) / col("sigma"), 6).as("z"))
  }
}
