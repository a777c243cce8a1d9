package graft.engine

import graft.core.{EntryPattern, Records}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.control.NonFatal

/** Parquet-backed bucket storage — the Spark-native replacement for the
  * reference's block files (SURVEY §1.3).
  *
  * Layout: `root/bucket=<b>/entry=<e>/dt=<yyyy-MM-dd>/part-*.zstd.parquet`.
  *  - `bucket`/`entry` partitions → entry-glob queries become partition
  *    pruning; `dt` (UTC day of `ts`) partitions → time-range queries prune
  *    files the way the reference's block index prunes blocks
  *    (historical.rs:134-156); parquet row-group min/max on `ts` prunes
  *    within a day.
  *  - zstd data pages ≈ the reference's block-level zstd
  *    (block_manager/compress.rs:23-28).
  *  - writes are append-only; `maxRecordsPerFile` bounds file size like
  *    `max_block_records` rotation (storage.proto:47-63).
  *
  * Duplicate-timestamp conflicts (ts is the record id, storage.proto:38):
  * batch-internal dups always fail; against existing data the check reads
  * only the overlapping (entry × time-range) slice — pushdown makes this a
  * metadata-bounded scan, not a table scan. Belated writes (old ts) land in
  * their historical partition with no special casing
  * (entry/write_record.rs:92-160).
  *
  * Local-fs roots: set `spark.hadoop.fs.file.impl` to
  * `org.apache.hadoop.fs.RawLocalFileSystem` on the session. Hadoop's
  * checksummed local fs writes a `.crc` sibling per file, doubling the
  * creates on every many-entry write/rewrite (each local create pays a
  * chmod fork without libhadoop; measured 76 s → 53 s on a 10k-entry
  * write). Pair it with `parquet.page.verify-checksum.enabled=true`:
  * parquet-java WRITES page checksums by default but does not verify
  * them on read unless asked, so the pair keeps an end-to-end integrity
  * check on the payload path; hdfs/s3a schemes are unaffected.
  */
final class BucketStore(val spark: SparkSession, val root: String,
    /** Read-only replica mode — `RS_INSTANCE_ROLE=REPLICA`
      * (cfg.rs:217-228). A replica serves reads over a SHARED tree the
      * primary owns: it never takes the writer lock (the primary holds
      * it), and every mutator is refused with the reference's
      * check_mode error (engine.rs:163-171, 403 forbidden). The parquet
      * table re-lists files per query, so new primary writes become
      * visible without any sync protocol; [[refreshReplica]] invalidates
      * the version-keyed caches (sizes, counts) on the reference's
      * replica-reload cadence (engine/read_only.rs reload_replica,
      * launcher.rs periodical_replica_reload). Shared-tree visibility
      * beyond one process inherits the Hadoop FS's listing semantics —
      * the same contract the reference's replica has over its remote
      * backend. */
    val readOnly: Boolean = false) {
  import BucketStore._

  spark.conf.set("spark.sql.parquet.compression.codec", "zstd")
  spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

  // Cross-process single-writer guard (the reference is single-owner by
  // construction, storage/engine.rs; this ENFORCES the documented
  // contract below): the first instance for this root in this process
  // claims `root/_writer.lock`, later same-process instances attach, a
  // different live process fails fast here. Stale (dead-holder) locks
  // are taken over after WriterLock.staleMs. See [[WriterLock]].
  // A read-only replica never claims it — the primary owns the root.
  if (!readOnly) WriterLock.acquire(root, spark.sparkContext.hadoopConfiguration)

  // A replica read racing the primary's swap must RETRY (readConsistent),
  // never silently drop the renamed-away rows — refuse the conf that
  // would turn the race into data loss before any read runs.
  if (readOnly) require(
    !spark.conf.get("spark.sql.files.ignoreMissingFiles", "false").toBoolean,
    "read-only replica stores require spark.sql.files.ignoreMissingFiles=false: " +
      "with it true, a read racing the primary's partition swap silently " +
      "drops rows instead of retrying (BucketStore.readConsistent)")

  private val lockReleased = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Release this instance's writer-lock reference; the last instance
    * for the root deletes the lock file. Idempotent PER INSTANCE — a
    * double close (nested try/finally, retry wrappers) must not burn a
    * second refcount and release the lock out from under another live
    * same-root instance. Optional — a JVM shutdown hook releases
    * everything on normal exit. */
  def close(): Unit =
    if (!readOnly && lockReleased.compareAndSet(false, true))
      WriterLock.release(root, spark.sparkContext.hadoopConfiguration)

  /** Store-wide mutation lock. Spark's file committer stages every job
    * writing one output path under the same `_temporary/0` directory, so
    * two CONCURRENT append jobs into the store root can delete each
    * other's in-flight task files; the duplicate-ts admission check is
    * also check-then-act. One mutator at a time per store — matching the
    * reference's single-owner storage engine (storage/engine.rs) — while
    * reads never block. At cluster scale the unit of write parallelism is
    * the store root, and a single writer's job is itself parallel across
    * executors, so the lock serializes API calls, not cluster work. */
  private[graft] val writeLock = new Object

  /** Monotone data version: bumped after every mutation (all mutators
    * run through [[mutating]]). Size figures and other derived serving
    * metadata cache against it, so an idle store serves them without
    * re-walking the tree. */
  private val dataVersionCounter = new java.util.concurrent.atomic.AtomicLong(0L)
  def dataVersion: Long = dataVersionCounter.get

  /** Every mutator's lock + version bump in one place: identical locking
    * to `writeLock.synchronized`, then the data version moves so cached
    * figures invalidate. A bump on a failed/no-op mutation is harmless
    * (one spare recompute). */
  private[graft] def mutating[T](f: => T): T = {
    if (readOnly) throw new BucketStore.ReadOnlyStoreException(
      "Cannot perform this operation in read-only mode")
    writeLock.synchronized { try f finally dataVersionCounter.incrementAndGet() }
  }

  /** Replica cache refresh (reload_replica analog): the data table
    * re-lists files per query already, so a refresh only needs to
    * invalidate version-keyed derived figures (store/bucket sizes,
    * counts) so they recompute against the primary's current tree. */
  def refreshReplica(): Unit = { dataVersionCounter.incrementAndGet(); () }

  /** Rewrite epoch: ODD while a partition-swap's visible changes
    * (renames + emptied-dir deletes) are in flight, even when the tree
    * is quiescent. Mutation jobs (the staged rewrite write) run OUTSIDE
    * the odd window — only the cheap rename loop holds it, so the
    * blocking window is milliseconds regardless of data volume. */
  private val rewriteEpochCounter = new java.util.concurrent.atomic.AtomicLong(0L)
  def rewriteEpoch: Long = rewriteEpochCounter.get

  /** Snapshot-or-retry read seam: runs `f` (which must fully materialize
    * its result — collect/count, not a lazy frame) and returns it iff no
    * partition swap overlapped; otherwise retries against the settled
    * tree. An error raised while a swap DID overlap is treated as the
    * race (a reader can observe a renamed-away file mid-swap) and
    * retried; an error with no overlapping swap is real and rethrown.
    * This is the single-process consistency contract — the same scope as
    * the reference's single-owner storage engine, where every reader
    * goes through the owning process (storage/engine.rs). Lazy cursor
    * drains (QueryRegistry.toLocalIterator) intentionally bypass this:
    * a long-lived cursor racing a delete serves rows it already planned,
    * as the reference's cursors do.
    *
    * READ-ONLY REPLICA scope (r19, closing the r18 weak mark): a
    * replica reads the PRIMARY's tree from a second process, where this
    * process's epoch counter can never see the primary's swaps — a read
    * racing the primary's compact/fold/remove rename window surfaced as
    * a spurious failure (and `ignoreMissingFiles=true` would turn it
    * into silent row drops, which the constructor now refuses). On a
    * replica, a missing-file/vanished-partition error IS the race: the
    * swap window is milliseconds of renames, so those errors retry with
    * a short backoff under the same attempt/wait caps. Reference
    * parity: the replica read path skips transient block states
    * (storage/query/historical.rs:138-176). Owning stores keep the
    * strict contract — an FNF with no epoch movement is real and
    * rethrown. */
  def readConsistent[T](f: => T, maxRetries: Int = 50,
      maxWaitMs: Long = 60000L): T = {
    var attempts = 0
    var waitStartNanos = 0L // 0 = not currently waiting on an odd epoch
    var lastEx: Throwable = null // surfaced as the cause when retries exhaust
    while (attempts <= maxRetries) {
      val e0 = rewriteEpochCounter.get
      if ((e0 & 1L) == 0L) {
        waitStartNanos = 0L // a settled epoch is progress: re-arm the wait cap
        try {
          val out = f
          if (rewriteEpochCounter.get == e0) return out
        } catch {
          case NonFatal(ex) if rewriteEpochCounter.get != e0 => // raced: retry
            lastEx = ex
          case NonFatal(ex) if readOnly && isSwapTransient(ex) =>
            // primary's swap window (ms of renames) — settle, retry
            lastEx = ex
            Thread.sleep(5)
          case NonFatal(ex) => throw ex
        }
        attempts += 1
      } else {
        // swap renames/deletes in flight: settle, then read. The window
        // scales with the mutation's affected-partition count (renames +
        // emptied-dir deletes), so the cap is a wedged-swap safety net —
        // generous enough for a many-thousand-partition rewrite on slow
        // storage, finite so a crashed swap (thread killed mid-window)
        // fails readers instead of spinning them forever. Elapsed time is
        // measured with nanoTime deltas — Thread.sleep(1) commonly lasts
        // several ms, so counting iterations would stretch the cap.
        val now = System.nanoTime()
        if (waitStartNanos == 0L) waitStartNanos = now
        else if ((now - waitStartNanos) / 1000000L > maxWaitMs)
          throw new IllegalStateException(
            s"rewrite epoch stuck odd for > $maxWaitMs ms; swap wedged?")
        Thread.sleep(1)
      }
    }
    // the last caught exception rides along as the cause — without it a
    // genuinely failing read (e.g. a replica pointed at a bad root whose
    // errors happen to look swap-transient) surfaces as an opaque
    // "did not settle" with the real failure discarded (ADVICE r19)
    throw new IllegalStateException(
      s"read did not settle after $maxRetries rewrite-racing retries", lastEx)
  }

  /** Is `ex` the missing-file/vanished-partition class a reader can
    * observe while the PRIMARY's partition swap renames files — i.e.
    * retryable on a read-only replica? Walks the cause chain (Spark
    * wraps task failures in SparkException layers) and matches the typed
    * FileNotFoundException plus the listing/planning variants that only
    * carry the PATH_NOT_FOUND error class in the message. Deliberately
    * NOT a bare "does not exist" match (ADVICE r19): analysis errors on
    * a misconfigured replica (nonexistent root, bad view) carry that
    * phrase too and must surface immediately, not after 50 retries. */
  private def isSwapTransient(ex: Throwable): Boolean = {
    var t: Throwable = ex
    var depth = 0
    while (t != null && depth < 12) {
      if (t.isInstanceOf[java.io.FileNotFoundException]) return true
      val m = t.getMessage
      if (m != null && (m.contains("FileNotFoundException") ||
          m.contains("PATH_NOT_FOUND")))
        return true
      t = t.getCause
      depth += 1
    }
    false
  }

  /** Test-only fault injection, invoked at named crash seams inside the
    * mutation machinery: `append:<tree>:staged` (hidden-tree append —
    * staged files written, NOTHING renamed in yet), `overwrite:staged`
    * (partition rewrite — staged tree written, live tree untouched),
    * `overwrite:swapped` (renames + drops landed, extraSwapActions —
    * e.g. the fold's overlay purge — NOT yet run). A hook that throws
    * simulates the process dying at that boundary; specs then open a
    * FRESH store on the same root (cold seq counter, cold overlay
    * count — exactly a restarted process) and assert the recovery
    * contract (OverlayCrashSpec). Production: no-op. */
  @volatile private[graft] var crashSeamForTest: String => Unit = _ => ()

  /** Test hook: run `f` with the rewrite epoch held ODD — a swap window
    * that never settles — so specs can exercise [[readConsistent]]'s
    * wedged-swap cap without a real wedged mutation. */
  private[graft] def holdSwapWindowForTest[T](f: => T): T = {
    rewriteEpochCounter.incrementAndGet()
    try f finally rewriteEpochCounter.incrementAndGet()
  }

  /** Interval usage-traffic counters incremented at the serving-layer
    * choke points (wire writes/reads); drained by
    * [[graft.lifecycle.Lifecycle.flushUsage]] (PR-1474). Internal
    * engine writes (replication sink, `$system` telemetry) are not
    * counted — no telemetry on telemetry. */
  val usage = new UsageCounters

  // ------------- incremental compaction candidates (r19, r18 weak mark)
  //
  // The compaction tick used to FULL-WALK the storage tree every probe
  // (every bucket=*/entry=*/dt=* dir listed per tick, even idle) — O(all
  // partitions) in FS metadata ops per minute, unreachable on an object
  // store at the 10k-entry design point. The write path already knows
  // which (bucket, entry) pairs it touched, so mutators feed a BOUNDED
  // dirty set and compact() probes only those entries' dt dirs; an idle
  // tick costs ZERO listings. The set holds entry pairs (not dt
  // triples) so a marking is one set-add per touched entry, and it is
  // bounded: past `dirtyEntriesCap` distinct pairs it collapses to the
  // all-dirty flag (one full walk amortizes past that fan-out anyway).
  // Boot starts all-dirty — the bootstrap debt walk — and a generic
  // `write(records)` whose entry set the caller didn't declare marks
  // all-dirty too (rare: bulk ingest; wire paths all declare).
  private val dirtyEntriesCap = 4096
  private val dirtyAllEntries = new java.util.concurrent.atomic.AtomicBoolean(true)
  private val dirtyEntrySet =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String)]()

  /** listStatus calls made by the LAST compact() candidate probe — the
    * spec/probe hook pinning per-tick FS cost ∝ touched partitions. */
  private[graft] val lastProbeListings = new java.util.concurrent.atomic.AtomicLong(0L)

  private[graft] def markEntriesDirty(pairs: Iterable[(String, String)]): Unit = {
    if (dirtyAllEntries.get) return
    val it = pairs.iterator
    while (it.hasNext) {
      dirtyEntrySet.add(it.next())
      if (dirtyEntrySet.size > dirtyEntriesCap) { markAllEntriesDirty(); return }
    }
  }

  private[graft] def markAllEntriesDirty(): Unit = {
    dirtyAllEntries.set(true)
    dirtyEntrySet.clear()
  }

  /** Message prefix of the in-job duplicate-key raise on the empty-store
    * write path — matched when re-shaping the job failure back to the
    * admission contract's IllegalArgumentException. */
  private val InBatchDupMarker = "duplicate timestamp within batch:"

  private def dtCol = to_date(timestamp_micros(col("ts")))

  /** The whole store as one logical table (records schema + dt), with
    * the label overlay applied — `labels` reflects every PATCH. */
  def table(): DataFrame = applyOverlay(baseTable())

  def tableOrEmpty(): DataFrame =
    try table()
    catch { case NonFatal(_) => emptyRecords(spark) }

  /** Resolved base-tree plan (schema-pinned scan over `root`) cached per
    * (dataVersion, rewriteEpoch). Building it costs a FULL tree listing —
    * InMemoryFileIndex walks every bucket/entry/dt dir — plus analysis;
    * at the 10k-entry design point that is O(100k) FS metadata calls PER
    * READ (guide §6 file listing), and it was the bulk of the per-request
    * driver-side wall the r19 HTTP workload profile measured (each
    * request re-listed and re-planned an unchanged tree). Keyed on BOTH
    * counters: dataVersion only moves when a mutation EXITS, so a
    * partition swap's renames (mid-mutation) must invalidate via the
    * rewrite epoch — otherwise a reader retrying the swap race would be
    * served the pre-swap file list forever and fail its retries. Internal
    * raw-fs deletes that a SAME mutation then re-reads (the FIFO eviction
    * loop) invalidate explicitly. */
  private val baseTableCache =
    new java.util.concurrent.atomic.AtomicReference[(Long, Long, DataFrame)]()
  /** Cache-rebuild count — observable by specs pinning one-listing-per-version. */
  private[graft] val baseTableBuilds = new java.util.concurrent.atomic.AtomicInteger(0)

  private[graft] def invalidateBaseTable(): Unit = baseTableCache.set(null)

  /** The base parquet tree only — PATCHed labels NOT applied. For
    * key-only internal reads (conflict admission, entry catalog, oldest
    * partition) where the overlay can't change the answer and the join
    * would be waste. Read-only replicas never cache: their counters
    * cannot see the primary's mutations, and the replica contract is a
    * fresh listing per query (refreshReplica only invalidates derived
    * figures). */
  private[graft] def baseTable(): DataFrame = {
    if (readOnly) return freshBaseTable()
    val v0 = dataVersion
    val e0 = rewriteEpoch
    val hit = baseTableCache.get
    if (hit != null && hit._1 == v0 && hit._2 == e0) return hit._3
    val df = freshBaseTable()
    baseTableBuilds.incrementAndGet()
    // install only when nothing moved during the listing — a listing
    // that overlapped a mutation may be partial and must not be keyed
    // as current
    if (dataVersion == v0 && rewriteEpoch == e0)
      baseTableCache.set((v0, e0, df))
    df
  }

  private def freshBaseTable(): DataFrame =
    spark.read.schema(storedSchema).parquet(root)
      .drop("dt") // derived; queries use ts

  private[graft] def baseTableOrEmpty(): DataFrame =
    try baseTable()
    catch { case NonFatal(_) => emptyRecords(spark) }

  // ------------------------------------------------------- label overlay

  /** Label PATCHes land as tiny overlay rows instead of partition
    * rewrites, matching the reference's metadata-only update
    * (storage/entry/update_labels.rs:14-36 rewrites a block descriptor,
    * "payload untouched"). A copy-on-write parquet rewrite would carry
    * the payload column with it — ~1000x write amplification for
    * label-only curation at 10 MB payloads.
    *
    * Layout: `root/_labels/bucket=<b>/entry=<e>/dt=<d>/<part>.parquet` with
    * rows `(bucket, entry, ts, labels, seq)` — the FULL post-patch label
    * map, `seq` monotone per patch so the latest patch wins. The
    * underscore root hides the tree from the base table's partition
    * discovery (batch and streaming alike, same mechanism as `_rewrite`).
    *
    * Read path: when the overlay is empty (the common case) `table()` is
    * the plain base scan — zero overhead. Otherwise a BROADCAST left
    * join applies the latest overlay labels map-side: payload bytes
    * never shuffle, full-payload reads stay scan-shaped. The broadcast
    * is safe because the overlay is bounded: once it exceeds
    * [[overlayFoldThreshold]] rows the next PATCH folds it into the base
    * files (one amortized partition rewrite per ~100k patches).
    *
    * Invariant: overlay rows exist only for LIVE base records. Every
    * base-partition rewrite (fold, removeQuery, removeRecords, lifecycle
    * compress) rewrites effective labels and purges that partition's
    * overlay dirs inside the same swap window; entry/bucket/FIFO deletes
    * drop the mirror overlay dirs. So a removed-then-rewritten timestamp
    * can never resurrect stale labels.
    *
    * Sizing: ~200 B/row → the 100k default folds at ~20 MB broadcast,
    * well inside executor budgets at any corpus size. Test seam. */
  @volatile var overlayFoldThreshold: Long = 100000L

  /** Parallelism for the per-partition fs METADATA ops (rename/mkdirs/
    * delete) inside mutation swaps. The ops are independent per
    * partition dir, but a serial loop makes the swap window — and so
    * both mutation latency and the readers' retry window — scale
    * linearly with the touched-partition count (measured: the rename-in
    * of a ~480-dir patch spent 0.6–1.8 s in pure fs-op latency). posix/
    * HDFS rename stays atomic per dir regardless of issue order, and
    * remote stores (HDFS namenode, object-store metadata layers) want
    * MORE concurrency than local fs, so parallel issue is the
    * scale-correct shape. Test seam (1 = the old serial behavior). */
  @volatile var fsOpParallelism: Int = 32

  /** Run `op` over independent fs items with bounded parallelism. Joins
    * EVERY op before returning — even after failures or an interrupt of
    * the joining thread: a swap must never leave renames in flight past
    * its epoch settle (a straggler landing after the epoch went even
    * would give snapshot readers a torn view the counter can't detect).
    * Every failure is kept: the first is rethrown with the rest
    * suppressed, so a multi-partition failure isn't under-reported.
    * Single-item and parallelism-1 calls run inline. Work is striped
    * over `par` workers on a shared cached daemon pool — mutations are
    * serialized under the store lock, and one swap calls this up to
    * three times inside its latency-sensitive window, so per-call pool
    * construction would re-add fixed cost the parallelism exists to
    * remove. */
  private def parallelFs[T](items: Seq[T])(op: T => Unit): Unit = {
    val par = math.min(fsOpParallelism, items.size)
    if (par <= 1) { items.foreach(op); return }
    val idx = new java.util.concurrent.atomic.AtomicInteger(0)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    // First failure flips this: remaining workers DRAIN the index without
    // calling op (no new renames once the swap is known-broken — each op
    // skipped keeps the partially-applied window narrower), while still
    // joining every in-flight op so nothing lands past the epoch settle.
    val abort = new java.util.concurrent.atomic.AtomicBoolean(false)
    val workers = (1 to par).map(_ => BucketStore.fsOpPool.submit(new Runnable {
      def run(): Unit = {
        var i = idx.getAndIncrement()
        while (i < items.size) {
          if (!abort.get)
            try op(items(i))
            // any failure (VM errors included) flips abort; VM errors
            // get rethrow PRIORITY at the aggregation site below
            catch { case e: Throwable => abort.set(true); failures.add(e): Unit }
          i = idx.getAndIncrement()
        }
      }
    }))
    var interrupted = false
    workers.foreach { f =>
      var joined = false
      while (!joined)
        try { f.get(): Unit; joined = true }
        catch {
          case _: InterruptedException => interrupted = true // keep joining
          case e: java.util.concurrent.ExecutionException => // fatal in worker
            failures.add(e.getCause); joined = true
        }
    }
    if (interrupted) Thread.currentThread().interrupt() // re-assert, post-join
    val it = failures.iterator()
    if (it.hasNext) {
      // a VM error (OOM, stack overflow) outranks ordinary IO failures:
      // surface it as the primary so callers/JVM handlers see it
      import scala.jdk.CollectionConverters._
      val all = failures.asScala.toSeq
      val first = all.collectFirst { case e: VirtualMachineError => e }
        .getOrElse(all.head)
      all.foreach(e => if (e ne first) first.addSuppressed(e))
      throw first
    }
  }

  private def overlayRootPath = new org.apache.hadoop.fs.Path(s"$root/$LabelsDir")

  /** Cheap non-empty gate: one exists() (+ a small walk when present).
    * Uncached on purpose — correct mid-mutation, and the empty case is a
    * single namenode/stat call. */
  private def overlayFileCount(): Long = hiddenTreeFileCount(LabelsDir)

  private def hiddenTreeFileCount(dirName: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$root/$dirName")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L else fs.getContentSummary(p).getFileCount
  }

  /** Cheap base-tree non-empty gate: any `bucket=` child under the root
    * — ONE root listing, O(bucket count), never a tree walk. Write
    * admission uses it to skip the existing-key clash job on a fresh/
    * empty store (the common first-write shape; the job would scan
    * nothing). Conservative: a bucket dir holding only settings still
    * returns true and the clash job then no-ops. */
  private def baseHasBucketDirs(): Boolean = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(st =>
      st.isDirectory && st.getPath.getName.startsWith("bucket="))
  }

  /** The overlay as a DataFrame. The `_labels` root itself is
    * underscore-hidden (so the BASE scan skips it) — passing it straight
    * to `spark.read.parquet` would silently yield zero rows ("All paths
    * were ignored"), so the read lists the non-hidden `bucket=` children
    * and anchors partition discovery with `basePath`. */
  private def overlayTableRaw(): DataFrame = hiddenTreeRaw(LabelsDir)

  private def hiddenTreeRaw(dirName: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$root/$dirName")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val children =
      if (!fs.exists(p)) Array.empty[String]
      else fs.listStatus(p).collect {
        case st if st.isDirectory && st.getPath.getName.startsWith("bucket=") =>
          st.getPath.toString
      }
    if (children.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(overlayStoredSchema.dropRight(1)))
    else
      spark.read.schema(overlayStoredSchema)
        .option("basePath", p.toString)
        .parquet(children.toSeq: _*)
        .drop("dt")
  }

  private[graft] def overlayRowCount(): Long =
    if (overlayFileCount() == 0L) 0L else overlayTableRaw().count()

  /** Update-log row count (spec hook: echo convergence, log gating). */
  private[graft] def updatesLogRowCount(): Long =
    if (hiddenTreeFileCount(UpdatesDir) == 0L) 0L else hiddenTreeRaw(UpdatesDir).count()

  /** Update-log rows (spec hook: seq monotonicity across restarts). */
  private[graft] def updatesLogRaw(): DataFrame = hiddenTreeRaw(UpdatesDir)

  /** Driver-side overlay row count: -1 = unknown (re-seeded by the next
    * MUTATOR under the write lock — readers never write it, a racing
    * reader's stale seed could mask live patches). Keeps the per-patch
    * fold-threshold check and the per-read has-overlay gate O(1)
    * instead of a Spark count job / fs walk per call (review r15): the
    * count only runs on the first patch of a store instance or after a
    * partial purge left the count unknown. */
  private val overlayRowsApprox = new java.util.concurrent.atomic.AtomicLong(-1L)

  /** Exact overlay rows, from the driver counter when known (mutator
    * callers only — runs a count job to re-seed when unknown). */
  private def knownOverlayRows(): Long = {
    val v = overlayRowsApprox.get
    if (v >= 0L) v else overlayRowCount()
  }

  /** Monotone patch sequence; persisted implicitly in overlay AND
    * update-log rows, re-seeded from the max over BOTH trees on the
    * first overlay op of a store instance: the `_updates` log outlives
    * folds, so seeding from the overlay alone would let a restart after
    * a fold mint seqs BELOW logged ones — a replication drain's
    * latest-per-key max_by would then prefer the stale history over the
    * fresh patch (review r15 pass 2). */
  private lazy val overlaySeqCounter = new java.util.concurrent.atomic.AtomicLong(
    Seq(LabelsDir, UpdatesDir).map { dir =>
      if (hiddenTreeFileCount(dir) == 0L) 0L
      else {
        val r = hiddenTreeRaw(dir).agg(max("seq")).collect()(0)
        if (r.isNullAt(0)) 0L else r.getLong(0)
      }
    }.max)

  /** Latest-patch-per-key overlay aggregation, PERSISTED and cached
    * against an OVERLAY EPOCH — a counter bumped by every overlay
    * change, INCLUDING mid-mutation ones. dataVersion would be the
    * wrong key (review r15): it only advances when a mutation EXITS, so
    * a lock-free reader that built the agg before an append could
    * re-install the stale agg after the mutator's invalidation, still
    * keyed "current" — and the fold would then consume it and
    * permanently drop the just-appended patch. With the epoch key, a
    * build that observed a pre-change epoch can never install after the
    * change (CAS guard below), and the fold always sees a fresh agg. */
  private val overlayEpochCounter = new java.util.concurrent.atomic.AtomicLong(0L)
  private val ovAggCache =
    new java.util.concurrent.atomic.AtomicReference[(Long, DataFrame)]()
  /** Cache-rebuild count — observable by specs pinning one-agg-per-mutation. */
  private[graft] val overlayAggBuilds = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Retired aggs unpersist IMMEDIATELY — deferring is NOT safe here:
    * Spark's InMemoryFileIndex compares by rootPaths, so a fresh agg
    * over the same `_labels` root canonicalizes EQUAL to the retired
    * one; while the retired generation is still registered,
    * `persist()` on the new agg is a no-op ("already cached") and
    * CacheManager substitutes the RETIRED generation's data into every
    * new-agg query — stale labels served as current (observed: a
    * reopened store kept serving the first patch). The cost of
    * immediacy is bounded: a registry cursor mid-drain racing an
    * overlay mutation may recompute evicted agg blocks from purged
    * files and fail — the same documented cursor-vs-mutation class as
    * partition swaps (cursors bypass readConsistent by design). */
  private def invalidateOverlayAgg(): Unit = {
    overlayEpochCounter.incrementAndGet() // FIRST: stale builds can't install
    val prev = ovAggCache.getAndSet(null)
    if (prev != null) prev._2.unpersist(false)
  }

  private def overlayLatest(): DataFrame = {
    val e0 = overlayEpochCounter.get
    val hit = ovAggCache.get
    if (hit != null && hit._1 == e0) return hit._2
    overlayAggBuilds.incrementAndGet()
    val ov = overlayTableRaw()
      .groupBy("bucket", "entry", "ts")
      .agg(max_by(col("labels"), col("seq")).as("__ov_labels"))
    // install only if no overlay change overlapped the build — a raced
    // build is still correct to RETURN (the caller's own consistency
    // comes from readConsistent), just never to CACHE
    if (overlayEpochCounter.get != e0) return ov
    val p = ov.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (overlayEpochCounter.get == e0 && ovAggCache.compareAndSet(hit, (e0, p))) {
      // a replaced non-null stale hit must unpersist NOW — leaving it
      // registered would make later persists of plan-equal aggs no-ops
      // serving the retired data (see the rootPaths-equality doc above)
      if (hit != null) hit._2.unpersist(false)
      p
    } else { p.unpersist(false); p } // lost the install race (see doc above)
  }

  /** Whether `spec.when` can observe record labels (see
    * [[graft.cond.Node.readsLabels]]); a `#ext` directive counts — its
    * processors and per-step whens receive the labels map. Specs without
    * a when-condition trivially can't. Parse errors propagate: the
    * caller's own parse would raise the identical error anyway. */
  private def specReadsLabels(spec: QuerySpec): Boolean =
    spec.when.exists { w =>
      val parsed = graft.cond.Parser.parse(w)
      parsed.directives.get("#ext").isDefined ||
        graft.cond.Node.readsLabels(parsed.root)
    }

  private def applyOverlay(base: DataFrame): DataFrame = {
    // O(1) gate when the driver counter is known; fs fallback otherwise
    val known = overlayRowsApprox.get
    val has = if (known >= 0L) known > 0L else overlayFileCount() > 0L
    if (!has) base
    else
      base.join(broadcast(overlayLatest()), Seq("bucket", "entry", "ts"), "left")
        .withColumn("labels", coalesce(col("__ov_labels"), col("labels")))
        .drop("__ov_labels")
  }

  /** Append overlay rows (`bucket, entry, ts, labels, seq`) via staged
    * write + rename-in: the parquet job runs outside the epoch window,
    * only the per-file renames hold it — same discipline as
    * [[overwritePartitions]], but files ADD to live overlay dirs instead
    * of swapping them (readers dedup by seq, so accumulation is safe). */
  /** Overlay append that ALSO feeds the `_updates` log from the same
    * staged job: the two trees receive identical rows, and a second
    * Spark write would double the per-patch fixed cost (measured ~2x at
    * sf0.01) — copying the staged label-only files is bytes-proportional
    * and cheap. */
  private def appendOverlay(rows: DataFrame): Unit =
    // invalidate even on FAILURE: a throw mid-rename may have landed
    // some overlay files — the pre-append agg must not stay cached as
    // current (review r15 pass 2)
    try appendHiddenTree(rows, LabelsDir,
      alsoCopyTo = if (updateLogEnabled) Some(UpdatesDir) else None)
    finally invalidateOverlayAgg()

  /** Whether PATCHes also append to the `_updates` replication log. OFF
    * by default — the reference creates its transaction log PER
    * REPLICATION TASK (transaction_log.rs: the log exists because a task
    * does); without consumers the log would only add fs ops to every
    * patch (measured ~+1 s on the many-partition bench patch). The
    * replication façade flips it on when a task targeting this store is
    * registered; patches made BEFORE any task exists don't replicate —
    * exactly the reference's semantics (a task's log starts at task
    * creation). */
  @volatile var updateLogEnabled: Boolean = false

  /** Env-gated patch-path component timing (GRAFT_PATCH_TIMING=true):
    * stderr-only, for probes localizing per-patch cost. */
  private val patchTiming = sys.env.get("GRAFT_PATCH_TIMING").contains("true")
  private def ptimed[T](label: String)(f: => T): T =
    if (!patchTiming) f
    else {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[patch-timing] $label%-20s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

  /** Stage + rename-in append of (key, labels, seq) rows under a hidden
    * partitioned tree — shared by the label overlay and the update log.
    * `alsoCopyTo` duplicates each staged file into a second tree before
    * the rename (same swap window — a reader sees both or neither). */
  private def appendHiddenTree(rows: DataFrame, dirName: String,
      alsoCopyTo: Option[String] = None): Unit = {
    val stage = new org.apache.hadoop.fs.Path(
      s"$root/$RewriteDir/${java.util.UUID.randomUUID}")
    ptimed(s"stage-write:$dirName") {
      graft.core.Partitioning.pinned(
          rows.withColumn("dt", dtCol),
          col("bucket"), col("entry"), col("dt"))
        .write.partitionBy("bucket", "entry", "dt")
        .mode(SaveMode.Overwrite)
        .parquet(stage.toString)
    }
    val fs = stage.getFileSystem(spark.sparkContext.hadoopConfiguration)
    crashSeamForTest(s"append:$dirName:staged")
    rewriteEpochCounter.incrementAndGet() // odd: files landing
    try ptimed(s"rename-in:$dirName") {
      val treeRoot = new org.apache.hadoop.fs.Path(s"$root/$dirName")
      val dirs = stagedPartitionDirs(fs, stage)
      // per-dir ops are independent (distinct paths; mkdirs of a shared
      // entry parent is idempotent) — issue them in parallel so the
      // landing window doesn't grow with the touched-partition count
      parallelFs(dirs) { case (d, rel) =>
        val live = new org.apache.hadoop.fs.Path(treeRoot, rel)
        fs.mkdirs(live)
        val copyLive = alsoCopyTo.map { t =>
          val p = new org.apache.hadoop.fs.Path(s"$root/$t/$rel")
          fs.mkdirs(p); p
        }
        for (f <- fs.listStatus(d) if f.isFile &&
            !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith(".")) {
          copyLive.foreach { p =>
            org.apache.hadoop.fs.FileUtil.copy(fs, f.getPath, fs,
              new org.apache.hadoop.fs.Path(p, f.getPath.getName),
              false, spark.sparkContext.hadoopConfiguration): Unit
          }
          fs.rename(f.getPath, new org.apache.hadoop.fs.Path(live, f.getPath.getName))
        }
      }
    } finally {
      rewriteEpochCounter.incrementAndGet() // even: settled
      try fs.delete(stage, true)
      catch { case NonFatal(e) =>
        System.err.println(s"[store] $dirName stage GC failed, leaking $stage: $e") }
    }
  }

  /** Walk a staged partitioned tree: every `bucket=/entry=/dt=` leaf dir
    * with its tree-relative path. One serial listing pass — the listing
    * is O(buckets + entries) calls; the per-dir WORK it feeds is what
    * [[parallelFs]] spreads. */
  private def stagedPartitionDirs(fs: org.apache.hadoop.fs.FileSystem,
      stage: org.apache.hadoop.fs.Path): Seq[(org.apache.hadoop.fs.Path, String)] =
    (for {
      b <- fs.listStatus(stage) if b.isDirectory &&
        b.getPath.getName.startsWith("bucket=")
      e <- fs.listStatus(b.getPath) if e.isDirectory &&
        e.getPath.getName.startsWith("entry=")
      d <- fs.listStatus(e.getPath) if d.isDirectory &&
        d.getPath.getName.startsWith("dt=")
    } yield (d.getPath,
      s"${b.getPath.getName}/${e.getPath.getName}/${d.getPath.getName}")).toSeq

  /** Drop the overlay dirs mirroring the given base partitions — runs
    * inside a rewrite-swap window (the caller's `extraSwapActions`). */
  private[graft] def purgeOverlayDirs(
      affected: Iterable[(String, String, String)]): Unit = {
    val fs = overlayRootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dtDir(b: String, e: String, d: String) = new org.apache.hadoop.fs.Path(
      s"$root/$LabelsDir/bucket=${escapePartition(b)}/entry=${escapePartition(e)}/dt=$d")
    parallelFs(affected.toSeq) { case (b, e, d) =>
      fs.delete(dtDir(b, e, d), true): Unit }
    // GC empty parent skeletons so the overlay-gate walk never grows
    // with dead entry/bucket dirs (review r15)
    gcEmptyParents(fs, affected.map(a => (a._1, a._2)).toSet[(String, String)]
      .map { case (b, e) => dtDir(b, e, "x").getParent })
    overlayRowsApprox.set(-1L) // partial purge: count unknown until re-seeded
    invalidateOverlayAgg() // the overlay changed mid-mutation
  }

  /** Best-effort GC of empty `entry=` skeleton dirs (and their `bucket=`
    * parent if that empties too). Serial over DISTINCT parents, called
    * only after the parallel per-dt deletes joined — two threads GC'ing
    * one shared parent would race their exists/list/delete. Never fails
    * the surrounding swap: an un-GC'd empty dir is cosmetic. */
  private def gcEmptyParents(fs: org.apache.hadoop.fs.FileSystem,
      entryDirs: Iterable[org.apache.hadoop.fs.Path]): Unit =
    for (entryDir <- entryDirs) {
      try {
        if (fs.exists(entryDir) && fs.listStatus(entryDir).isEmpty) {
          fs.delete(entryDir, false)
          val bucketDir = entryDir.getParent
          if (fs.exists(bucketDir) && fs.listStatus(bucketDir).isEmpty)
            fs.delete(bucketDir, false): Unit
        }
      } catch { case NonFatal(_) => () }
    }

  /** Apply replicated label updates (the destination side of the
    * reference's UpdateRecord replication — remote_bucket sends them as
    * a PATCH batch, states/bucket_available.rs:79-88): rows are
    * (bucket, entry, ts, labels) with the FULL source-side label map.
    * Updates for records this store doesn't hold are skipped (the
    * reference's per-record error map — a destination only replicating
    * a subset legitimately lacks some keys). Routed through the same
    * size-gated patch path as local PATCHes, which also re-logs them to
    * `_updates/` — chained replications propagate. Returns applied rows. */
  def applyReplicatedLabels(updates: DataFrame): (Long, Long) = mutating {
    // a batch may carry STACKED updates for one key (several source
    // patches drained together): the highest source seq wins before
    // the destination mints its single seq — same-seq duplicate rows
    // would have a nondeterministic winner
    val latest = updates
      .groupBy("bucket", "entry", "ts")
      .agg(max_by(col("labels"), col("seq")).as("labels"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val total = latest.count()
      if (total == 0) return (0L, 0L)
      // prune the existence/current-labels lookup to the batch's own
      // partitions — a full-store scan per micro-batch would make small
      // frequent updates O(store) (review r15 pass 2)
      val affected = collectAffected(latest.select("bucket", "entry", "ts"))
      // map equality isn't orderable in Spark — compare sorted entries
      def canon(m: org.apache.spark.sql.Column) =
        array_sort(map_entries(coalesce(m, map().cast("map<string,string>"))))
      val patched = latest
        .join(prunedPartitionScan(affected) // effective dst labels
          .select(col("bucket"), col("entry"), col("ts"),
            col("labels").as("__cur")),
          Seq("bucket", "entry", "ts"), "inner")
        // no-op guard: an update that would not change the destination
        // neither applies nor re-logs. Besides skipping waste, this
        // TERMINATES self-referential configs (same store, identity
        // rename): the echo's second pass is all no-ops (review r15
        // pass 2 — without it, applied updates re-logged forever).
        .filter(canon(col("labels")) =!= canon(col("__cur")))
        .drop("__cur")
        .withColumn("seq", lit(overlaySeqCounter.incrementAndGet()))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val n = patched.count()
        if (n > 0) applyPatch(patched, n)
        // dropped = destination-missing records (the reference's
        // per-record error map) + already-current no-ops
        (n, total - n)
      } finally patched.unpersist()
    } finally latest.unpersist()
  }

  /** Fold the label overlay into the base files: every partition with
    * overlay rows is rewritten with effective labels and its overlay
    * dirs purged in the same swap. Public so operators/lifecycle can
    * compact eagerly; PATCH calls it automatically past
    * [[overlayFoldThreshold]]. Returns the folded overlay row count. */
  def foldLabelOverlay(): Long = mutating { foldOverlayLocked() }

  private def foldOverlayLocked(): Long = {
    val n = knownOverlayRows()
    if (n == 0L) return 0L
    val affected = collectAffected(overlayTableRaw().select("bucket", "entry", "ts"))
    val rewritten = prunedPartitionScan(affected) // effective labels
    overwritePartitions(rewritten,
      extraSwapActions = () => purgeOverlayDirs(affected))
    overlayRowsApprox.set(0L) // fold purged every overlay partition
    n
  }

  /** Append a batch of records.
    * @param onConflict Error → reject batch if any (bucket,entry,ts)
    *        already exists (the reference's 409, entry.rs conflict);
    *        Skip → drop conflicting rows; Overwrite is intentionally not
    *        offered (records are immutable, only labels update).
    */
  def write(records: DataFrame, onConflict: Conflict = Conflict.Error,
      maxRecordsPerFile: Long = 1000000L,
      codec: Option[String] = None,
      incomingBytes: Long = -1L,
      /** (bucket, entry) pairs this batch writes into, when the caller
        * knows them (every wire path does) — feeds the incremental
        * compaction candidate set; None marks the whole store dirty. */
      touchedEntries: Option[Seq[(String, String)]] = None,
      /** (min, max) record ts of the batch when the caller knows them
        * (driver-assembled batches — the `$system` flushes assign every
        * ts serially). Skips the bounds-aggregation Spark job the
        * Conflict.Skip admission otherwise runs before the write: one
        * whole job per telemetry flush for a value already in hand. */
      knownTsBounds: Option[(Long, Long)] = None): Unit = mutating {
    // the global storage cap guards the COMMON mutator, not just the
    // settings-aware wire path — the reference enforces it in
    // engine::begin_write (engine.rs:226), which the zenoh subscriber
    // and streaming ingest also pass through. incomingBytes < 0 means
    // the caller doesn't know the payload size; with a cap set (rare —
    // default unlimited) it is computed with one agg over the batch,
    // with no cap this costs nothing.
    if (maxStorageSize.isDefined) {
      val bytes =
        if (incomingBytes >= 0L) incomingBytes
        else records.agg(coalesce(sum(length(col("payload"))), lit(0L)))
          .collect()(0).getLong(0)
      ensureStorageLimit(bytes)
    }
    val batch0 = records.select(Records.schema.fieldNames.map(col): _*)
    // batch-internal duplicate ts: reject (Error) or keep-first (Skip —
    // idempotent replay, e.g. re-delivered streaming micro-batches)
    val deduped = onConflict match {
      case Conflict.Preadmitted =>
        // caller vouches: keys are in-batch unique and checked against
        // the store INSIDE the same mutation section (the HTTP batched
        // write's per-record admission). Skipping the stats-agg and
        // clash-join jobs here saves ~2 Spark jobs per serving-layer
        // write — the per-mutation job cost is the measured serving
        // bottleneck (SCALE.md r17).
        batch0
      case Conflict.Skip =>
        antiExisting(batch0.dropDuplicates("bucket", "entry", "ts"),
          knownTsBounds)
      case Conflict.Error if !baseHasBucketDirs() =>
        // fresh/empty store — the bulk-initial-ingest shape: no existing
        // record can clash, so the only admission left is the in-batch
        // duplicate check, and it rides INSIDE the write job as a window
        // flag + raise_error instead of a separate stats-agg pass over
        // the whole batch (guide §5: don't pay an extra pass for a check
        // the one required pass can carry). Reject-before-write holds:
        // a raised duplicate aborts the write JOB, and the committer's
        // staging dirs (_temporary) are invisible to partition discovery
        // — no row of a rejected batch is ever readable. The wrapped
        // SparkException is re-shaped to the contract's
        // IllegalArgumentException below (see the write action).
        val dupW = org.apache.spark.sql.expressions.Window
          .partitionBy("bucket", "entry", "ts")
        batch0.withColumn("payload",
          when(count(lit(1)).over(dupW) > 1,
            raise_error(concat(lit(InBatchDupMarker + " "),
              col("bucket"), lit("/"), col("entry"), lit("@"),
              col("ts").cast("string"))).cast("binary"))
            .otherwise(col("payload")))
      case Conflict.Error =>
        // one aggregation pass yields BOTH the in-batch-duplicate flag and
        // the ts bounds for the overlap check (was two scans)
        val stats = ptimed("write:stats-agg")(batch0
          .groupBy("bucket", "entry", "ts").count()
          .agg(max("count"), min("ts"), max("ts")).collect()(0))
        if (!stats.isNullAt(0) && stats.getLong(0) > 1) {
          val dup = batch0.groupBy("bucket", "entry", "ts").count()
            .filter(col("count") > 1).limit(1).collect()(0) // rare path
          throw new IllegalArgumentException(
            s"duplicate timestamp within batch: $dup")
        }
        if (!stats.isNullAt(1)) {
          val existing = baseTableOrEmpty() // keys only
            .filter(col("ts").between(stats.getLong(1), stats.getLong(2)))
            .select("bucket", "entry", "ts")
          val clash = ptimed("write:clash-check")(
            batch0.join(existing, Seq("bucket", "entry", "ts"))
              .limit(1).collect())
          if (clash.nonEmpty)
            throw new IllegalArgumentException(
              s"record already exists: ${clash(0)}")
        }
        batch0
    }
    // co-locate each output partition in one task before the partitioned
    // write — otherwise every task writes a file into every (entry, dt)
    // dir it touches and the store degrades into thousands of tiny files
    // (the classic small-files problem; measured 10x on the write path).
    // `maxRecordsPerFile` still splits a genuinely hot (entry, day).
    // Pinned count: AQE byte-coalescing would serialize a many-entry
    // batch through one task (core/Partitioning.scala).
    val writer = graft.core.Partitioning.pinned(
        deduped.withColumn("dt", dtCol),
        col("bucket"), col("entry"), col("dt"))
      .write
      .partitionBy("bucket", "entry", "dt")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode(SaveMode.Append)
    // per-write codec override (replication transfer compression); None
    // keeps the session default (zstd, set above)
    try ptimed("write:partitioned-write")(
      codec.fold(writer)(c => writer.option("compression", c)).parquet(root))
    catch { case NonFatal(e) =>
      // the empty-store duplicate check raises inside the job: re-shape
      // the SparkException wrapping back to the admission contract's
      // IllegalArgumentException, carrying the offending key
      var t: Throwable = e
      var depth = 0
      while (t != null && depth < 12) {
        val m = t.getMessage
        if (m != null && m.contains(InBatchDupMarker)) {
          val i = m.indexOf(InBatchDupMarker)
          throw new IllegalArgumentException(m.substring(i).takeWhile(_ != '\n'))
        }
        t = t.getCause
        depth += 1
      }
      throw e
    }
    touchedEntries match {
      case Some(pairs) => markEntriesDirty(pairs)
      case None => markAllEntriesDirty()
    }
  }

  private def antiExisting(batch: DataFrame,
      knownTsBounds: Option[(Long, Long)] = None): DataFrame = {
    val bounds = knownTsBounds.getOrElse {
      val r = batch.agg(min("ts"), max("ts")).collect()(0)
      if (r.isNullAt(0)) return batch
      (r.getLong(0), r.getLong(1))
    }
    if (!baseHasBucketDirs()) return batch
    val existing = baseTableOrEmpty() // keys only
      .filter(col("ts").between(bounds._1, bounds._2))
      .select("bucket", "entry", "ts")
    batch.join(existing, Seq("bucket", "entry", "ts"), "left_anti")
  }

  /** Batch-write convenience (the wire batch-protocol analog,
    * reduct_base/src/batch/v1.rs): records as (ts, labels, payload)
    * triples for one bucket/entry. This is the wire path, so it honors
    * the bucket's persisted settings (quota type/size, block rotation)
    * via [[writeWithSettings]]. */
  def writeBatch(bucket: String, entry: String,
      records: Seq[(Long, Map[String, String], Array[Byte])],
      contentType: String = "application/octet-stream",
      onConflict: Conflict = Conflict.Error): Unit = {
    import scala.jdk.CollectionConverters._
    val rows = records.map { case (ts, labels, payload) =>
      org.apache.spark.sql.Row(bucket, entry, ts, labels,
        Map.empty[String, String], contentType, Records.State.Finished, payload)
    }.asJava
    val bytes = records.map(_._3.length.toLong).sum
    writeWithSettings(bucket, spark.createDataFrame(rows, Records.schema),
      onConflict, incomingBytes = bytes,
      touchedEntries = Some(Seq((bucket, entry))))
    usage.countWrite(bucket, entry, records.size.toLong, bytes)
  }

  /** Coalesced serving write: many HTTP write requests folded into ONE
    * store mutation — one Spark job per touched bucket instead of one
    * per request. This is the per-mutation-job amortization lever for
    * the serving path (SCALE.md r17: every HTTP mutation is one
    * serialized ~0.5-0.8 s Spark job on the store lock; the reference's
    * analog batches writers behind its single-owner engine too,
    * storage/engine.rs).
    *
    * Semantics are EXACTLY serial execution in `reqs` order:
    *   - per-record conflict admission sees the store plus every record
    *     claimed by an earlier request in the fold (keep-first) — one
    *     [[existingKeys]] scan per bucket admits the whole group;
    *   - HARD quota / global storage cap / free-disk admission run per
    *     request with cumulative accounting, so a request that would
    *     have been rejected serially is rejected here (and only it);
    *   - a failed request never poisons its fold-mates: its slice is
    *     excluded and its error returned in its slot;
    *   - FIFO quota enforcement and usage counting happen per bucket /
    *     per request exactly as the un-folded path did.
    *
    * Returns one result per request, positionally: the set of rejected
    * (already-existing) record keys, or the admission/write failure.
    * Read-your-write visibility holds — the method returns only after
    * the shared job commits. */
  def writeFolded(reqs: Seq[BucketStore.FoldReq])
      : Seq[Either[Throwable, Set[(String, Long)]]] = mutating {
    import scala.util.control.NonFatal
    val results = new Array[Either[Throwable, Set[(String, Long)]]](reqs.size)
    // group by bucket, preserving queue order within each group
    val byBucket = reqs.zipWithIndex.groupBy(_._1.bucket)
    for ((bucket, group) <- byBucket) {
      val s = bucketSettings(bucket).getOrElse(BucketSettings.defaults)
      val quota = s.quotaSize.getOrElse(0L)
      val hard = s.quotaType.contains("HARD")
      var curBucketSize =
        if (hard && quota > 0) bucketSizeBytes(bucket) else 0L
      val existing = existingKeys(bucket,
        group.flatMap { case (r, _) => r.recs.map(rec => (rec.entry, rec.ts)) })
      var claimed = Set.empty[(String, Long)]
      var admittedBytes = 0L
      val rows = Vector.newBuilder[org.apache.spark.sql.Row]
      val admitted = Vector.newBuilder[(Int, BucketStore.FoldReq, Seq[BucketStore.FoldRec])]
      for ((req, idx) <- group) {
        try {
          val rejected = req.recs.iterator
            .filter(rec => existing((rec.entry, rec.ts)) ||
              claimed((rec.entry, rec.ts)))
            .map(rec => (rec.entry, rec.ts)).toSet
          val survivors = req.recs.filterNot(rec => rejected((rec.entry, rec.ts)))
          val bytes = survivors.iterator.map(_.payload.length.toLong).sum
          if (hard && quota > 0 && curBucketSize + bytes > quota)
            throw new IllegalArgumentException(s"Quota of '$bucket' exceeded")
          maxStorageSize.foreach { limit =>
            if (storeSizeBytes + admittedBytes + bytes > limit)
              throw new IllegalStateException("storage limit exceeded")
          }
          checkFreeDiskSpace(admittedBytes + bytes)
          curBucketSize += bytes
          admittedBytes += bytes
          claimed ++= survivors.iterator.map(rec => (rec.entry, rec.ts))
          rows ++= survivors.map(rec => org.apache.spark.sql.Row(
            bucket, rec.entry, rec.ts, rec.labels,
            Map.empty[String, String], rec.contentType,
            Records.State.Finished, rec.payload))
          // a request whose records ALL conflicted is a committed no-op
          // (serially it would succeed with its 409 map regardless of any
          // later write) — keep it out of `admitted` so a shared-job
          // failure can't overwrite its Right(rejected) with Left(e)
          if (survivors.nonEmpty) admitted += ((idx, req, survivors))
          results(idx) = Right(rejected)
        } catch { case NonFatal(e) => results(idx) = Left(e) }
      }
      val bucketRows = rows.result()
      if (bucketRows.nonEmpty) {
        try {
          import scala.jdk.CollectionConverters._
          write(spark.createDataFrame(bucketRows.asJava, Records.schema),
            BucketStore.Conflict.Preadmitted, // admitted above, same section
            maxRecordsPerFile = s.maxBlockRecords.filter(_ > 0).getOrElse(1000000L),
            incomingBytes = admittedBytes,
            touchedEntries = Some(admitted.result()
              .flatMap(_._3.iterator.map(rec => (bucket, rec.entry))).distinct))
          if (s.quotaType.contains("FIFO") && quota > 0)
            enforceFifoQuota(bucket, quota)
          for ((_, _, survivors) <- admitted.result();
              (entry, es) <- survivors.groupBy(_.entry))
            usage.countWrite(bucket, entry, es.size.toLong,
              es.iterator.map(_.payload.length.toLong).sum)
        } catch { case NonFatal(e) =>
          // the shared job failed: every admitted request in this bucket
          // shares the failure (none of their rows landed)
          for ((idx, _, _) <- admitted.result()) results(idx) = Left(e)
        }
      }
    }
    results.toSeq
  }

  /** Coalesced label updates: concurrent batched PATCHes fold into one
    * overlay-append job per bucket ([[writeFolded]]'s amortization for
    * the update path). Each request is (bucket, updates); its result is
    * the set of ITS (entry, ts) keys that matched a record — attribution
    * via [[updateLabelsMatched]]'s key set, so the HTTP layer derives
    * BOTH the updated count and the per-record 404 map from the SAME
    * mutation (no separate existence pre-scan, no check-then-apply
    * race). Cross-request deltas on the same (entry, ts) compose in
    * queue order inside updateLabelsMatched, exactly the serial
    * outcome. A failed bucket job fails every request that touched that
    * bucket (infrastructure failure, not per-request admission —
    * serially each would have hit it too). */
  def updateLabelsFolded(
      reqs: Seq[(String, Seq[(String, Long, Map[String, String], Set[String])])])
      : Seq[Either[Throwable, Set[(String, Long)]]] = mutating {
    import scala.util.control.NonFatal
    val results = new Array[Either[Throwable, Set[(String, Long)]]](reqs.size)
    for ((bucket, group) <- reqs.zipWithIndex.groupBy(_._1._1)) {
      try {
        val matched =
          updateLabelsMatched(bucket, group.flatMap(_._1._2))
        for (((_, updates), idx) <- group)
          results(idx) = Right(
            updates.iterator.map(u => (u._1, u._2)).filter(matched).toSet)
      } catch { case NonFatal(e) =>
        for ((_, idx) <- group) results(idx) = Left(e)
      }
    }
    results.toSeq
  }

  /** Coalesced record removes: concurrent batched DELETEs fold into one
    * remove job per bucket. Each request is (bucket, keys); its result
    * maps each of ITS keys to removed-or-missing. A key removed by an
    * EARLIER request in the fold reports false to later ones —
    * keep-first, exactly the serial outcome. */
  def removeFolded(reqs: Seq[(String, Seq[(String, Long)])])
      : Seq[Either[Throwable, Map[(String, Long), Boolean]]] = mutating {
    import scala.util.control.NonFatal
    val results =
      new Array[Either[Throwable, Map[(String, Long), Boolean]]](reqs.size)
    for ((bucket, group) <- reqs.zipWithIndex.groupBy(_._1._1)) {
      try {
        val removed = removeRecords(bucket,
          group.flatMap(_._1._2).distinct)
        var claimed = Set.empty[(String, Long)]
        for (((_, keys), idx) <- group) {
          results(idx) = Right(keys.map { k =>
            k -> (removed.getOrElse(k, false) && !claimed(k))
          }.toMap)
          claimed ++= keys.filter(k => removed.getOrElse(k, false))
        }
      } catch { case NonFatal(e) =>
        for ((_, idx) <- group) results(idx) = Left(e)
      }
    }
    results.toSeq
  }

  /** PATCH labels (storage/entry/update_labels.rs:14-36): merge `set` keys
    * over existing labels, drop `remove` keys, payload untouched —
    * LITERALLY: the patch appends (key, merged-labels, seq) rows to the
    * label overlay (see [[overlayFoldThreshold]]), base parquet files are
    * not rewritten, so write cost ∝ label bytes exactly like the
    * reference's descriptor-only rewrite. Past the fold threshold the
    * overlay compacts into the base (amortized).
    */
  def updateLabels(spec: QuerySpec, set: Map[String, String],
      remove: Set[String] = Set.empty): Long = mutating {
    val all = table()
    val patch =
      if (set.isEmpty) map().cast("map<string,string>")
      else map(set.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val dropKeys = array((remove ++ set.keys).toSeq.map(lit(_)): _*)
    val patched = QueryEngine.matching(all, spec)
      .select(col("bucket"), col("entry"), col("ts"),
        map_concat(
          map_filter(coalesce(col("labels"), map().cast("map<string,string>")),
            (k, _) => !array_contains(dropKeys, k)),
          patch).as("labels"))
      .withColumn("seq", lit(overlaySeqCounter.incrementAndGet()))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = ptimed("match+persist+count")(patched.count())
      if (n == 0) return 0
      applyPatch(patched, n)
      n
    } finally patched.unpersist()
  }

  /** Route a computed patch (key + merged labels + seq): small patches
    * append to the overlay (payload untouched — the common curation
    * shape); a patch ALREADY past the fold threshold would append and
    * immediately fold — strictly more work than rewriting once — so bulk
    * patches take the direct pruned-partition rewrite (folding any older
    * overlay rows for those partitions in the same swap, since
    * [[prunedPartitionScan]] is effective and the new labels override). */
  private def applyPatch(patched: DataFrame, n: Long): Unit = {
    // the UPDATE transaction log (the reference's replication analog of
    // Transaction::UpdateRecord, replication.rs:27): BOTH patch paths
    // record the patched (key, labels, seq) rows under `_updates/`, an
    // append-only hidden tree replication streams to propagate label
    // updates to destinations (api/http/entry/update_single.rs:84).
    // Cost ∝ label data; grows with patch history until pruned with the
    // entry/bucket it belongs to. The overlay path logs from the SAME
    // staged write (appendOverlay copies the staged files); the bulk
    // path runs the one extra small job.
    if (n <= overlayFoldThreshold) {
      val before = knownOverlayRows() // O(1) once seeded
      try appendOverlay(patched) // also feeds _updates/
      catch { case NonFatal(e) =>
        overlayRowsApprox.set(-1L) // partial landing: count unknown
        throw e
      }
      overlayRowsApprox.set(before + n)
      if (before + n > overlayFoldThreshold) foldOverlayLocked(): Unit
    } else {
      if (updateLogEnabled)
        appendHiddenTree(patched, UpdatesDir) // log only; base rewrite below
      val affected = collectAffected(patched.select("bucket", "entry", "ts"))
      val rewritten = prunedPartitionScan(affected)
        .join(patched.drop("seq").withColumnRenamed("labels", "__new_labels"),
          Seq("bucket", "entry", "ts"), "left")
        .withColumn("labels", coalesce(col("__new_labels"), col("labels")))
        .drop("__new_labels")
      overwritePartitions(rewritten,
        extraSwapActions = () => purgeOverlayDirs(affected))
    }
  }

  /** Bulk export: run `spec` and write the result as TOTALLY ORDERED
    * parquet shards under `outPath` (shard i's every (ts, entry) key
    * precedes shard i+1's; rows sorted inside each), returning one
    * manifest row per non-empty shard.
    *
    * This is the 100-TB bulk-read path the cursor surface can't be:
    * cursors drain through the driver via toLocalIterator — correct for
    * the reference's paged-fetch parity, but a driver-width bottleneck
    * for a full-corpus read. Here the rows never touch the driver: ONE
    * range exchange on (ts, entry) (sampled boundaries, explicit shard
    * count so AQE never re-coalesces the layout) and parallel sorted
    * writes, the same shape as [[graft.pipeline.Packing.orderedShards]].
    * The query's own global sort is skipped (queryUnordered) — the
    * range exchange IS the ordering step, not a second one.
    *
    * Consumers resume by shard id + the manifest's ts bounds. NOT under
    * [[mutating]]: exports are reads; racing mutations are handled by
    * the same snapshot-or-retry contract as any other read. */
  /** The export's DataFrame plan, pre-write — factored out so PlanSpec
    * can assert the shape: exactly ONE exchange (the range exchange IS
    * the ordering step; queryUnordered contributes no global sort). */
  private[graft] def exportPlan(spec: QuerySpec, nShards: Int): DataFrame =
    QueryEngine.queryUnordered(table(), spec)
      .repartitionByRange(nShards, col("ts"), col("entry"))
      .sortWithinPartitions("ts", "entry")
      .withColumn("shard", spark_partition_id().cast("long"))

  def exportShards(spec: QuerySpec, outPath: String,
      nShards: Int = 32): Seq[BucketStore.ShardInfo] = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val out = new org.apache.hadoop.fs.Path(outPath)
    val ofs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // serialize exports PER OUTPUT PATH: two concurrent exports to the
    // same target (HTTP overwrite retries, library callers) would
    // interleave the delete+write below and corrupt each other's tree
    // and manifest — the HTTP-level existence check is admission, not a
    // guard. Striped process-wide monitors: bounded memory, and
    // distinct paths almost never share a stripe (exports are
    // heavyweight, collisions just serialize two of them)
    BucketStore.exportPathLock(ofs.makeQualified(out).toUri.toString)
      .synchronized { exportShardsLocked(spec, outPath, nShards, out, ofs) }
  }

  private def exportShardsLocked(spec: QuerySpec, outPath: String,
      nShards: Int, out: org.apache.hadoop.fs.Path,
      ofs: org.apache.hadoop.fs.FileSystem): Seq[BucketStore.ShardInfo] = {
    readConsistent {
      // an export is a fresh materialization: clear the target first.
      // The session runs partitionOverwriteMode=dynamic, under which
      // mode(Overwrite).partitionBy replaces only the shard= dirs the
      // NEW write produces — a re-export (client retry, or this
      // readConsistent block re-running after a racing mutation) with
      // fewer non-empty shards would otherwise leave the previous
      // run's extra shard dirs mixed into the tree and the manifest.
      ofs.delete(out, true)
      exportPlan(spec, nShards)
        .write.partitionBy("shard")
        .mode(SaveMode.Overwrite)
        .parquet(outPath)
    }
    // zero-row export: legitimate (a spec past all data); the output
    // tree holds only _SUCCESS and schema inference would throw
    val hasShards = ofs.exists(out) && ofs.listStatus(out)
      .exists(st => st.isDirectory && st.getPath.getName.startsWith("shard="))
    if (!hasShards) return Seq.empty
    // manifest from the WRITTEN tree (one cheap scan of shard stats;
    // re-deriving from the query plan would recompute the export)
    spark.read.parquet(outPath)
      // partition discovery infers the dir value as int — pin to long
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("rows"), min("ts").as("min_ts"), max("ts").as("max_ts"))
      .orderBy("shard")
      .collect() // ≤ nShards rows — bounded driver aggregate
      .map(r => BucketStore.ShardInfo(r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3)))
      .toSeq
  }

  /** Query-as-delete (remove_records.rs:62-160): rewrite only affected
    * partitions without the matching rows; returns removed count. */
  def removeQuery(spec: QuerySpec): Long = mutating {
    // match phase: a when-condition that can't observe labels (&ref /
    // $ref / $exists / #ext) selects identical keys on the BASE table,
    // so the common time-range / $each_n / retention removes skip the
    // overlay broadcast join AND the overlay-agg build while patches
    // are outstanding. The rewrite below still folds effective labels
    // into the affected partitions either way (purge invariant).
    val all = if (specReadsLabels(spec)) table() else baseTable()
    val matched = QueryEngine.matching(all, spec).select("bucket", "entry", "ts")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = ptimed("rm:match+count")(matched.count())
      if (n == 0) return 0
      // materialize the affected-partition list before any file is touched
      val affected = ptimed("rm:affected")(collectAffected(matched))
      // survivors are consumed by exactly one action — the staged write
      // inside overwritePartitions. No localCheckpoint: checkpointing
      // the survivor set materializes (corpus - removed) bytes into
      // executor-local storage, the PB-scale hazard the rewrite seam
      // exists to avoid. Partitions whose every record matched are
      // absent from the staged tree; dropMissingFrom deletes them in
      // the same swap window, so a consistent reader sees the whole
      // removal or none of it.
      val survivors = prunedPartitionScan(affected)
        .join(matched, Seq("bucket", "entry", "ts"), "left_anti")
      ptimed("rm:overwrite") {
        overwritePartitions(survivors,
          dropMissingFrom = affected,
          // survivors carry folded effective labels; purging the affected
          // overlay dirs in the SAME swap keeps the live-records-only
          // invariant (a later re-write of a removed ts must not see
          // stale overlay labels)
          extraSwapActions = () => purgeOverlayDirs(affected))
      }
      n
    } finally matched.unpersist()
  }

  /** Batched per-record label updates (the io v2 PATCH verb): each key
    * carries its own set/remove delta; ONE pruned partition-rewrite pass
    * applies them all (a per-record loop would rewrite partitions k
    * times). Returns the number of records found and patched. */
  def updateLabelsBatch(bucket: String,
      updates0: Seq[(String, Long, Map[String, String], Set[String])]): Long =
    updateLabelsMatched(bucket, updates0).size.toLong

  /** [[updateLabelsBatch]] returning the matched (entry, ts) keys —
    * the folded variant attributes matches back to each folded request. */
  def updateLabelsMatched(bucket: String,
      updates0: Seq[(String, Long, Map[String, String], Set[String])])
      : Set[(String, Long)] = mutating {
    if (updates0.isEmpty) return Set.empty
    // compose duplicate (entry, ts) deltas IN ORDER before the join —
    // the inner join would otherwise emit same-seq overlay rows with a
    // nondeterministic winner and an inflated match count (review r15).
    // Composition: later sets win, later removes drop earlier sets,
    // a later set resurrects an earlier remove (apply-in-order).
    val updates = updates0.groupBy(u => (u._1, u._2)).values.map { vs =>
      vs.reduce { (a, b) =>
        (a._1, a._2, (a._3 -- b._4) ++ b._3, (a._4 ++ b._4) -- b._3.keySet)
      }
    }.toSeq
    import scala.jdk.CollectionConverters._
    val patchSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("bucket", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("entry", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("__set",
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType)),
      org.apache.spark.sql.types.StructField("__drop",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))))
    val patches = spark.createDataFrame(
      updates.map { case (e, ts, set, remove) =>
        org.apache.spark.sql.Row(bucket, e, ts, set, (remove ++ set.keys).toSeq)
      }.asJava, patchSchema)
    val patched = table()
      .filter(col("bucket") === bucket &&
        col("entry").isin(updates.map(_._1).distinct: _*) &&
        col("ts").between(updates.map(_._2).min, updates.map(_._2).max))
      .join(broadcast(patches), Seq("bucket", "entry", "ts"), "inner")
      .select(col("bucket"), col("entry"), col("ts"),
        map_concat(
          map_filter(coalesce(col("labels"), map().cast("map<string,string>")),
            (k, _) => !array_contains(coalesce(col("__drop"),
              array().cast("array<string>")), k)),
          coalesce(col("__set"), map().cast("map<string,string>"))).as("labels"))
      .withColumn("seq", lit(overlaySeqCounter.incrementAndGet()))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // keys, not a bare count: the folded variant needs per-request
      // match attribution, and the frame is persisted + batch-bounded,
      // so collecting (entry, ts) costs what count() did
      val keys = patched.select("entry", "ts").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      if (keys.isEmpty) return Set.empty
      applyPatch(patched, keys.length.toLong)
      keys.toSet
    } finally patched.unpersist()
  }

  /** Remove records by explicit (entry, ts) keys (remove_records.rs:34-60,
    * the ts-list form); returns per-key found/not-found. */
  /** Which of `ts` already exist for (bucket, entry) — the per-record
    * admission check behind the batched write/update endpoints' error
    * maps (write_batched.rs / update_batched.rs report per-record
    * 409/404 instead of failing the batch). Bounded: `ts` comes from
    * HTTP headers, so the isin list and the collect stay small. */
  def existingTimestamps(bucket: String, entry: String,
      ts: Seq[Long]): Set[Long] = {
    if (ts.isEmpty) return Set.empty
    baseTableOrEmpty()
      .filter(col("bucket") === bucket && col("entry") === entry &&
        col("ts").between(ts.min, ts.max) && col("ts").isin(ts: _*))
      .select("ts").collect().map(_.getLong(0)).toSet
  }

  /** Multi-entry variant of [[existingTimestamps]] — ONE scan admits a
    * whole coalesced fold (every request's conflict check) instead of
    * one Spark job per request. Keys are (entry, ts) within `bucket`;
    * the ts `isin` bounds the collect exactly like the single-entry
    * form (entry partition pruning + ts dictionary filter). */
  def existingKeys(bucket: String,
      keys: Seq[(String, Long)]): Set[(String, Long)] = {
    if (keys.isEmpty) return Set.empty
    val entries = keys.map(_._1).distinct
    val tss = keys.map(_._2).distinct
    val hits = baseTableOrEmpty()
      .filter(col("bucket") === bucket && col("entry").isin(entries: _*) &&
        col("ts").between(tss.min, tss.max) && col("ts").isin(tss: _*))
      .select("entry", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    hits.intersect(keys.toSet)
  }

  def removeRecords(bucket: String,
      keys: Seq[(String, Long)]): Map[(String, Long), Boolean] = mutating {
    if (keys.isEmpty) return Map.empty
    import scala.jdk.CollectionConverters._
    val keyDf = spark.createDataFrame(
      keys.map { case (e, ts) => org.apache.spark.sql.Row(bucket, e, ts) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("bucket", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("entry", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType))))
    val existing = baseTable() // keys only — overlay can't change them
      .filter(col("bucket") === bucket && col("entry").isin(keys.map(_._1).distinct: _*) &&
        col("ts").between(keys.map(_._2).min, keys.map(_._2).max))
      .join(broadcast(keyDf), Seq("bucket", "entry", "ts"), "left_semi")
      .select("bucket", "entry", "ts")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val found = existing.collect().map(r => (r.getString(1), r.getLong(2))).toSet
      if (found.nonEmpty) {
        val affected = collectAffected(existing)
        // one action (the staged write) — no localCheckpoint, see
        // removeQuery; fully-emptied partitions drop via dropMissingFrom
        val survivors = prunedPartitionScan(affected)
          .join(broadcast(existing), Seq("bucket", "entry", "ts"), "left_anti")
        overwritePartitions(survivors,
          dropMissingFrom = affected,
          extraSwapActions = () => purgeOverlayDirs(affected))
      }
      keys.map(k => k -> found(k)).toMap
    } finally existing.unpersist()
  }

  private def collectAffected(matched: DataFrame): Array[(String, String, String)] =
    matched.withColumn("dt", dtCol).select("bucket", "entry", "dt").distinct()
      .collect().map(r => (r.getString(0), r.getString(1), r.getDate(2).toString))

  /** Scan exactly the given (bucket, entry, dt) partitions, `dt` dropped.
    * The isin filters are on PARTITION columns, so they prune at the file
    * index — the rewrite never touches unaffected partitions' files. The
    * single-column isin sets over-approximate the tuple set; the exact
    * tuple filter runs on top (cheap: it only sees pruned rows).
    *
    * A rewrite spanning a huge partition set would bloat the plan with
    * isin literals; past the threshold the exact filter switches to a
    * broadcast semi-join, keeping only the (coarser, but still pruning)
    * distinct-value isin lists in the plan. */
  private val PruneListMax = 1000

  /** Pruned scans feed partition REWRITES, so they return EFFECTIVE rows
    * (overlay applied): every rewrite folds outstanding label patches
    * into the files it recreates. Callers purge the matching overlay
    * dirs in the swap (idempotent if skipped — a folded overlay row
    * re-applies the labels the base now already has). */
  private def prunedPartitionScan(affected: Array[(String, String, String)]): DataFrame =
    applyOverlay(prunedPartitionScanBase(affected))

  private def prunedPartitionScanBase(affected: Array[(String, String, String)]): DataFrame =
    if (affected.length <= PruneListMax) prunedPartitionScanIsin(affected)
    else {
      import scala.jdk.CollectionConverters._
      val keyDf = spark.createDataFrame(
        affected.map { case (b, e, d) =>
          org.apache.spark.sql.Row(b, e, java.sql.Date.valueOf(d)) }.toSeq.asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("bucket", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("entry", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("dt", org.apache.spark.sql.types.DateType))))
      spark.read.schema(storedSchema).parquet(root)
        .filter(col("bucket").isin(affected.map(_._1).distinct.toSeq: _*) &&
          col("dt").cast("string").isin(affected.map(_._3).distinct.toSeq: _*))
        .join(broadcast(keyDf), Seq("bucket", "entry", "dt"), "left_semi")
        .drop("dt")
    }

  private def prunedPartitionScanIsin(affected: Array[(String, String, String)]): DataFrame = {
    val bs = affected.map(_._1).distinct.toSeq
    val es = affected.map(_._2).distinct.toSeq
    val ds = affected.map(_._3).distinct.toSeq
    val keys = affected.map { case (b, e, d) => s"$b\u0001$e\u0001$d" }.toSet
    val keyCol = concat_ws("\u0001", col("bucket"), col("entry"), col("dt").cast("string"))
    spark.read.schema(storedSchema).parquet(root)
      .filter(col("bucket").isin(bs: _*) && col("entry").isin(es: _*) &&
        col("dt").cast("string").isin(ds: _*))
      .filter(keyCol.isin(keys.toSeq: _*))
      .drop("dt")
  }

  private def deletePartitionDir(bucket: String, entry: String, dt: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(
      s"$root/bucket=${escapePartition(bucket)}/entry=${escapePartition(entry)}/dt=$dt")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(path, true)
  }

  /** Rewrite the partitions present in `records` via sibling-dir staging
    * + per-partition rename swap. The job reads the live tree and writes
    * `_rewrite/<uuid>` — input and output paths never overlap, so the
    * rewrite set needs no lineage cut and is never materialized into
    * executor storage (the PB-scale risk of in-place dynamic overwrite:
    * a localCheckpoint of the whole rewritten data). Each staged
    * partition dir then swaps in with two renames: the old dir parks
    * INSIDE the staging dir (underscore-prefixed → invisible to parquet
    * partition discovery, never parsed as a partition value) and is
    * deleted with it. Renames are atomic per partition on posix/HDFS;
    * object stores without atomic rename would keep the in-place path.
    *
    * `records` is consumed by exactly ONE action here (the staged
    * write, pre-swap), so callers need no localCheckpoint — a remove
    * that checkpoints its survivor set materializes up to the whole
    * corpus into executor-local storage, the very risk above. A caller
    * that would read `records` AFTER the swap must still materialize it
    * first — recomputing post-swap resolves against a changed tree.
    *
    * `dropMissingFrom`: partitions the mutation touched; any of them
    * ABSENT from the staged tree (every record removed) is deleted in
    * the same swap window. This is derived from the staged dirs, so
    * callers don't need a second pass over `records` to learn which
    * partitions survived.
    *
    * `private[graft]` so lifecycle compaction reuses this seam (its
    * rewrite must land inside the same odd-epoch window readers retry
    * on); `writerOptions` carries its codec/level writer settings. */
  private[graft] def overwritePartitions(records: DataFrame,
      dropAfter: Iterable[(String, String, String)] = Nil,
      dropMissingFrom: Iterable[(String, String, String)] = Nil,
      writerOptions: Map[String, String] = Map.empty,
      extraSwapActions: () => Unit = () => ()): Unit = {
    val stage = new org.apache.hadoop.fs.Path(
      s"$root/$RewriteDir/${java.util.UUID.randomUUID}")
    graft.core.Partitioning.pinned( // one task per dir, AQE-proof
        records.withColumn("dt", dtCol),
        col("bucket"), col("entry"), col("dt"))
      .write.partitionBy("bucket", "entry", "dt")
      .options(writerOptions)
      .mode(SaveMode.Overwrite)
      .parquet(stage.toString)
    val fs = stage.getFileSystem(spark.sparkContext.hadoopConfiguration)
    crashSeamForTest("overwrite:staged")
    // every reader-visible change of the mutation — partition renames
    // AND the fully-emptied-dir deletes — lands inside ONE odd-epoch
    // window, so [[readConsistent]] callers see the whole mutation or
    // none of it, never a mix. The staged write job above ran outside
    // the window: the window holds only renames/deletes (milliseconds).
    rewriteEpochCounter.incrementAndGet() // odd: swap in flight
    try {
      val rootPath = new org.apache.hadoop.fs.Path(root)
      val parked = new java.util.concurrent.atomic.AtomicInteger(0)
      val dirs = stagedPartitionDirs(fs, stage)
      // touched partitions the staged tree does NOT recreate were fully
      // emptied by the mutation — drop them in the same window
      val stagedRels = dirs.map(_._2).toSet
      val emptied = dropMissingFrom.filterNot { case (b, e, d) =>
        stagedRels(s"bucket=${escapePartition(b)}/entry=${escapePartition(e)}/dt=$d") }
      // independent per-dir swaps issued in parallel: the odd-epoch
      // window readers retry on now lasts O(dirs / parallelism) fs ops
      // instead of O(dirs) (each swap stays atomic per dir; the park
      // names are unique via the atomic counter)
      parallelFs(dirs) { case (d, rel) =>
        val live = new org.apache.hadoop.fs.Path(rootPath, rel)
        fs.mkdirs(live.getParent)
        if (fs.exists(live))
          fs.rename(live, new org.apache.hadoop.fs.Path(
            stage, s"old-${parked.incrementAndGet()}"))
        fs.rename(d, live)
      }
      val drops = (dropAfter ++ emptied).toSeq
      parallelFs(drops) { case (db, de, ddt) =>
        deletePartitionDir(db, de, ddt) }
      // GC empty entry/bucket skeleton dirs left by the drops —
      // remove-heavy stores would otherwise accumulate dead entry dirs
      // that every partition-discovery listing walks
      gcEmptyParents(fs, drops.map(d => (d._1, d._2)).toSet[(String, String)]
        .map { case (db, de) => new org.apache.hadoop.fs.Path(
          s"$root/bucket=${escapePartition(db)}/entry=${escapePartition(de)}") })
      crashSeamForTest("overwrite:swapped")
      extraSwapActions() // e.g. overlay-dir purge — same swap window
    } finally {
      // settle FIRST, unconditionally: a failed stage-dir GC must never
      // leave the epoch odd (readers would spin on a consistent tree)
      rewriteEpochCounter.incrementAndGet() // even: settled
      // GC outside the window — the stage dir (incl. parked old dirs
      // renamed into it mid-swap) is invisible to the live tree. A
      // failed delete leaks a temp dir, not consistency; don't let it
      // mask the mutation's own outcome.
      try fs.delete(stage, true)
      catch { case NonFatal(e) =>
        System.err.println(s"[store] stage GC failed, leaking $stage: $e") }
    }
  }

  /** Entry catalog (names only; from partition listing, no data scan). */
  def entries(bucket: String): Seq[String] =
    baseTable().filter(col("bucket") === bucket)
      .select("entry").distinct().collect().map(_.getString(0)).toSeq.sorted

  /** Rename an entry (storage/bucket/rename_entry.rs): partition rewrite. */
  def renameEntry(bucket: String, from: String, to: String): Unit = mutating {
    if (entries(bucket).contains(to))
      throw new IllegalArgumentException(s"entry '$to' already exists")
    val moved = table()
      .filter(col("bucket") === bucket && col("entry") === from)
      .withColumn("entry", lit(to))
    if (moved.isEmpty)
      throw new NoSuchElementException(s"entry '$from' not found")
    write(moved, Conflict.Error)
    removeEntryFiles(bucket, from)
  }

  def removeEntry(bucket: String, entry: String): Unit = mutating {
    if (EntryPattern.isSystemMetaEntry(entry))
      throw new IllegalArgumentException("cannot remove system $meta entry")
    removeEntryFiles(bucket, entry)
  }

  private def removeEntryFiles(bucket: String, entry: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(
      s"$root/bucket=${escapePartition(bucket)}/entry=${escapePartition(entry)}")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(path, true)
    // mirror overlay + update-log subtrees go with the entry
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$root/$LabelsDir/bucket=${escapePartition(bucket)}/entry=${escapePartition(entry)}"),
      true)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$root/$UpdatesDir/bucket=${escapePartition(bucket)}/entry=${escapePartition(entry)}"),
      true)
    overlayRowsApprox.set(-1L)
    invalidateOverlayAgg()
  }

  /** Rename a bucket (storage/bucket rename): a directory move — no data
    * rewrite, the partition values live in the path. */
  def renameBucket(from: String, to: String): Unit = mutating {
    val src = new org.apache.hadoop.fs.Path(s"$root/bucket=${escapePartition(from)}")
    val dst = new org.apache.hadoop.fs.Path(s"$root/bucket=${escapePartition(to)}")
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(src))
      throw new NoSuchElementException(s"Bucket '$from' is not found")
    if (fs.exists(dst))
      throw new IllegalArgumentException(s"Bucket '$to' already exists")
    if (!fs.rename(src, dst))
      throw new IllegalStateException(s"rename failed: $src -> $dst")
    for (tree <- Seq(LabelsDir, UpdatesDir)) {
      val tSrc = new org.apache.hadoop.fs.Path(
        s"$root/$tree/bucket=${escapePartition(from)}")
      if (fs.exists(tSrc)) {
        val tDst = new org.apache.hadoop.fs.Path(
          s"$root/$tree/bucket=${escapePartition(to)}")
        fs.mkdirs(tDst.getParent)
        fs.rename(tSrc, tDst): Unit // keys carry the bucket name in the path
      }
    }
    invalidateOverlayAgg() // agg rows carry the old bucket name
  }

  def removeBucket(bucket: String): Unit = mutating {
    val path = new org.apache.hadoop.fs.Path(
      s"$root/bucket=${escapePartition(bucket)}")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(path, true)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$root/$LabelsDir/bucket=${escapePartition(bucket)}"), true)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$root/$UpdatesDir/bucket=${escapePartition(bucket)}"), true)
    overlayRowsApprox.set(-1L)
    invalidateOverlayAgg()
  }

  /** Bytes on disk per bucket (for quotas). */
  /** Size figures cached against [[dataVersion]]: `getContentSummary`
    * walks the whole subtree (O(files) — a slow serving call at millions
    * of files), so `/info` and `/list` pay it once per MUTATION, not per
    * call. The cache entry count is bounded by the bucket count, which
    * the reference's own engine holds in server memory (engine.rs). */
  private val sizeCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
  /** Recompute count — observable by specs pinning cache behavior. */
  private[graft] val sizeWalks = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Uncached subtree walk — for reads INSIDE a [[mutating]] block (the
    * FIFO-eviction loop re-checks the size it is actively shrinking; the
    * version only bumps when the block exits, so the cache would serve
    * the pre-eviction figure for the whole loop). */
  private def treeBytes(path: org.apache.hadoop.fs.Path): Long = {
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    sizeWalks.incrementAndGet()
    if (fs.exists(path)) fs.getContentSummary(path).getLength else 0L
  }

  private def bucketPath(bucket: String) =
    new org.apache.hadoop.fs.Path(s"$root/bucket=${escapePartition(bucket)}")

  private def cachedTreeBytes(key: String, mk: () => org.apache.hadoop.fs.Path): Long = {
    val v0 = dataVersion
    val hit = sizeCache.get(key)
    if (hit != null && hit._1 == v0) return hit._2
    val bytes = treeBytes(mk())
    // cache only when no mutation raced the walk — a mid-mutation figure
    // must not survive past the mutation; a raced call recomputes next time
    if (dataVersion == v0) sizeCache.put(key, (v0, bytes)): Unit
    bytes
  }

  /** Whole-store bytes (the `/info` usage figure). */
  def storeSizeBytes: Long =
    cachedTreeBytes("", () => new org.apache.hadoop.fs.Path(root))

  def bucketSizeBytes(bucket: String): Long =
    cachedTreeBytes(s"b:$bucket", () => bucketPath(bucket))

  /** Bytes + parquet-file count per entry of a bucket (decoded names) —
    * the EntryInfo size/block_count analog (entry_api.rs:9-23: blocks are
    * the reference's storage unit, parquet files are ours). One
    * filesystem listing, no Spark job. */
  def entryStats(bucket: String): Map[String, (Long, Long)] = {
    val bpath = new org.apache.hadoop.fs.Path(
      s"$root/bucket=${escapePartition(bucket)}")
    val fs = bpath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(bpath)) return Map.empty
    fs.listStatus(bpath).iterator
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("entry="))
      .map { st =>
        val name = unescapePartition(st.getPath.getName.stripPrefix("entry="))
        val sum = fs.getContentSummary(st.getPath)
        name -> (sum.getLength, sum.getFileCount)
      }.toMap
  }

  /** Periodic storage maintenance — the engine's compaction tick
    * (`RS_ENGINE_COMPACTION_INTERVAL`, engine.rs:520-531
    * run_bucket_maintenance → entry.rs:340 compact). The reference
    * flushes block-manager cache metadata and WAL indexes; a parquet
    * store's equivalent layout debt is SMALL FILES — the serving write
    * path lands one file per (bucket, entry, day) per mutation, so a
    * day of single-record writes degrades a partition into thousands of
    * tiny files and every scan pays per-file open/footer cost. Compacts
    * every partition holding more than `maxFilesPerPartition` files by
    * rewriting it coalesced through the SAME atomic partition swap the
    * label fold uses: readers see before or after, never a mix, and
    * outstanding label patches fold into the rewritten files
    * (prunedPartitionScan contract), with the matching overlay dirs
    * purged inside the swap window.
    *
    * The overcrowded-partition probe runs LOCK-FREE first and is
    * INCREMENTAL (r19, closing the r18 weak mark): candidates come from
    * the dirty-entry set the write paths feed, so a tick lists only the
    * dt dirs of entries actually written since the last probe — an idle
    * tick costs ZERO FS listings (pinned in ReplicaCompactionSpec),
    * where the r18 tick full-walked every bucket=X/entry=Y/dt=Z dir
    * per tick (O(all partitions) FS
    * metadata ops per minute; unreachable and billable on the s3a
    * deployment ServerMain documents). The full walk still happens
    * exactly where it is owed: once at boot (bootstrap debt — files may
    * predate this process) and after a generic `write(records)` whose
    * caller didn't declare its entries. Neither probe takes the store
    * lock nor bumps the data version (cached size figures stay valid —
    * the no-tree-walk-between-mutations contract). Only a tick with
    * real work mutates. Returns the number of partitions compacted. */
  def compact(maxFilesPerPartition: Int = 16): Int = {
    lastProbeListings.set(0L)
    // Drain the dirty state FIRST: a mutation racing the probe re-marks
    // AFTER this snapshot and is re-probed next tick, never lost.
    val all = dirtyAllEntries.getAndSet(false)
    val scoped: Array[(String, String)] =
      if (all) null
      else {
        import scala.jdk.CollectionConverters._
        val snap = dirtyEntrySet.iterator().asScala.toArray
        snap.foreach(dirtyEntrySet.remove)
        snap
      }
    if (!all && scoped.isEmpty) return 0 // idle tick: zero FS listings
    try {
      val candidates =
        listOvercrowdedPartitions(maxFilesPerPartition, Option(scoped))
      if (candidates.isEmpty) return 0
      mutating {
        // exact re-probe under the lock, scoped to the candidate entries
        val affected = listOvercrowdedPartitions(maxFilesPerPartition,
          Some(candidates.map(c => (c._1, c._2)).distinct))
        if (affected.isEmpty) 0
        else {
          overwritePartitions(prunedPartitionScan(affected),
            dropMissingFrom = affected,
            extraSwapActions = () => purgeOverlayDirs(affected))
          affected.length
        }
      }
    } catch { case t: Throwable =>
      // the drained dirtiness was not serviced — restore it so the next
      // tick retries instead of silently forgetting the debt
      if (all) markAllEntriesDirty()
      else markEntriesDirty(scoped)
      throw t
    }
  }

  /** (bucket, entry, dt) partitions whose file count exceeds `maxFiles`.
    * Read-only FS walk — over `scope`'s (bucket, entry) dirs when given
    * (the incremental tick), else the whole tree (boot / undeclared bulk
    * write) — parallel across entry dirs. Every listStatus is counted
    * into [[lastProbeListings]] so specs can pin the per-tick FS cost. */
  private def listOvercrowdedPartitions(maxFiles: Int,
      scope: Option[Seq[(String, String)]] = None): Array[(String, String, String)] = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (scope.isEmpty && !fs.exists(rootPath)) return Array.empty
    def list(p: org.apache.hadoop.fs.Path) = {
      lastProbeListings.incrementAndGet()
      try fs.listStatus(p).toSeq
      catch { case _: java.io.FileNotFoundException => Seq.empty }
    }
    def subDirs(p: org.apache.hadoop.fs.Path, prefix: String) =
      list(p).filter(st =>
        st.isDirectory && st.getPath.getName.startsWith(prefix))
    val found = new java.util.concurrent.ConcurrentLinkedQueue[(String, String, String)]()
    val entryDirs = scope match {
      case Some(pairs) => pairs.map { case (b, e) =>
        (s"bucket=${escapePartition(b)}", new org.apache.hadoop.fs.Path(
          s"$root/bucket=${escapePartition(b)}/entry=${escapePartition(e)}"))
      }
      case None => for {
        b <- subDirs(rootPath, "bucket=")
        e <- subDirs(b.getPath, "entry=")
      } yield (b.getPath.getName, e.getPath)
    }
    parallelFs(entryDirs) { case (bucketDir, entryPath) =>
      for (d <- subDirs(entryPath, "dt=")) {
        val files = list(d.getPath).count(st =>
          st.isFile && !st.getPath.getName.startsWith("_") &&
            !st.getPath.getName.startsWith("."))
        if (files > maxFiles)
          found.add((
            unescapePartition(bucketDir.stripPrefix("bucket=")),
            unescapePartition(entryPath.getName.stripPrefix("entry=")),
            d.getPath.getName.stripPrefix("dt=")))
      }
    }
    import scala.jdk.CollectionConverters._
    found.iterator().asScala.toArray
  }

  /** FIFO quota (bucket/quotas.rs:44-95): evict oldest day-partitions
    * until under `maxBytes`; `$meta` entries are never eviction candidates.
    * Returns evicted partition count. */
  def enforceFifoQuota(bucket: String, maxBytes: Long): Int = mutating {
    var evicted = 0
    // evictions drop overlay day-dirs too: count + agg cache must reset
    // whichever exit path the loop takes (epoch-keyed cache, review r15)
    try enforceFifoLoop(bucket, maxBytes, n => evicted = n)
    finally if (evicted > 0) { overlayRowsApprox.set(-1L); invalidateOverlayAgg() }
    evicted
  }

  private def enforceFifoLoop(bucket: String, maxBytes: Long,
      report: Int => Unit): Unit = {
    var evicted = 0
    // uncached: the loop shrinks the very size it re-checks, and the data
    // version only moves when this mutating block exits
    while (treeBytes(bucketPath(bucket)) > maxBytes) {
      val oldest = baseTable().filter(col("bucket") === bucket)
        .filter(!col("entry").endsWith("/" + EntryPattern.MetaSegment) &&
          col("entry") =!= EntryPattern.MetaSegment)
        .agg(min(dtCol).as("dt")).collect()(0)
      if (oldest.isNullAt(0)) return
      val dt = oldest.getDate(0).toString
      val bpath = new org.apache.hadoop.fs.Path(
      s"$root/bucket=${escapePartition(bucket)}")
      val fs = bpath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // system $meta entries are never eviction candidates
      // (bucket/quotas.rs is_eligible_for_fifo_eviction) — skip their dirs,
      // not just exclude them from the oldest-dt computation
      val entryDirs = fs.listStatus(bpath).filter { st =>
        st.isDirectory && {
          val name = st.getPath.getName
          !name.startsWith("entry=") ||
            !EntryPattern.isSystemMetaEntry(
              unescapePartition(name.stripPrefix("entry=")))
        }
      }
      var any = false
      for (e <- entryDirs) {
        val p = new org.apache.hadoop.fs.Path(e.getPath, s"dt=$dt")
        if (fs.exists(p)) {
          fs.delete(p, true)
          fs.delete(new org.apache.hadoop.fs.Path( // mirror overlay day
            s"$root/$LabelsDir/bucket=${escapePartition(bucket)}/${e.getPath.getName}/dt=$dt"), true)
          any = true; evicted += 1; report(evicted)
        }
      }
      if (!any) return
      // the deletes above happened mid-mutation (no version bump yet):
      // the next iteration's oldest-dt scan must re-list, not read the
      // cached pre-delete file index
      invalidateBaseTable()
    }
  }

  // -------------------------------------------------------- staged upload

  /** Fresh staging location for a large record payload, on the store's
    * own filesystem so every executor can read it (a serving node's
    * local /tmp would not be cluster-visible). The underscore dir is
    * invisible to parquet partition discovery. */
  def stageUploadPath(): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      s"$root/$StagingDir/${java.util.UUID.randomUUID}")

  /** Write one record whose payload was spooled to a staging file
    * (HttpApi streams request bodies there in fixed-size chunks — the
    * analog of the reference's streamed bodies,
    * api/http/entry/write_single.rs). The bytes flow staging file →
    * executor task → parquet writer via a `binaryFile` scan; the serving
    * layer never materializes the payload. The staging file is deleted
    * whether the write succeeds or not. */
  def writeStaged(bucket: String, entry: String, ts: Long,
      labels: Map[String, String], contentType: String,
      staged: org.apache.hadoop.fs.Path,
      onConflict: Conflict = Conflict.Error): Unit = {
    val fs = staged.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      val len = fs.getFileStatus(staged).getLen
      val df = spark.read.format("binaryFile").load(staged.toString)
        .select(
          lit(bucket).as("bucket"), lit(entry).as("entry"),
          lit(ts).as("ts"),
          typedLit(labels).as("labels"),
          typedLit(Map.empty[String, String]).as("computed_labels"),
          lit(contentType).as("content_type"),
          lit(Records.State.Finished).as("state"),
          col("content").as("payload"))
      writeWithSettings(bucket, df, onConflict, incomingBytes = len,
        touchedEntries = Some(Seq((bucket, entry))))
      usage.countWrite(bucket, entry, 1L, len)
    } finally fs.delete(staged, false)
  }

  /** Write a multi-record batch whose concatenated payloads were spooled
    * to one staging file (the io-v2 wire path for large batches). Each
    * record's bytes are sliced out executor-side with positioned reads —
    * one payload in memory per task at a time, nothing buffered by the
    * serving layer. Slices are keyed by entry so the read parallelism
    * follows the write partitioning. */
  def writeStagedSlices(bucket: String, staged: org.apache.hadoop.fs.Path,
      slices: Seq[BucketStore.StagedSlice],
      onConflict: Conflict = Conflict.Error): Unit = {
    val fs = staged.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      val total = slices.map(_.len).sum
      val pathStr = staged.toString
      val b = bucket
      import spark.implicits._
      val df = graft.core.Partitioning.pinned(
          spark.createDataset(slices), col("entry"))
        .mapPartitions { it =>
          if (!it.hasNext) Iterator.empty[Records.Record]
          else {
            val p = new org.apache.hadoop.fs.Path(pathStr)
            val pfs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
            val in = pfs.open(p)
            Option(org.apache.spark.TaskContext.get())
              .foreach(_.addTaskCompletionListener[Unit](_ => in.close()))
            it.map { s =>
              val buf = new Array[Byte](s.len.toInt)
              in.readFully(s.offset, buf) // positioned read — thread-safe
              Records.Record(b, s.entry, s.ts, s.labels,
                Map.empty[String, String], s.contentType,
                Records.State.Finished, buf)
            }
          }
        }.toDF()
      writeWithSettings(bucket, df, onConflict, incomingBytes = total,
        touchedEntries = Some(slices.map(s => (bucket, s.entry)).distinct))
      for ((entry, es) <- slices.groupBy(_.entry))
        usage.countWrite(bucket, entry, es.size.toLong, es.map(_.len).sum)
    } finally fs.delete(staged, false)
  }

  /** HARD quota (quotas.rs:53-66): reject writes that would exceed it. */
  def writeWithHardQuota(records: DataFrame, bucket: String, maxBytes: Long): Unit = {
    if (bucketSizeBytes(bucket) >= maxBytes)
      throw new IllegalStateException(s"bucket '$bucket' over hard quota")
    write(records)
  }

  // ----------------------------------------------------- bucket settings

  private def settingsPath(bucket: String) =
    new org.apache.hadoop.fs.Path(
      s"$root/bucket=${escapePartition(bucket)}/$SettingsFile")

  /** Stored settings for a bucket, if the bucket has been created /
    * written through the settings-aware path. */
  def bucketSettings(bucket: String): Option[BucketSettings] = {
    val p = settingsPath(bucket)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(BucketSettings.fromJson(
        new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)))
      finally in.close()
    }
  }

  /** Persist settings for a bucket (overwrites; callers merge first —
    * [[BucketSettings.over]] gives the reference's fill_settings
    * semantics, bucket/settings.rs:61-79). */
  def putBucketSettings(bucket: String, s: BucketSettings): Unit = {
    if (readOnly) throw new BucketStore.ReadOnlyStoreException(
      "Cannot perform this operation in read-only mode")
    val p = settingsPath(bucket)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s.toJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def bucketSettingsExist(bucket: String): Boolean = {
    val p = settingsPath(bucket)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Write honoring the bucket's persisted settings (keep_quota_for,
    * bucket/quotas.rs:44-66): NONE → plain append; HARD → reject when
    * current size + incoming would exceed quota_size ("Quota of 'b'
    * exceeded", the reference's bad_request); FIFO → append, then evict
    * oldest day-partitions until back under quota. `max_block_records`
    * maps to the parquet writer's file rotation (maxRecordsPerFile —
    * the analog of block rotation, storage.proto:47-63); max_block_size
    * is stored for API parity (parquet files rotate on records, and a
    * day-partition bounds them physically).
    *
    * @param incomingBytes payload size of the batch when the caller knows
    *        it (the HTTP body length) — counted against a HARD quota
    *        without a pre-write scan. */
  def writeWithSettings(bucket: String, records: DataFrame,
      onConflict: Conflict = Conflict.Error, incomingBytes: Long = 0L,
      touchedEntries: Option[Seq[(String, String)]] = None,
      knownTsBounds: Option[(Long, Long)] = None): Unit = mutating {
    val s = bucketSettings(bucket).getOrElse(BucketSettings.defaults)
    val quota = s.quotaSize.getOrElse(0L)
    if (s.quotaType.contains("HARD") && quota > 0 &&
        bucketSizeBytes(bucket) + incomingBytes > quota)
      throw new IllegalArgumentException(s"Quota of '$bucket' exceeded")
    checkFreeDiskSpace(incomingBytes)
    write(records, onConflict,
      maxRecordsPerFile = s.maxBlockRecords.filter(_ > 0).getOrElse(1000000L),
      incomingBytes = incomingBytes, // cap enforced in write (begin_write analog)
      touchedEntries = touchedEntries,
      knownTsBounds = knownTsBounds)
    if (s.quotaType.contains("FIFO") && quota > 0)
      enforceFifoQuota(bucket, quota)
  }

  /** Global storage cap across ALL buckets —
    * `RS_ENGINE_MAX_STORAGE_SIZE` (PR-1263, cfg/storage_engine.rs:45-47,
    * engine.rs:301-315). None (default) = unlimited; the server sets it
    * from env, library callers directly. Enforced in [[write]] — the
    * common mutator every path (wire, zenoh ingest, streaming ingest,
    * replication) funnels through, mirroring engine::begin_write — plus
    * a declared-size preflight on the HTTP write admissions; uses the
    * cached whole-store size, so an unset cap costs nothing and a set
    * one costs one cached tree walk per mutation epoch. */
  @volatile var maxStorageSize: Option[Long] = None

  /** engine.rs ensure_storage_limit: total usage + incoming must stay
    * within the cap; the reference surfaces this as a server error
    * ("storage limit exceeded"), not a per-bucket quota 422. */
  def ensureStorageLimit(incomingBytes: Long): Unit =
    maxStorageSize.foreach { limit =>
      if (storeSizeBytes + math.max(0L, incomingBytes) > limit)
        throw new IllegalStateException("storage limit exceeded")
    }

  /** Injectable free-space provider (the reference's FreeSpaceFn,
    * bucket.rs:50-58): bytes available on the filesystem holding the store
    * root. Hadoop FsStatus covers local disks and DFS alike; swappable in
    * tests so write admission is deterministic. */
  @volatile var freeSpaceFn: () => Long = () => {
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getStatus(p).getRemaining
  }

  /** Reject a write whose payload can't fit on the data volume
    * (quotas.rs:19-42): complements quotas — even a bucket within quota is
    * refused, BEFORE any bytes land, when the filesystem can't hold the
    * record, so the operator sees a clean 507 instead of a mid-write
    * IOException from a full disk. Runs after the quota check, matching
    * the reference's admission order (bucket.rs:236). */
  def checkFreeDiskSpace(contentSize: Long): Unit = {
    val available = freeSpaceFn()
    if (contentSize > available)
      throw new BucketStore.InsufficientStorageException(
        s"Not enough free disk space in the data folder to write a record " +
          s"of $contentSize bytes: only $available bytes available")
  }
}

object BucketStore {
  /** Shared pool for [[BucketStore.parallelFs]] workers: cached (idle
    * threads die after 60 s, reused across the up-to-three parallelFs
    * calls inside one swap window), daemon (never blocks JVM exit),
    * process-wide (mutations are store-lock-serialized, so concurrent
    * stores at worst stripe onto more threads — the per-call worker
    * count still bounds each call's own parallelism). */
  private[engine] lazy val fsOpPool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newCachedThreadPool((r: Runnable) => {
      val t = new Thread(r, "graft-fsop"); t.setDaemon(true); t
    })

  /** Write admission failure: the data volume can't hold the record
    * (reference ErrorCode::InsufficientStorage → HTTP 507). */
  final class InsufficientStorageException(msg: String)
      extends RuntimeException(msg)

  /** Mutation refused on a read-only replica (engine.rs check_mode →
    * HTTP 403 forbidden). */
  final class ReadOnlyStoreException(msg: String)
      extends RuntimeException(msg)

  /** Striped per-export-path monitors ([[BucketStore.exportShards]]):
    * process-wide so two stores (or two HTTP retries) exporting to the
    * same target serialize instead of interleaving delete+write. */
  private val exportPathLocks = Array.fill(64)(new Object)
  private[engine] def exportPathLock(qualifiedPath: String): Object =
    exportPathLocks(math.floorMod(qualifiedPath.hashCode, 64))

  sealed trait Conflict
  object Conflict {
    case object Error extends Conflict
    case object Skip extends Conflict
    /** Admission already happened: the caller verified in-batch key
      * uniqueness and absence-from-store inside the SAME [[mutating]]
      * section this write runs in, so the write skips its own dedup and
      * clash jobs. NEVER use outside a mutation-section admission — an
      * unchecked duplicate key would land two records on one (bucket,
      * entry, ts). */
    case object Preadmitted extends Conflict
  }

  /** Settings JSON file inside the bucket's partition directory — the
    * underscore prefix hides it from Spark's parquet partition discovery,
    * so the data table never sees it. */
  val SettingsFile = "_settings.json"

  /** Staging directory for streamed uploads (underscore-hidden). */
  val StagingDir = "_upload"
  val RewriteDir = "_rewrite"

  /** Label-overlay tree root (underscore-hidden from the base table's
    * partition discovery, batch and streaming). Partitioned like the
    * base: `bucket=<b>/entry=<e>/dt=<d>`. */
  val LabelsDir = "_labels"

  /** Label-UPDATE transaction log root (hidden, append-only, same
    * partitioning + row schema as the overlay): every PATCH — overlay or
    * bulk — appends its (key, merged-labels, seq) rows here, and
    * replication streams the tree to propagate label updates
    * (the reference's Transaction::UpdateRecord log, replication.rs:27,
    * transaction_log.rs). Unlike `_labels`, folds never purge it —
    * it is history, pruned only with its entry/bucket. */
  val UpdatesDir = "_updates"

  /** One shard of a bulk export ([[BucketStore.exportShards]]): rows
    * and inclusive ts bounds — the resume bookkeeping a 100-TB consumer
    * keys on (shard ids alone shift with sampled range boundaries). */
  final case class ShardInfo(shard: Long, rows: Long, minTs: Long, maxTs: Long)

  /** One record of a spooled batch body: its payload is
    * `staged[offset, offset + len)`. */
  final case class StagedSlice(entry: String, ts: Long,
      labels: Map[String, String], contentType: String,
      offset: Long, len: Long)

  /** One record of a coalesced serving write ([[BucketStore.writeFolded]]). */
  final case class FoldRec(entry: String, ts: Long,
      labels: Map[String, String], contentType: String, payload: Array[Byte])

  /** One request's slice of a coalesced serving write: records for one
    * bucket (any mix of entries), in-request-unique by (entry, ts) —
    * the HTTP layer rejects/degrades in-batch duplicates before
    * folding. */
  final case class FoldReq(bucket: String, recs: Seq[FoldRec])

  /** Per-bucket settings (reduct_base/src/msg/bucket_api.rs:57-67).
    * All fields optional; a PUT merges present fields over the stored
    * value (fill_settings, bucket/settings.rs:61-79). quota_type is one
    * of NONE | FIFO | HARD (bucket_api.rs:15-20). */
  final case class BucketSettings(
      quotaType: Option[String] = None,
      quotaSize: Option[Long] = None,
      maxBlockSize: Option[Long] = None,
      maxBlockRecords: Option[Long] = None) {

    /** This settings object layered over `base`: present fields win,
      * missing fields fall back (the reference's fill_settings). */
    def over(base: BucketSettings): BucketSettings = BucketSettings(
      quotaType.orElse(base.quotaType),
      quotaSize.orElse(base.quotaSize),
      maxBlockSize.orElse(base.maxBlockSize),
      maxBlockRecords.orElse(base.maxBlockRecords))

    def toJson: String = {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      JsonMethods.compact(JsonMethods.render(JObject(
        "quota_type" -> quotaType.map(JString(_)).getOrElse(JNull),
        "quota_size" -> quotaSize.map(v => JInt(BigInt(v))).getOrElse(JNull),
        "max_block_size" -> maxBlockSize.map(v => JInt(BigInt(v))).getOrElse(JNull),
        "max_block_records" -> maxBlockRecords.map(v => JInt(BigInt(v)))
          .getOrElse(JNull))))
    }
  }

  object BucketSettings {
    /** Bucket::defaults (bucket/settings.rs:49-57). */
    val defaults: BucketSettings = BucketSettings(
      quotaType = Some("NONE"), quotaSize = Some(0L),
      maxBlockSize = Some(64000000L), maxBlockRecords = Some(1024L))

    val QuotaTypes: Set[String] = Set("NONE", "FIFO", "HARD")

    def fromJson(s: String): BucketSettings = {
      import org.json4s._
      implicit val fmts: Formats = DefaultFormats
      val j = org.json4s.jackson.JsonMethods.parseOpt(s).getOrElse(JObject())
      val qt = (j \ "quota_type").extractOpt[String]
      qt.foreach { t =>
        if (!QuotaTypes(t))
          throw new IllegalArgumentException(s"Invalid quota type '$t'")
      }
      BucketSettings(
        quotaType = qt,
        quotaSize = (j \ "quota_size").extractOpt[Long],
        maxBlockSize = (j \ "max_block_size").extractOpt[Long],
        maxBlockRecords = (j \ "max_block_records").extractOpt[Long])
    }
  }

  import org.apache.spark.sql.types._
  /** Stored schema = record schema + dt partition column. */
  val storedSchema: StructType =
    Records.schema.add(StructField("dt", DateType))

  /** Overlay row = record key + full post-patch labels + patch seq. */
  val overlayStoredSchema: StructType = StructType(Seq(
    StructField("bucket", StringType, nullable = false),
    StructField("entry", StringType, nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("labels", MapType(StringType, StringType), nullable = true),
    StructField("seq", LongType, nullable = false),
    StructField("dt", DateType)))

  def emptyRecords(spark: SparkSession): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      Records.schema)

  /** Spark's partition-path escaping (ExternalCatalogUtils.escapePathName):
    * the listed specials, DEL, and ALL control chars below 0x20 — the
    * set must match what partitionBy writes exactly, or path-addressed
    * deletes (overlay purge, partition drop) silently miss dirs for
    * names containing e.g. a tab (review r15). */
  def escapePartition(v: String): String =
    v.flatMap {
      case c if c < ' ' ||
          ("\"#%'*/:=?\\{[]^" + 127.toChar).contains(c) =>
        f"%%${c.toInt}%02X"
      case c => c.toString
    }

  /** Inverse of [[escapePartition]] (Hive-style %XX decoding). */
  def unescapePartition(v: String): String = {
    val sb = new StringBuilder(v.length)
    var i = 0
    while (i < v.length) {
      val c = v.charAt(i)
      if (c == '%' && i + 3 <= v.length) {
        try {
          sb.append(Integer.parseInt(v.substring(i + 1, i + 3), 16).toChar)
          i += 3
        } catch { case _: NumberFormatException => sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
