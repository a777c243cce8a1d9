package graft.engine

/** Cross-request mutation coalescing for the serving layer (SCALE.md
  * r17/r18).
  *
  * Every store mutation is ONE serialized Spark job on the store lock
  * (~0.5-0.8 s) — the measured per-request latency floor of
  * Spark-as-storage-engine. Concurrent HTTP mutations used to pay that
  * job each: 4 clients → 4 serialized jobs. This class folds them:
  * requesters enqueue their prepared request, then contend for the store
  * lock; whoever wins becomes the LEADER and drains the whole queue into
  * a single `process` call under one [[BucketStore.mutating]] section
  * (one Spark job per touched bucket), resolving every folded request's
  * result before releasing the lock. Requests that queued while that
  * mutation ran fold into the NEXT leader's batch. Under no concurrency
  * this degenerates to exactly the old one-request-one-mutation path —
  * no timers, no added latency.
  *
  * Synchronous by construction: `submit` returns only after the shared
  * job containing the request has committed, so post-mutation
  * read-your-write visibility is identical to the un-coalesced path
  * (the SCALE.md visibility caveat was about ASYNC batching; this isn't
  * that). `process` implementations ([[BucketStore.writeFolded]],
  * [[BucketStore.updateLabelsFolded]], [[BucketStore.removeFolded]])
  * preserve serial per-request semantics in queue order — per-request
  * 409/404 maps, quota/cap/free-disk admission, failure isolation.
  *
  * One coalescer per mutation TYPE (write / label-update / remove):
  * different types don't fold into one job, but each type's concurrent
  * requests do, and the types still serialize on the shared store lock.
  *
  * The reference reaches the same amortization through its single-owner
  * storage engine's block writer (storage/engine.rs begin_write feeding
  * a shared block); here the fold is explicit because the unit of store
  * mutation is a Spark job.
  */
final class MutationCoalescer[Req, Res](store: BucketStore,
    process: Seq[Req] => Seq[Either[Throwable, Res]]) {

  private final class Pending(val req: Req) {
    @volatile var result: Either[Throwable, Res] = _
    val done = new java.util.concurrent.CountDownLatch(1)
  }

  private val queue = new java.util.concurrent.ConcurrentLinkedQueue[Pending]()

  /** Observability: total store mutations taken (folds) and total
    * requests served — requests/folds is the amortization factor. */
  val foldedBatches = new java.util.concurrent.atomic.AtomicLong
  val foldedRequests = new java.util.concurrent.atomic.AtomicLong

  /** Requests currently queued, not yet folded (spec synchronization). */
  private[engine] def queuedCount: Int = queue.size()

  /** Run one request — possibly folded with concurrent requests into one
    * store mutation. Returns its positional result from `process`;
    * throws its admission/processing failure exactly as the un-folded
    * path would. */
  def submit(req: Req): Res = {
    // Refuse BEFORE enqueueing on a read-only store: every mutation 403s
    // there (check_mode, engine.rs:163-171), and mutating{} throws before
    // the drain ever runs — an enqueued Pending (holding the full request
    // payload) would never be drained by anyone and leak forever. A
    // replica receiving misdirected or retried writes must not grow
    // memory per rejected request.
    if (store.readOnly) throw new BucketStore.ReadOnlyStoreException(
      "Cannot perform this operation in read-only mode")
    val mine = new Pending(req)
    queue.add(mine)
    store.mutating {
      // Drain whatever is queued NOW. Possibly empty (an earlier leader
      // already folded this request in — its latch is counted); possibly
      // this request plus everything that queued while the previous
      // mutation held the lock.
      var drained = List.empty[Pending]
      var p = queue.poll()
      while (p != null) { drained ::= p; p = queue.poll() }
      if (drained.nonEmpty) {
        val batch = drained.reverse
        foldedBatches.incrementAndGet()
        foldedRequests.addAndGet(batch.size.toLong)
        try {
          val results = process(batch.map(_.req))
          for ((pending, r) <- batch.zip(results)) pending.result = r
        } catch { case t: Throwable =>
          // process isolates per-request failures internally; a throw
          // here is a whole-fold failure (e.g. interrupted) — every
          // drained request must still resolve or its requester blocks
          // forever
          for (pending <- batch if pending.result == null)
            pending.result = Left(t)
        } finally {
          // result-alignment backstop: a `process` that returns FEWER
          // results than requests (a folded-impl bug) would leave the
          // tail unresolved — the latch still opens below, and a null
          // result would NPE the requester. Fail those requests
          // explicitly instead.
          for (pending <- batch if pending.result == null)
            pending.result = Left(new IllegalStateException(
              "coalesced mutation resolved no result for this request " +
                "(process returned fewer results than requests)"))
          batch.foreach(_.done.countDown())
        }
      }
    }
    // resolved either by this thread (as leader) or by an earlier one
    mine.done.await()
    mine.result.fold(throw _, identity)
  }
}
