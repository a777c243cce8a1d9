package graft.engine

import graft.engine.Auth.ApiError

/** In-flight write admission (storage/in_flight.rs, PR-1357; SURVEY
  * §2.8): `RS_IO_MAX_WRITERS_IN_FLIGHT` bounds how many write-path
  * requests the serving layer processes CONCURRENTLY — spool copies and
  * store writes hold a slot for their whole duration, so a flood of
  * slow uploads queues at admission instead of exhausting server
  * threads and staging disk. A queued acquire that waits longer than
  * `RS_IO_OPERATION_TIMEOUT` (default 30 s, cfg/io.rs:14,71-73) is
  * refused with 429, the reference's TooManyRequests contract
  * (in_flight.rs:29-53).
  *
  * READER limiting is deliberately absent: upstream ADDED
  * `RS_IO_MAX_READERS_IN_FLIGHT` in PR-1357 and REMOVED it in PR-1361
  * (CHANGELOG 1.19.7) while keeping writer limiting — reads are
  * already bounded by cursor paging and the cursor cap here.
  *
  * Unset (None) → unlimited, zero overhead (limits.rs Noop pattern). */
final class InFlightIo(maxWriters: Option[Int],
    acquireTimeoutSecs: Long = 30L) {

  private val slots = maxWriters.map(n => new java.util.concurrent.Semaphore(n))

  /** Run `body` holding a writer slot; waits up to the operation
    * timeout for one, then refuses with 429. */
  def withWriterSlot[T](body: => T): T = slots match {
    case None => body
    case Some(sem) =>
      val acquired =
        try sem.tryAcquire(acquireTimeoutSecs,
          java.util.concurrent.TimeUnit.SECONDS)
        catch { case _: InterruptedException =>
          Thread.currentThread().interrupt(); false }
      if (!acquired)
        throw ApiError(429,
          "in-flight writers limit exceeded: try again later")
      try body finally sem.release()
  }

  /** Spec hook: slots currently available (None = unlimited). */
  private[engine] def availableSlots: Option[Int] =
    slots.map(_.availablePermits())
}

object InFlightIo {
  /** Parse the `RS_IO_*` env surface (cfg/io.rs:64-78). Invalid or
    * non-positive values leave the bound unset. */
  def fromEnv(env: Map[String, String]): InFlightIo = new InFlightIo(
    maxWriters = env.get("RS_IO_MAX_WRITERS_IN_FLIGHT")
      .flatMap(_.trim.toIntOption).filter(_ > 0),
    acquireTimeoutSecs = env.get("RS_IO_OPERATION_TIMEOUT")
      .flatMap(_.trim.toLongOption).filter(_ > 0).getOrElse(30L))
}
