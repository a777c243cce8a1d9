package graft.engine

/** Interval usage-traffic counters (storage/usage.rs, PR-1474):
  * incremented at the serving-layer IO choke points — single/batch/staged
  * writes and single/batched reads — and drained by the periodic usage
  * flush ([[graft.lifecycle.Lifecycle.flushUsage]]).
  *
  * Per-bucket traffic tracks the set of DISTINCT entries written to /
  * read from this interval (the reference's `written_entries` /
  * `read_entries`). [[drain]] swaps the whole map out, so increments
  * racing a flush roll into the next interval instead of being lost, and
  * a deleted bucket cannot grow the map unbounded.
  *
  * One JVM monitor suffices: increments are driver-side per API call
  * (the per-record work happens in executor tasks, not here), so the
  * critical section is a few field bumps — the same reasoning as the
  * reference's single per-bucket lock.
  */
final class UsageCounters {
  import UsageCounters._

  private var perBucket =
    collection.mutable.Map.empty[String, Traffic]

  def countWrite(bucket: String, entry: String, records: Long,
      bytes: Long): Unit = synchronized {
    val t = perBucket.getOrElseUpdate(bucket, new Traffic)
    t.writeBytes += bytes
    t.recordsWritten += records
    t.writtenEntries += entry
  }

  def countRead(bucket: String, entry: String, records: Long,
      bytes: Long): Unit = synchronized {
    val t = perBucket.getOrElseUpdate(bucket, new Traffic)
    t.readBytes += bytes
    t.recordsRead += records
    t.readEntries += entry
  }

  /** Drain and reset the interval counters. An entry is identified by
    * (bucket, name), so the instance-total distinct-entry counts are the
    * sum of the per-bucket counts (storage/usage.rs:134-136). */
  def drain(): DrainedUsage = synchronized {
    val out = perBucket
    perBucket = collection.mutable.Map.empty
    DrainedUsage(out.iterator.map { case (b, t) =>
      b -> Drained(t.writeBytes, t.readBytes, t.recordsWritten,
        t.recordsRead, t.writtenEntries.size.toLong, t.readEntries.size.toLong)
    }.toMap)
  }
}

object UsageCounters {

  private final class Traffic {
    var writeBytes = 0L
    var readBytes = 0L
    var recordsWritten = 0L
    var recordsRead = 0L
    val writtenEntries = collection.mutable.Set.empty[String]
    val readEntries = collection.mutable.Set.empty[String]
  }

  /** Counter values drained for one flush interval (for the instance
    * total or a single bucket). */
  final case class Drained(writeBytes: Long, readBytes: Long,
      recordsWritten: Long, recordsRead: Long,
      writtenEntries: Long, readEntries: Long)

  final case class DrainedUsage(buckets: Map[String, Drained]) {
    def total: Drained = Drained(
      buckets.valuesIterator.map(_.writeBytes).sum,
      buckets.valuesIterator.map(_.readBytes).sum,
      buckets.valuesIterator.map(_.recordsWritten).sum,
      buckets.valuesIterator.map(_.recordsRead).sum,
      buckets.valuesIterator.map(_.writtenEntries).sum,
      buckets.valuesIterator.map(_.readEntries).sum)
  }
}
