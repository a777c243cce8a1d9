package graft.core

import org.apache.spark.sql.{Column, Dataset}

/** AQE-proof hash co-location.
  *
  * `ds.repartition(cols…)` without a count is planned as
  * REPARTITION_BY_COL, which the adaptive planner may coalesce by BYTES
  * — on a small shuffle it merges everything into ONE partition. That
  * is the wrong trade for the two shapes this repo uses column
  * repartitioning for:
  *
  *  - dynamic-partition writes: each (bucket, entry, dt) group lands
  *    wholly in one task under either plan, so the output file count is
  *    identical — coalescing only serializes the per-file constant
  *    (open/footer/rename, plus a forked `chmod` per create on
  *    libhadoop-less local filesystems). Measured: a 10k-entry write is
  *    189 s in the coalesced single task vs ~10 s at 32 tasks.
  *  - per-group sequential kernels and chunked windows: the bounded
  *    per-task-slice invariant (SCALE.md) must not silently collapse to
  *    one task at mid scale just because the bytes are small.
  *
  * Pinning the session's shuffle-partition count (REPARTITION_BY_NUM)
  * keeps the hash co-location identical while forbidding the coalesce.
  */
object Partitioning {
  def pinned[T](ds: Dataset[T], cols: Column*): Dataset[T] =
    ds.repartition(
      ds.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt,
      cols: _*)

  /** Range flavor, same rationale. AQE's coalesce would merge only
    * ADJACENT ranges (order survives), so for the prefix-sum shapes this
    * backs it is a parallelism question, not a correctness one. */
  def pinnedByRange[T](ds: Dataset[T], cols: Column*): Dataset[T] =
    ds.repartitionByRange(
      ds.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt,
      cols: _*)
}
