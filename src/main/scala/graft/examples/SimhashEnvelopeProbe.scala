package graft.examples

import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

/** Measures the simhash band-join envelope (SCALE.md round-14, verdict
  * r13 #4): q_simhash_pairs scales super-linearly with corpus size
  * because candidate volume is `sum over buckets of C(n_b, 2)` and
  * bucket occupancy n_b grows linearly when the 16-bit chunk key space
  * (4 x 65536 keys) is small relative to the corpus. This probe prints
  * the measured envelope terms — bucket count, occupancy histogram tail,
  * candidate pairs, emitted pairs — so the wall-clock ratio can be
  * checked against the candidate ratio directly.
  *
  * Usage: runMain graft.examples.SimhashEnvelopeProbe <dir>
  */
object SimhashEnvelopeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.GraftSession.builder(appName = "graft-simhash-envelope")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count()
    val blocked = docs
      .select(Dedup.simhash64(col("text")).as("fp"))
      .select(col("fp"),
        posexplode(transform(sequence(lit(0), lit(3)),
          b => call_function("shiftright", col("fp"), b * 16)
            .bitwiseAND(lit(0xFFFFL)))).as(Seq("block", "key")))
    val occ = blocked.groupBy("block", "key").count()
    val stats = occ.agg(
      count(lit(1)).as("buckets"),
      max(col("count")).as("max_occ"),
      sum(when(col("count").between(2, 1000),
        (col("count") * (col("count") - 1) / 2).cast("long"))
        .otherwise(0L)).as("cand_pairs"),
      sum(when(col("count") > 1000, lit(1)).otherwise(0L)).as("capped_buckets"))
      .collect()(0)
    val t0 = System.nanoTime()
    val emitted = Dedup.simhashPairs(docs).count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"docs=$n buckets=${stats.getLong(0)} max_occ=${stats.getLong(1)} " +
      f"cand_pairs=${stats.getLong(2)} capped_buckets=${stats.getLong(3)} " +
      f"emitted=$emitted pairs_secs=$secs%.2f")
    spark.stop()
  }
}
