package graft.examples

import graft.SparkEntry
import graft.pipeline.Dedup
import org.apache.spark.sql.SparkSession

/** Scale probe for the PAIR-GENERATING operator family (dev tool; its
  * numbers land in SCALE.md). Pair volume is the only quantity in the
  * repo that can grow super-linearly in principle — everything else is
  * linear or span-bounded — so this probe runs exactly the driver's
  * pair queries at whatever slice it is pointed at (e.g. the 100×
  * documents slice from tools/gen_docs100.py) and, for each, prints
  * wall time, output rows, and the cap diagnostics
  * (dropped_buckets / dropped_ids / max_bucket_size per capped stage):
  * the caps are the mechanism that keeps the family sub-quadratic, and
  * the probe records WHERE they start binding, not just that timings
  * stayed flat while they silently dropped work.
  *
  * Usage: runMain graft.examples.PairScaleProbe <dir> [query...]
  */
object PairScaleProbe {

  val Family: Seq[String] = Seq(
    "q_dedup_exact", "q_minhash_pairs", "q_simhash_pairs",
    "q_jaccard_pairs", "q_jaccard_capped", "q_dup_clusters",
    "q_cluster_keep", "q_embed_dup", "q_embed_lsh_dup", "q_embed_clusters",
    "q_semantic_dedup")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val wanted = if (args.length > 1) args.drop(1).toSeq else Family
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (name <- wanted) {
      try {
        // time CONSTRUCTION too: some operators (dupClusters' guarded
        // small-graph path, the adaptive group split) run bounded eager
        // work while the frame is built
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, dir)
        // run df's OWN QueryExecution (df.count() would wrap the plan in a
        // fresh execution and the CollectMetrics accumulators of THIS plan
        // would never fire); toRdd.count() executes the exact plan whose
        // observedMetrics capDiagnostics reads, without collecting rows
        val n = df.queryExecution.toRdd.count()
        val dt = (System.nanoTime() - t0) / 1e9
        val caps = Dedup.capDiagnostics(df)
        val capsStr =
          if (caps.isEmpty) "-"
          else caps.toSeq.sortBy(_._1).map { case (k, (b, i, m)) =>
            s"$k[dropped_buckets=$b dropped_ids=$i max_bucket=$m]"
          }.mkString(" ")
        println(f"PROBE $name%-18s ${dt}%8.2f s  rows=$n%-10d caps: $capsStr")
      } catch { case e: Throwable =>
        println(s"PROBE $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
