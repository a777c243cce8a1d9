package graft.examples

import graft.engine.BucketStore
import org.apache.spark.sql.functions._

/** Times the many-entry store write under FileOutputCommitter algorithm
  * v1 vs v2 (SCALE.md round-14): a 10k-entry batch creates 10k+
  * partition dirs, and v1's JOB commit moves them serially on the
  * driver while v2 moves files at TASK commit (parallel). Run once per
  * algorithm — the conf is fixed at session creation.
  *
  * Usage: runMain graft.examples.CommitterProbe <1|2> [entries] [threads]
  */
object CommitterProbe {
  def main(args: Array[String]): Unit = {
    val algo = args.headOption.getOrElse("1")
    val entries = if (args.length > 1) args(1).toInt else 10000
    val threads = if (args.length > 2) args(2).toInt else 4
    val spark = graft.GraftSession
      .builder(s"local[$threads]", "graft-committer-probe")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", algo)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val store = new BucketStore(spark,
      java.nio.file.Files.createTempDirectory("graft-committer").toString)
    // isolate the HttpApiSpec delta: GRAFT_PROBE_HTTP=1 starts an HttpApi
    // on the store (usage-flush timer + serving caches) before the write
    val api = if (sys.env.get("GRAFT_PROBE_HTTP").contains("1")) {
      val a = new graft.engine.HttpApi(store, apiToken = "root-token")
      a.start(); Some(a)
    } else None
    val rows = spark.range(entries).select(
      lit("big").as("bucket"),
      concat(lit("e"), col("id")).as("entry"),
      col("id").as("ts"),
      map(lit("k"), lit("v")).as("labels"),
      typedLit(Map.empty[String, String]).as("computed_labels"),
      lit("text/plain").as("content_type"),
      lit(graft.core.Records.State.Finished).as("state"),
      lit("x".getBytes).as("payload"))
    // GRAFT_PROBE_META=1 unions the HttpApiSpec test's 50 $meta entries
    // (slash-escaped partition names) to replicate the exact test input
    val input = if (sys.env.get("GRAFT_PROBE_META").contains("1")) {
      val meta = spark.range(50).select(
        lit("big").as("bucket"),
        concat(lit("e"), col("id") * 1000, lit("/$meta")).as("entry"),
        (col("id") + 20000).as("ts"),
        map(lit("k"), lit("v")).as("labels"),
        typedLit(Map.empty[String, String]).as("computed_labels"),
        lit("text/plain").as("content_type"),
        lit(graft.core.Records.State.Finished).as("state"),
        lit("m".getBytes).as("payload"))
      rows.unionByName(meta)
    } else rows
    val t0 = System.nanoTime()
    store.write(input)
    val tWrite = (System.nanoTime() - t0) / 1e9
    // the read side the HttpApiSpec bound test also pays: /list-shaped
    // serving metadata over the fresh 10k-partition-dir tree (partition
    // discovery + distributed counts)
    val t1 = System.nanoTime()
    val distinctEntries = store.tableOrEmpty()
      .select(col("bucket"), col("entry")).distinct().count()
    val tList1 = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val bounds = store.tableOrEmpty().groupBy("bucket")
      .agg(min("ts"), max("ts")).collect().length
    val tList2 = (System.nanoTime() - t2) / 1e9
    println(f"algo=$algo entries=$entries threads=$threads " +
      f"http=${api.nonEmpty} write_secs=$tWrite%.1f " +
      f"list1_secs=$tList1%.1f list2_secs=$tList2%.1f " +
      f"entries_seen=$distinctEntries buckets=$bounds")
    api.foreach(_.stop())
    spark.stop()
  }
}
