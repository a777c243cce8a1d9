package graft.examples

import graft.GraftSession
import graft.engine.{BucketStore, QuerySpec}
import org.apache.spark.sql.functions._

/** Measures the label-overlay's scale contract (VERDICT r14 #1, SCALE.md
  * r15): on a payload-heavy store, a small label PATCH must
  *
  *  1. leave every base parquet file byte-untouched (count/bytes/mtimes),
  *  2. write bytes ∝ label data — orders of magnitude below the
  *     partition rewrite the same patch used to cost (measured against
  *     an explicit fold of the same rows), and
  *  3. tax reads only while outstanding, by a broadcast join whose build
  *     side is the patch, not the corpus.
  *
  * REQUIREs are structural (files untouched, amplification bound); wall
  * numbers print for SCALE.md's record. */
object OverlayScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("GRAFT_PROBE_ROWS", "100000").toLong
    val spark = GraftSession.builder("local[32]", "overlay-scale-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("ovprobe").toString
    val store = new BucketStore(spark, dir)

    // N records, ~4.8 KB incompressible-ish payloads, 20 entries x 5 days;
    // 1% carry the label the patch will match
    val day = 86400000000L
    val records = spark.range(n).select(
      lit("b").as("bucket"),
      concat(lit("sensor/"), (col("id") % 20).cast("string")).as("entry"),
      (col("id") * 1000L + (col("id") % 5) * day).as("ts"),
      when(col("id") % 100 === 0, map(lit("sel"), lit("1")))
        .otherwise(map(lit("sel"), lit("0"))).as("labels"),
      map().cast("map<string,string>").as("computed_labels"),
      lit("application/octet-stream").as("content_type"),
      lit(graft.core.Records.State.Finished).as("state"),
      // 150 DISTINCT md5s per row (~4.8 KB) — incompressible, so bytes
      // on disk ≈ logical payload bytes and the amplification ratio is
      // measured against a realistically-sized store (repeat() of one
      // md5 zstd-compresses ~150x and shrank the store to toy size)
      expr("cast(concat_ws('', transform(sequence(1, 150), " +
        "i -> md5(concat(cast(id as string), '-', cast(i as string))))) as binary)")
        .as("payload"))
    store.write(records)

    def baseSnapshot(): (Long, Long, Map[String, Long]) = {
      val root = new org.apache.hadoop.fs.Path(dir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def walk(p: org.apache.hadoop.fs.Path): Iterator[org.apache.hadoop.fs.FileStatus] =
        fs.listStatus(p).iterator.flatMap { st =>
          val nm = st.getPath.getName
          if (nm.startsWith("_") || nm.startsWith(".")) Iterator.empty
          else if (st.isDirectory) walk(st.getPath) else Iterator.single(st)
        }
      val files = walk(root).toVector
      (files.size.toLong, files.map(_.getLen).sum,
        files.map(f => f.getPath.toString -> f.getModificationTime).toMap)
    }
    def treeBytes(sub: String): Long = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$sub")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
    }
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val (nFiles, baseBytes, mtimes) = baseSnapshot()
    println(f"[probe] store: $n rows, $nFiles files, ${baseBytes / 1e6}%.1f MB")

    // -------- 1% PATCH through the overlay
    val (patched, patchWall) = timed {
      store.updateLabels(QuerySpec(when = Some("""{"&sel": {"$eq": 1}}""")),
        set = Map("quality" -> "gold", "pass" -> "r15"))
    }
    val overlayBytes = treeBytes(BucketStore.LabelsDir)
    val (nFiles2, baseBytes2, mtimes2) = baseSnapshot()
    require(nFiles2 == nFiles && baseBytes2 == baseBytes && mtimes2 == mtimes,
      "PATCH touched base files")
    println(f"[probe] PATCH $patched rows: ${patchWall}%.2f s, overlay ${overlayBytes / 1e3}%.1f KB " +
      f"(${overlayBytes * 100.0 / baseBytes}%.3f%% of base) — base files byte-untouched")

    // -------- read overhead while the overlay is outstanding
    def fullScan(): Double =
      timed(store.table().agg(sum(length(col("payload")))).collect())._2
    fullScan() // warm
    val scanWithOverlay = (1 to 3).map(_ => fullScan()).min

    // -------- the counterfactual: fold = the partition rewrite every
    // patch used to pay. Same rows, so the ratio IS the amplification
    // the overlay removed.
    val (folded, foldWall) = timed(store.foldLabelOverlay())
    val rewriteBytes = baseSnapshot()._2 // ≈ bytes the fold rewrote (all partitions had patches)
    println(f"[probe] fold of $folded rows: ${foldWall}%.2f s, rewrote ~${rewriteBytes / 1e6}%.1f MB " +
      f"— per-patch amplification removed: ${rewriteBytes.toDouble / math.max(1, overlayBytes)}%.0fx")
    require(overlayBytes * 50 < rewriteBytes,
      "overlay write must be orders of magnitude below the rewrite")

    fullScan() // warm the folded shape
    val scanFolded = (1 to 3).map(_ => fullScan()).min
    println(f"[probe] full payload scan: with-overlay ${scanWithOverlay}%.2f s vs folded ${scanFolded}%.2f s " +
      f"(overhead ${(scanWithOverlay / scanFolded - 1) * 100}%.0f%%)")

    // labels correct end-to-end
    val gold = store.table()
      .filter(element_at(col("labels"), "quality") === "gold").count()
    require(gold == patched, s"folded labels lost: $gold != $patched")
    println(s"[probe] OK: $gold gold-labeled rows after patch+fold")
    spark.stop()
  }
}
