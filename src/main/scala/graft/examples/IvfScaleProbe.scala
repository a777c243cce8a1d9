package graft.examples

import graft.pipeline.Similarity
import org.apache.spark.sql.functions._

/** Proves the round-14 IVF training bound at scale (SCALE.md round-14):
  * on a 100x embeddings corpus the Lloyd refine trains on EXACTLY the
  * `2 * nCentroids * dims` deterministic sample — the training
  * aggregation's executed input row count is REQUIREd to equal the
  * bound, not the corpus — while the assignment pass (map-only) covers
  * the full corpus. Also times a full ivfTopK to show the sample-trained
  * query path end-to-end.
  *
  * Usage: runMain graft.examples.IvfScaleProbe <dir>
  */
object IvfScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.GraftSession.builder(appName = "graft-ivf-scale-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    val seeds = emb.orderBy("vec_id").limit(16).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val bound = 2 * 16 * seeds(0).length

    val t0 = System.nanoTime()
    val (cents, trainRows) =
      Similarity.refineCentroids(emb, seeds, bound, "vec_id", "embedding")
    val tTrain = (System.nanoTime() - t0) / 1e9
    println(f"corpus=$n train_rows=$trainRows bound=$bound " +
      f"train_secs=$tTrain%.2f centroids=${cents.length}")
    require(trainRows == bound.toLong,
      s"training must fold exactly the sample bound: $trainRows != $bound")
    require(trainRows < n, "probe corpus must exceed the bound")

    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val t1 = System.nanoTime()
    val k = Similarity.ivfTopK(emb, queries, 10).count()
    println(f"ivf_topk rows=$k query_secs=${(System.nanoTime() - t1) / 1e9}%.2f")
    spark.stop()
  }
}
