package graft.examples

import graft.pipeline.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timing of the embedding-cluster pipeline (dev tool). */
object ClusterProfile {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").cache()
    emb.count()
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%.2fs  ($r)")
    }
    val pairs = Similarity.cosineDupPairsByGroup(emb, "label", threshold = 0.3)
      .select(col("id_a").as("a"), col("id_b").as("b"))
    t("pairs")(pairs.count())
    for (k <- Seq(1, 2, 3, 4, 5, 6, 8, 25))
      t(s"clusters maxRounds=$k")(
        Dedup.dupClusters(emb, pairs, idCol = "vec_id", maxRounds = k)
          .agg(sum(col("cluster_id"))).collect()(0).getLong(0))
    spark.stop()
  }
}
