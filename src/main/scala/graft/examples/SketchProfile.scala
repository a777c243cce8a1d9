package graft.examples

import graft.pipeline.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timing for simhash/LSH-ANN at sf0.1 (dev tool). */
object SketchProfile {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs  ($r)")
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet").cache()
    docs.count()
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").cache()
    emb.count()

    val withFp = docs.select(col("doc_id").as("id"), Dedup.simhash64(col("text")).as("fp"))
    t("simhash fingerprints")(withFp.count())
    t("simhash pairs full")(Dedup.simhashPairs(docs, maxHamming = 8).count())
    val queriesDf = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val bucketed = emb.select(col("vec_id").as("nid"), col("embedding").as("nvec"),
      Similarity.lshSignature(col("embedding"), 8, 64).as("bucket"))
    t("lsh bucketing")(bucketed.count())
    t("lsh full")(Similarity.lshTopK(emb, queriesDf, 10).count())
    t("lsh full 2nd")(Similarity.lshTopK(emb, queriesDf, 10).count())
    t("minhash full")(Dedup.minhashPairs(docs, threshold = 0.3).count())
    t("minhash full 2nd")(Dedup.minhashPairs(docs, threshold = 0.3).count())
    spark.stop()
  }
}
