package graft.examples

import graft.pipeline.{Dedup, DedupExprs, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the minhash near-dup pipeline (dev tool). */
object MinhashProfile {
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
    val docs = spark.read.parquet(s"$sf/documents.parquet").cache()
    docs.count()

    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs  ($r)")
    }

    val k = 3; val numHashes = 64; val bands = 16; val r = numHashes / bands
    val withSig = docs
      .select(col("doc_id").as("id"),
        Dedup.shingleHashes(col("text"), k).as("hs"))
      .filter(size(col("hs")) > 0)
      .withColumn("sig", Dedup.minhashSignature(col("hs"), numHashes))
      .drop("hs")

    t("signatures")(withSig.count())
    val banded = withSig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => slice(col("sig"), b * r + 1, lit(r)))).as(Seq("band", "bucket")))
    t("banded")(banded.count())
    val byBucket = banded.groupBy("band", "bucket")
      .agg(collect_list(col("id")).as("grp"))
      .filter(size(col("grp")).between(2, 1000))
    t("buckets")(byBucket.count())
    t("bucket sizes")(byBucket.agg(sum(size(col("grp")) * size(col("grp")))).collect()(0))
    val pairs = byBucket.select(explode(expr(
      """filter(
           flatten(transform(grp, (x, i) ->
             transform(slice(grp, i + 2, size(grp)), y ->
               struct(least(x, y) as a, greatest(x, y) as b)))),
           p -> p.a < p.b)""")).as("p"))
      .select(col("p.a"), col("p.b"))
      .dropDuplicates("a", "b")
    t("pairs")(pairs.count())
    t("full minhashPairs")(Dedup.minhashPairs(docs, threshold = 0.3).count())
    spark.stop()
  }
}
