package graft.examples

import graft.pipeline.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Steady-state timing of the bounded-group split variants (dev tool):
  * the shipped anti/semi-broadcast split vs an unbounded all-pairs join
  * (the r7 shape) — isolates the split's fixed cost at sf0.1. */
object SplitProfile {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    def t(name: String)(f: => Any): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val r = f
        println(f"$name%-28s run$i ${(System.nanoTime() - t0) / 1e9}%.2fs  ($r)")
      }
    }
    t("bounded (shipped)")(
      Similarity.cosineDupPairsByGroup(emb, "label", threshold = 0.3).count())
    // r7 shape: no split, pure all-pairs inside groups
    def unbounded = {
      val d = emb.select(col("label").as("g"), col("vec_id").as("id"),
        col("embedding").as("vec"),
        Similarity.norm(col("embedding")).as("nrm"))
      val a = d.as("a"); val b = d.as("b")
      a.join(b, col("a.g") === col("b.g") && col("a.id") < col("b.id"))
        .withColumn("sim",
          Similarity.dot(col("a.vec"), col("b.vec")) /
            (col("a.nrm") * col("b.nrm")))
        .filter(col("sim") >= 0.3)
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    }
    t("unbounded (r7 shape)")(unbounded.count())
    // window-count split variant for comparison
    def windowSplit = {
      val d = emb.select(col("label").as("g"), col("vec_id").as("id"),
        col("embedding").as("vec"),
        Similarity.norm(col("embedding")).as("nrm"))
        .withColumn("__n", count(lit(1)).over(Window.partitionBy("g")))
      val small = d.filter(col("__n") <= 1000).drop("__n")
      val a = small.as("a"); val b = small.as("b")
      a.join(b, col("a.g") === col("b.g") && col("a.id") < col("b.id"))
        .withColumn("sim",
          Similarity.dot(col("a.vec"), col("b.vec")) /
            (col("a.nrm") * col("b.nrm")))
        .filter(col("sim") >= 0.3)
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    }
    t("window split (small only)")(windowSplit.count())
    spark.stop()
  }
}
