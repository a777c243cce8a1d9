package graft.examples

import graft.{GraftSession, SparkEntry}

/** Focused per-query timing with the Bench convention (untimed warmup,
  * then N passes of min-of-2) for a name-substring subset — the tight
  * A/B loop for optimization work (args: [sfDir] nameSubstring ...).
  * NOT the graded bench: prints a human table, not the JSON contract. */
object QueryTimeProbe {
  def main(args: Array[String]): Unit = {
    val (dir, only) =
      if (args.nonEmpty && args(0).startsWith("/")) (args(0), args.drop(1))
      else (sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"), args)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("GRAFT_BENCH_PASSES", "3").toInt
    val spark = GraftSession.builder(s"local[$cpus]", "graft-qtime")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries.filter { case (n, _) =>
      only.isEmpty || only.exists(n.contains) }.toSeq.sortBy(_._1)
    for ((n, fn) <- qs) fn(spark, dir).count() // warmup
    val acc = scala.collection.mutable.LinkedHashMap.empty[String, List[Double]]
    for (_ <- 1 to passes) {
      val per = scala.collection.mutable.Map.empty[String, Double]
      for (_ <- 1 to 2; (n, fn) <- qs) {
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val t = (System.nanoTime() - t0) / 1e9
        per(n) = math.min(per.getOrElse(n, Double.MaxValue), t)
      }
      graft.pipeline.Staging.unstageAll()
      for ((n, t) <- per) acc(n) = acc.getOrElse(n, Nil) :+ t
    }
    def median(xs: List[Double]) = { val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size/2 - 1) + s(s.size/2)) / 2 }
    println(f"${"query"}%-24s median   passes")
    var tot = 0.0
    for ((n, xs) <- acc) {
      tot += median(xs)
      println(f"$n%-24s ${median(xs)}%7.3f  ${xs.map(x => f"$x%.3f").mkString(" ")}")
    }
    println(f"${"TOTAL"}%-24s $tot%7.3f")
    spark.stop()
  }
}
