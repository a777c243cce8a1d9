package graft.examples

import graft.{GraftSession, SparkEntry}
import java.nio.file.{Files, Paths}

/** Dump the formatted physical plan of EVERY SparkEntry query (or a
  * name-substring subset) to `<outDir>/<query>_<suffix>.txt` — the
  * before/after plan evidence the optimization rounds commit under
  * plans/rNN/ (args: outDir suffix [sfDir] [nameSubstring ...]).
  *
  * Uses the same session shape as Bench (local[$SPARK_GRAFT_CPUS],
  * shuffle.partitions = cpus) so the dumped plans are the plans the
  * bench actually runs, AQE wrapper included. */
object PlanDumpAll {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "plans/r19"
    val suffix = if (args.length > 1) args(1) else "before"
    val dir = if (args.length > 2) args(2) else
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val only = args.drop(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", "graft-plandump")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if only.isEmpty || only.exists(name.contains)) {
      try {
        val df = fn(spark, dir)
        // queryExecution.explainString is .explain("formatted") as a value
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
      } catch { case e: Throwable =>
        failures += s"$name: ${e.getMessage}"
      }
    }
    if (failures.nonEmpty) {
      System.err.println(s"[plandump] ${failures.size} failed:")
      failures.foreach(f => System.err.println(s"  $f"))
    }
    println(s"[plandump] wrote plans to $outDir (suffix _$suffix)")
    spark.stop()
  }
}
