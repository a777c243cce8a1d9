package graft.examples

import graft.core.Records
import graft.engine.{QueryEngine, QuerySpec}
import org.apache.spark.sql.functions._

/** Profiles the sf1-sweep tail (SCALE.md round-14, verdict r13 #4):
  * q_date / q_date2 / q_date_tz showed 8-14x wall at 10x data while
  * their siblings sat near-linear. This probe isolates the components
  * under the EXACT bench shape (cached records frame, labels-select +
  * orderBy + count) so the super-linear ratio can be attributed:
  *
  *   - `baseline` — a `$gt` constant-true condition: pays the cached
  *     scan + select/orderBy/count plumbing, no date eval;
  *   - the three date queries, N repeated passes each (min + spread);
  *   - the same three WITHOUT the bench select/orderBy wrapper
  *     (pure filter-count over the cache).
  *
  * Usage: runMain graft.examples.DateTailProbe <dir> [passes]
  */
object DateTailProbe {

  val Specs: Seq[(String, String)] = Seq(
    "baseline_true" -> """{"$gt": [1, 0]}""",
    "q_date" ->
      """{"$gte": [{"$hour": ["$timestamp"]}, 6],
          "$lte": [{"$hour": ["$timestamp"]}, 18],
          "$in": [{"$weekday": ["$timestamp"]}, 5, 6]}""",
    "q_date_tz" -> """{"$eq": [{"$hour": ["$timestamp", "Europe/Berlin"]}, 9]}""",
    "q_date2" ->
      """{"$and": [
           {"$lt": [{"$minute": ["$timestamp"]}, 15]},
           {"$gte": [{"$second": ["$timestamp"]}, 30]},
           {"$lte": [{"$day": ["$timestamp"]}, 10]},
           {"$eq": [{"$month": ["$timestamp"]}, 1]},
           {"$eq": [{"$year": ["$timestamp"]}, 2024]}
         ]}""")

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val passes = if (args.length > 1) args(1).toInt else 4
    val spark = graft.GraftSession.builder(appName = "graft-date-tail-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ev = Records.fromEvents(spark.read.parquet(s"$dir/events.parquet"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rows = ev.count()
    val parts = ev.rdd.getNumPartitions
    println(s"events: $rows rows, $parts cached partitions")

    def benchShape(when: String) =
      QueryEngine.query(ev, QuerySpec(when = Some(when)))
        .select(
          element_at(col("labels"), "event_id").cast("bigint").as("event_id"),
          col("entry"), col("ts"))
        .orderBy("event_id")

    def bare(when: String) =
      QueryEngine.query(ev, QuerySpec(when = Some(when)))

    for ((name, when) <- Specs; shape <- Seq("bench", "bare")) {
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        val c = (if (shape == "bench") benchShape(when) else bare(when)).count()
        ((System.nanoTime() - t0) / 1e9, c)
      }
      val secs = times.map(_._1)
      println(f"$name%-14s $shape%-5s rows=${times.head._2}%-8d " +
        f"min=${secs.min}%.3f max=${secs.max}%.3f all=" +
        secs.map(t => f"$t%.2f").mkString(","))
    }
    spark.stop()
  }
}
