package graft.engine

import graft.SparkTestBase
import graft.core.Records
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Physical-plan assertions guarding the scale claims in SCALE.md: the
  * store's partition layout must actually prune, filters must reach the
  * parquet scan, and payload must be column-pruned out of metadata-only
  * paths. A refactor that silently breaks any of these would still pass
  * the value-correctness suites — this spec fails instead. */
class PlanSpec extends AnyFunSuite with SparkTestBase {

  private val day = 86400000000L

  private def newStore(): BucketStore = {
    val store = new BucketStore(spark, Files.createTempDirectory("graft-plan").toString)
    import scala.jdk.CollectionConverters._
    val rows = (for {
      e <- Seq("sensor/a", "sensor/b"); d <- 0 until 5
    } yield Row("b", e, d * day + e.length, Map("k" -> d.toString),
      Map.empty[String, String], "", Records.State.Finished,
      s"payload-$e-$d".getBytes)).asJava
    store.write(spark.createDataFrame(rows, Records.schema))
    store
  }

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("time-range filters reach the parquet scan (PushedFilters)") {
    val store = newStore()
    val plan = planOf(QueryEngine.matching(store.table(),
      QuerySpec(start = Some(day), stop = Some(3 * day))))
    assert(plan.contains("PushedFilters:") &&
      plan.contains("GreaterThanOrEqual(ts,"),
      s"ts range must push into the scan:\n$plan")
  }

  test("entry filters become partition pruning (PartitionFilters)") {
    val store = newStore()
    val plan = planOf(QueryEngine.matching(store.table(),
      QuerySpec(entries = Some(Seq("sensor/a")))))
    // entry is a partition column: the isin must land in PartitionFilters,
    // not in post-scan Filter
    val partSection = plan.linesIterator
      .find(_.contains("PartitionFilters:")).getOrElse("")
    assert(partSection.contains("entry"),
      s"entry filter must prune partitions:\n$plan")
  }

  test("only_metadata and count paths never read payload (ReadSchema)") {
    val store = newStore()
    val q = QueryEngine.query(store.table(),
      QuerySpec(onlyMetadata = true, when = Some("""{"&k": {"$gte": 0}}""")))
    val scanLine = planOf(q).linesIterator
      .filter(_.contains("ReadSchema:")).mkString("\n")
    assert(!scanLine.contains("payload"),
      s"metadata-only query must column-prune payload:\n$scanLine")
  }

  test("pure when trees stay inside whole-stage codegen") {
    val store = newStore()
    val plan = planOf(QueryEngine.matching(store.table(), QuerySpec(when = Some(
      """{"$and": [{"&k": {"$gte": 1}}, {"$lt": [{"$mult": ["&k", 2]}, 100]}]}"""))))
    // `*(N)` prefixes mark whole-stage-codegen stages in the plan string;
    // the Filter carrying the compiled condition must be inside one
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("Filter")),
      s"compiled condition must be codegen'd:\n$plan")
  }

  test("rewrite scans prune to affected partitions only") {
    val store = newStore()
    // delete one record on one day of one entry; the rewrite must not
    // scan the other entry's partitions
    val removed = store.removeQuery(QuerySpec(
      entries = Some(Seq("sensor/a")),
      start = Some(day), stop = Some(2 * day)))
    assert(removed == 1)
    // all other records intact
    assert(store.table().count() == 9)
    assert(store.table().filter(col("entry") === "sensor/b").count() == 5)
  }

  test("bulk-export plan: one range exchange, no redundant global sort") {
    val store = newStore()
    val plan = planOf(store.exportPlan(QuerySpec(), nShards = 4))
    val exchanges = "(?i)exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"export must pay exactly ONE exchange (the range\n$plan")
    assert(plan.toLowerCase.contains("rangepartitioning"),
      s"the one exchange must be the range exchange\n$plan")
    // the sort inside each shard is partition-local; a GLOBAL sort node
    // would mean queryUnordered leaked the cursor path's orderBy under
    // the repartition (a second, redundant ordering step)
    assert(!"(?i)sort \\[.*global=true".r.unanchored.matches(plan) &&
      !plan.contains("global=true"), s"no global sort in the export plan\n$plan")
  }
}
