package graft.examples
import graft.core.Records
import graft.engine.{QueryEngine, QuerySpec}
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val records = Records.fromEvents(spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    println("== each_n + limit trailing (window flags) ==")
    QueryEngine.matching(records, QuerySpec(when = Some(
      """{"&type": {"$eq": "click"}, "$each_n": 5, "$limit": 10}"""))).explain()
    println("== ctx_before + ctx_after (frames) ==")
    QueryEngine.matching(records, QuerySpec(when = Some(
      """{"#ctx_before": 2, "#ctx_after": "1h", "&value": {"$gt": 190}}"""))).explain()
    spark.stop()
  }
}
