package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The staging-cache registry: operators that keep a compact intermediate
  * alive across downstream branches must leave an eviction handle behind
  * (a persist the caller can't reach accumulates over a long session). */
class StagingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("stage registers a cache; unstageAll evicts every entry") {
    Staging.unstageAll()
    val df = Staging.stage(Seq(1, 2, 3).toDF("x"))
    assert(df.count() == 3)
    assert(Staging.stagedCount == 1)
    assert(df.storageLevel.useMemory, "staged frame must be cached")
    Staging.unstageAll()
    assert(Staging.stagedCount == 0)
    assert(!df.storageLevel.useMemory, "unstageAll must evict the cache")
  }

  test("staged operators leave their caches reachable for eviction") {
    Staging.unstageAll()
    val docs = Seq((1L, "alpha beta alpha"), (2L, "beta gamma"))
      .toDF("doc_id", "text")
    TextAnalysis.tfidfTopTerms(docs, k = 2).count()
    assert(Staging.stagedCount >= 1,
      "tfidfTopTerms must register its tf staging table")
    Staging.unstageAll()
    assert(Staging.stagedCount == 0)
  }
}
