package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Glob cases from storage/entry/pattern.rs:75-120 tests. */
class EntryPatternSpec extends AnyFunSuite with graft.SparkTestBase {
  import EntryPattern.{matches, resolve}

  test("pattern.rs case table") {
    assert(matches("acc-a", "acc-*"))
    assert(matches("acc-a/sub-entry", "acc-*")) // raw prefix when no '/'
    assert(!matches("other", "acc-*"))
    assert(matches("a/x/b", "/a/*/b"))
    assert(matches("a/y/b", "/a/*/b"))
    assert(!matches("a/x/d/b", "/a/*/b"))
    assert(matches("a/x/b", "/a/**/b"))
    assert(matches("a/x/d/b", "/a/**/b"))
    assert(matches("a/b", "/a/**"))
    assert(matches("a/private/x/b", "/a/private/**"))
    assert(!matches("a/public/x/b", "/a/private/**"))
    assert(!matches("a/x/b", "/**/**/"))
    assert(matches("exact", "exact"))
    assert(!matches("exact2", "exact"))
  }

  test("include/exclude resolution (bucket/query.rs:96-154)") {
    val all = Seq("acc-a/x", "acc-b/y", "other", "sys/$meta")
    assert(resolve(all, None) == Seq("acc-a/x", "acc-b/y", "other"))
    assert(resolve(all, Some(Seq("*"))) == Seq("acc-a/x", "acc-b/y", "other"))
    assert(resolve(all, Some(Seq("acc-*"))) == Seq("acc-a/x", "acc-b/y"))
    assert(resolve(all, Some(Seq("acc-*", "!acc-b/y"))) == Seq("acc-a/x"))
    assert(resolve(all, Some(Seq("!other"))) == Seq("acc-a/x", "acc-b/y"))
    // exact name bypasses the wildcard-queryable check
    assert(resolve(all, Some(Seq("sys/$meta"))) == Seq("sys/$meta"))
  }

  test("predicateCol is a differential twin of resolve") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val entries = Seq("acc-a", "acc-a/x", "acc-b/y", "other", "a/x/b",
      "a/x/d/b", "a/b", "a", "a/private/x/b", "a/public/x/b", "exact",
      "exact2", "$meta", "sys/$meta", "deep/a/b/c/x")
    val patternSets: Seq[Option[Seq[String]]] = Seq(
      None, Some(Seq("*")), Some(Seq.empty), Some(Seq("acc-*")),
      Some(Seq("acc-*", "!acc-b/y")), Some(Seq("!other")),
      Some(Seq("sys/$meta")), Some(Seq("a/*/b")), Some(Seq("a/**/b")),
      Some(Seq("a/**")), Some(Seq("**/x")), Some(Seq("**/b", "!a/b")),
      Some(Seq("a/private/**")), Some(Seq("exact")),
      Some(Seq("a/**/**")), Some(Seq("deep/**/x")))
    val df = entries.toDF("entry")
    for (pats <- patternSets) {
      val fromCol = df.filter(EntryPattern.predicateCol(col("entry"), pats))
        .collect().map(_.getString(0)).toSet
      val fromResolve = resolve(entries, pats).toSet
      assert(fromCol == fromResolve,
        s"pattern set $pats: column gave $fromCol, resolve gave $fromResolve")
    }
  }
}
