package graft.engine

import graft.cond.{CondError, Parser, Value}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The Spark analog of the reference's `.so` extension pipeline
  * (SURVEY §2.7, reduct_base/src/ext.rs:21-66): a `#ext` query directive
  * names a pipeline of processors; each step carries an optional strict
  * `when` filter evaluated against the record INCLUDING computed labels
  * produced by earlier steps (ext_repository.rs:129-220 + tests
  * `test_pipeline_step_when_applies_before_next_step`,
  * `test_pipeline_propagates_computed_labels_to_next_step`). Records
  * failing a step's `when` are dropped before that step.
  *
  * Processors are DataFrame → DataFrame transforms (scalar work stays
  * columnar/codegen; record-splitting uses explode — the Generator analog),
  * so a pipeline is map-only and scales with the scan.
  */
trait RecordProcessor extends Serializable {
  def name: String
  /** Transform the record frame (schema-preserving: may rewrite
    * computed_labels/payload and add/split rows). */
  def process(df: DataFrame, config: JValue): DataFrame
}

final case class PipelineStep(
    processor: String, config: JValue, when: Option[String])

object Processors {

  /** `{"ext_name": {..config..}, "when": {...}}` per step
    * (ext_repository.rs:140-177: exactly one extension name per step). */
  def parseStep(json: String): PipelineStep = {
    val obj = JsonMethods.parse(json) match {
      case JObject(fields) => fields
      case _ => throw CondError("#ext step must be an object")
    }
    val (whenFields, extFields) = obj.partition(_._1 == "when")
    if (extFields.isEmpty)
      throw CondError("Extension name is not found")
    if (extFields.size > 1)
      throw CondError("Each '#ext' pipeline step must contain exactly one extension")
    val (name, config) = extFields.head
    PipelineStep(name, config,
      whenFields.headOption.map(f => JsonMethods.compact(f._2)))
  }

  /** Directive values (the parser stores each step object as a JSON
    * string, parser.rs:108-125) → pipeline. */
  def fromDirective(values: List[Value]): List[PipelineStep] =
    values.map {
      case Value.StrV(s) => parseStep(s)
      case other => throw CondError(s"invalid #ext value: $other")
    }

  /** Run the pipeline: per-step strict `when` (dropping non-matching
    * records), then the processor transform. */
  def run(df: DataFrame, steps: List[PipelineStep],
      registry: Map[String, RecordProcessor]): DataFrame =
    steps.foldLeft(df) { (acc, step) =>
      val proc = registry.getOrElse(step.processor,
        throw CondError(s"Unknown extension '${step.processor}'"))
      val gated = step.when match {
        case Some(w) =>
          // step-local filters are strict (ext_repository.rs:140-147)
          StatefulKernel.run(acc, Parser.parse(w), strict = true)
        case None => acc
      }
      proc.process(gated, step.config)
    }

  // ------------------------------------------------- built-in processors

  /** Merge step-produced computed labels over the existing map with
    * LATER-STEP-WINS semantics: overlapping keys are dropped from the
    * existing side before the concat (same pattern as
    * BucketStore.updateLabels). A bare map_concat would throw
    * DUPLICATE_MAP_KEY under Spark's default mapKeyDedupPolicy the
    * moment two steps produce the same key — a re-run step or two
    * json_extract steps sharing a field must overwrite, not crash. */
  private def mergeComputed(produced: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val base = coalesce(col("computed_labels"), map().cast("map<string,string>"))
    map_concat(map_filter(base, (k, _) => !map_contains_key(produced, k)), produced)
  }

  /** Extract JSON fields from the payload into computed labels:
    * `{"json_extract": {"fields": ["k", "x.y"]}}` → `@k`, `@x.y`. */
  object JsonExtract extends RecordProcessor {
    val name = "json_extract"
    def process(df: DataFrame, config: JValue): DataFrame = {
      val fields = (config \ "fields" match {
        case JArray(vs) => vs.collect { case JString(s) => s }
        case _ => throw CondError("json_extract requires a 'fields' array")
      }).distinct // ["k","k"] must not build a duplicate-keyed map
      if (fields.isEmpty) return df // degenerate-but-valid: no-op step
      val entries = fields.flatMap { f =>
        Seq(lit(f), get_json_object(col("payload").cast("string"), s"$$.$f"))
      }
      df.withColumn("computed_labels",
        mergeComputed(map_filter(map(entries: _*), (_, v) => v.isNotNull)))
    }
  }

  /** Payload statistics as computed labels: `@size`, `@crc32`. */
  object PayloadStats extends RecordProcessor {
    val name = "payload_stats"
    def process(df: DataFrame, config: JValue): DataFrame =
      df.withColumn("computed_labels",
        mergeComputed(map(
          lit("size"), coalesce(length(col("payload")), lit(0)).cast("string"),
          lit("crc32"), crc32(coalesce(col("payload"), lit(Array[Byte]())))
            .cast("string"))))
  }

  /** Record-splitting processor (the Generator analog): one record per
    * payload line, `@line` = 0-based index. A NULL payload behaves like
    * an empty one (one empty line) — posexplode of a NULL split would
    * silently DROP the record from the pipeline. */
  object SplitLines extends RecordProcessor {
    val name = "split_lines"
    def process(df: DataFrame, config: JValue): DataFrame =
      df.select(col("*"), posexplode(
            split(coalesce(col("payload").cast("string"), lit("")), "\n"))
          .as(Seq("__pos", "__line")))
        .withColumn("computed_labels",
          mergeComputed(map(lit("line"), col("__pos").cast("string"))))
        .withColumn("payload", encode(col("__line"), "UTF-8"))
        .drop("__pos", "__line")
  }

  val builtins: Map[String, RecordProcessor] = Map(
    JsonExtract.name -> JsonExtract,
    PayloadStats.name -> PayloadStats,
    SplitLines.name -> SplitLines)

  /** Classpath-discovered processors — the analog of the reference's
    * dynamically loaded `.so` IoExtensions (ext/ext_repository.rs:33-36,
    * ext/ext_repository/load.rs): a third-party jar on the classpath
    * registers a [[RecordProcessor]] implementation under
    * `META-INF/services/graft.engine.RecordProcessor` and `#ext` can name
    * it without rebuilding graft. Loaded once; a discovered processor
    * never shadows a builtin of the same name (builtins win, like the
    * reference rejecting duplicate extension names at load). */
  lazy val discovered: Map[String, RecordProcessor] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[RecordProcessor]).asScala
      .map(p => p.name -> p).toMap
  }

  /** `RS_EXT_PATH` (cfg.rs ext_path, ext/ext_repository.rs): the
    * reference loads compiled extensions from a directory at boot; the
    * JVM-idiomatic container is a JAR — every jar in the directory joins
    * a child classloader and its ServiceLoader-registered
    * [[RecordProcessor]]s enter the registry (same discovery contract as
    * the classpath, same builtins-win shadowing rule). Call once at
    * server boot, before the first `#ext` query compiles the registry. */
  @volatile private var extPathProcessors: Map[String, RecordProcessor] = Map.empty
  def loadExtensionsFrom(dir: String): Int = {
    val d = new java.io.File(dir)
    val jars = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".jar"))
      .map(_.toURI.toURL)
    if (jars.isEmpty) return 0
    val loader = new java.net.URLClassLoader(jars, getClass.getClassLoader)
    import scala.jdk.CollectionConverters._
    // the child loader's ServiceLoader view INCLUDES the parent
    // classpath's providers (parent-first delegation) — only the jars'
    // own additions count as ext-path loads
    val found = java.util.ServiceLoader.load(classOf[RecordProcessor], loader)
      .asScala.map(p => p.name -> p).toMap -- discovered.keySet
    extPathProcessors = extPathProcessors ++ found
    found.size
  }

  /** The full `#ext` registry: builtins + classpath-discovered +
    * RS_EXT_PATH-loaded. `def`, not lazy val: ext-path loading at boot
    * must be visible to queries compiled after it. */
  def registry: Map[String, RecordProcessor] =
    discovered ++ extPathProcessors ++ builtins
}
