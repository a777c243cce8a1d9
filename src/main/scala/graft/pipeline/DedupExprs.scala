package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the hash-sketch operators.
  *
  * The equivalent built-in higher-order-function pipelines
  * (`array_min(transform(...))` × 64 permutations, `aggregate(zip_with(
  * transform(...)))` × 64 bits) evaluate interpreted with per-element
  * boxing — ~dims×perms×rows allocations dominate sketch building. These
  * are tight primitive loops behind a single static call, with identical
  * outputs (same permutation constants / same xxhash64).
  */
object DedupRuntime {

  /** 60-bit content hash: the first 15 hex chars of md5 as a long. The
    * cross-engine canonical hash — DuckDB reproduces it exactly as
    * `('0x' || substring(md5(s),1,15))::BIGINT`, which is what makes the
    * sketch operators oracle-checkable end-to-end. */
  def h60(s: String): Long = {
    val md = localMd5.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 8 bytes big-endian, then drop the low nibble = first 15 hex chars
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    v >>> 4
  }
  private val localMd5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** MinHash permutation constants — md5-derived (via [[h60]]) so an
    * external engine can regenerate them from the same formula; single
    * source of truth for any signature width. Values < 2^31 so
    * a*(h mod P)+b stays in Long. */
  val P = 2147483647L // 2^31-1
  def perms(numHashes: Int): Array[(Long, Long)] =
    Array.tabulate(numHashes)(j =>
      (h60(s"graft:minhash:a:$j") % (P - 1) + 1, h60(s"graft:minhash:b:$j") % P))

  private val permCache = new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def permArrays(n: Int): (Array[Long], Array[Long]) =
    permCache.computeIfAbsent(n, k => {
      val ps = perms(k); (ps.map(_._1), ps.map(_._2))
    })

  /** hashed shingles (any non-negative longs; folded mod P internally) →
    * minhash signature of width n. */
  def minhashSig(hashed: ArrayData, n: Int): ArrayData = {
    val (as, bs) = permArrays(n)
    val m = hashed.numElements()
    val folded = new Array[Long](m)
    var i = 0
    while (i < m) { folded(i) = hashed.getLong(i) % P; i += 1 }
    val out = new Array[Any](n)
    var j = 0
    while (j < n) {
      val a = as(j); val b = bs(j)
      var min = Long.MaxValue
      i = 0
      while (i < m) {
        val v = (a * folded(i) + b) % P
        if (v < min) min = v
        i += 1
      }
      out(j) = min
      j += 1
    }
    new GenericArrayData(out)
  }

  /** text, k → SORTED DISTINCT 60-bit md5 hashes of word k-shingles.
    * One native pass: tokenize (same `\s+`-on-trimmed rule as
    * TextAnalysis.tokens), build k-gram strings, [[h60]] each, dedupe.
    * Docs with 0 < tokens < k hash the whole token string as one shingle;
    * empty text → empty array. Replaces a HOF pipeline in which Catalyst
    * re-inlined the tokenization into the shingle lambda — re-splitting
    * the text once per shingle index (~50x redundant regex work/doc). */
  def shingleHash60(text: UTF8String, k: Int): ArrayData = {
    val s = text.toString.trim
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    val toks = s.split("\\s+")
    val set = new java.util.TreeSet[java.lang.Long]()
    if (toks.length < k) set.add(h60(toks.mkString(" ")))
    else {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= toks.length - k) {
        sb.setLength(0)
        var j = 0
        while (j < k) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
        set.add(h60(sb.toString))
        i += 1
      }
    }
    val out = new Array[Any](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  /** text → 60-bit SimHash long over [[h60]] token hashes (tokens with
    * multiplicity, same tokenization as above; bits 60-63 always 0).
    * Oracle-reproducible: DuckDB recomputes the same bit votes from the
    * same per-token md5 hashes. */
  def simhash60(text: UTF8String): Long = {
    val s = text.toString.trim
    if (s.isEmpty) return 0L
    val toks = s.split("\\s+")
    val counts = new Array[Int](60)
    var i = 0
    while (i < toks.length) {
      val h = h60(toks(i))
      var j = 0
      while (j < 60) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 60) { if (counts(j) > 0) fp |= (1L << j); j += 1 }
    fp
  }

  /** Left-fold dot product over two numeric arrays, accumulated in double
    * — bit-identical to `aggregate(zip_with(a, b, *), 0.0, +)` (same
    * IEEE operation order) but a primitive loop instead of an interpreted
    * higher-order-function pipeline with per-element boxing. Arrays may be
    * float or double (floats widen exactly). */
  def dotProduct(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  /** One-pass repetition statistics over whitespace tokens (same
    * trim-spaces + `\s+` tokenization as TextAnalysis.tokens, including
    * the empty-leading-token behavior on tab/newline-led text): token
    * count, mode frequency, distinct-token count, and k-gram
    * total/distinct counts for k = 2, 3. Replaces an interpreted HOF
    * pipeline that was O(tokens × distinct) with per-element boxing —
    * this is O(tokens) hash counting in one primitive pass, so a 50k-token
    * document costs 50k map operations instead of tens of millions of
    * boxed comparisons. Returns
    * (n_tokens, top_count, n_distinct, n_2grams, d_2grams, n_3grams,
    * d_3grams), all long; ratio arithmetic stays in the Column layer so
    * rounding matches the oracle exactly. */
  def repetitionStats(text: UTF8String): InternalRow = {
    val raw = text.toString
    // Spark's trim() strips 0x20 only — match it exactly, not String.trim
    var b = 0; var e = raw.length
    while (b < e && raw.charAt(b) == ' ') b += 1
    while (e > b && raw.charAt(e - 1) == ' ') e -= 1
    if (b == e)
      return new GenericInternalRow(Array[Any](0L, 0L, 0L, 0L, 0L, 0L, 0L))
    val toks = raw.substring(b, e).split("\\s+")
    val n = toks.length
    val counts = new java.util.HashMap[String, Integer](n * 2)
    var top = 0
    var i = 0
    while (i < n) {
      val c = counts.merge(toks(i), 1, (a: Integer, d: Integer) => a + d)
      if (c > top) top = c
      i += 1
    }
    def kgramDistinct(k: Int): Long =
      if (n < k) 0L
      else {
        val set = new java.util.HashSet[String]((n - k + 1) * 2)
        val sb = new java.lang.StringBuilder
        var i = 0
        while (i <= n - k) {
          sb.setLength(0)
          var j = 0
          while (j < k) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
          set.add(sb.toString)
          i += 1
        }
        set.size.toLong
      }
    new GenericInternalRow(Array[Any](n.toLong, top.toLong, counts.size.toLong,
      math.max(n - 1, 0).toLong, kgramDistinct(2),
      math.max(n - 2, 0).toLong, kgramDistinct(3)))
  }

  /** Intersection size of two SORTED long arrays (single merge pass, no
    * hash set, no boxing). The pairwise-similarity hot loop: set-Jaccard
    * over hashed token/shingle sets runs per candidate PAIR, so this is
    * the most-executed kernel in dedup. */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var n = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

}

/** array<bigint> hashed shingles → array<bigint> minhash signature. */
final case class MinhashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    DedupRuntime.minhashSig(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.pipeline.DedupRuntime.minhashSig($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSigExpr =
    copy(child = newChild)
}

/** string text → bigint 60-bit simhash fingerprint. */
final case class Simhash60Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash60"

  override protected def nullSafeEval(input: Any): Any =
    DedupRuntime.simhash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.pipeline.DedupRuntime.simhash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Simhash60Expr =
    copy(child = newChild)
}

/** string text → sorted distinct array<bigint> of 60-bit k-shingle hashes. */
final case class ShingleHash60Expr(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hash60"

  override protected def nullSafeEval(input: Any): Any =
    DedupRuntime.shingleHash60(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.pipeline.DedupRuntime.shingleHash60($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash60Expr =
    copy(child = newChild)
}

/** (array<float|double>, array<float|double>) → double dot product. */
final case class DotProductExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(s"dot over $other")
  }
  private lazy val lf = isFloat(left)
  private lazy val rf = isFloat(right)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DedupRuntime.dotProduct(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lf, rf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.pipeline.DedupRuntime.dotProduct($a, $b, $lf, $rf)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductExpr =
    copy(left = l, right = r)
}

/** string text → struct of one-pass repetition statistics (all bigint). */
final case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = RepetitionStatsExpr.schema
  override def prettyName: String = "graft_repetition_stats"

  override protected def nullSafeEval(input: Any): Any =
    DedupRuntime.repetitionStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.pipeline.DedupRuntime.repetitionStats($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpr =
    copy(child = newChild)
}

object RepetitionStatsExpr {
  val schema: StructType = StructType(
    Seq("n_tokens", "top_count", "n_distinct",
      "n_2grams", "d_2grams", "n_3grams", "d_3grams")
      .map(StructField(_, LongType, nullable = false)))
}

/** (sorted array<bigint>, sorted array<bigint>) → int intersection size. */
final case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DedupRuntime.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.pipeline.DedupRuntime.sortedIntersectCount($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCountExpr =
    copy(left = l, right = r)
}

object DedupExprs {
  /** [[graft.core.EvalOnceExpr]] as a Column combinator — the optimizer
    * fence pinning an expensive expression to one evaluation site (see
    * that class for the rewrites it blocks, all observed in the r19
    * plan audit: kernels inside Filter AND Project of one stage,
    * threshold filters reordered FIRST in join conditions ahead of the
    * cheap prunes, per-element re-evaluation inside transform lambdas). */
  def evalOnce(c: Column): Column = graft.core.EvalOnce(c)
  def minhashSig(hashed: Column, numHashes: Int): Column =
    GraftColumnBridge.column(
      MinhashSigExpr(GraftColumnBridge.expression(hashed), numHashes))
  def simhash60(text: Column): Column =
    GraftColumnBridge.column(
      Simhash60Expr(GraftColumnBridge.expression(text)))
  def shingleHash60(text: Column, k: Int): Column =
    GraftColumnBridge.column(
      ShingleHash60Expr(GraftColumnBridge.expression(text), k))
  def repetitionStats(text: Column): Column =
    GraftColumnBridge.column(
      RepetitionStatsExpr(GraftColumnBridge.expression(text)))
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftColumnBridge.column(SortedIntersectCountExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def dotProduct(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProductExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
