package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
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

  /** MinHash permutation constants — single source of truth for any
    * signature width (LCG, fixed seed, values < 2^31 so a*x+b stays in
    * Long; see Dedup.perms rationale). */
  val P = 2147483647L // 2^31-1
  def perms(numHashes: Int): Array[(Long, Long)] = {
    var s = 0x5DEECE66DL
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s >>> 17 }
    Array.fill(numHashes)(((next() % (P - 1)) + 1, next() % P))
  }

  private val permCache = new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def permArrays(n: Int): (Array[Long], Array[Long]) =
    permCache.computeIfAbsent(n, k => {
      val ps = perms(k); (ps.map(_._1), ps.map(_._2))
    })

  /** hashedShingles (longs in [0,P)) → minhash signature of width n. */
  def minhashSig(hashed: ArrayData, n: Int): ArrayData = {
    val (as, bs) = permArrays(n)
    val m = hashed.numElements()
    val out = new Array[Any](n)
    var j = 0
    while (j < n) {
      val a = as(j); val b = bs(j)
      var min = Long.MaxValue
      var i = 0
      while (i < m) {
        val v = (a * hashed.getLong(i) + b) % P
        if (v < min) min = v
        i += 1
      }
      out(j) = min
      j += 1
    }
    new GenericArrayData(out)
  }

  /** tokens → 64-bit SimHash (xxhash64 seed 42, same as functions.xxhash64). */
  def simhash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val m = tokens.numElements()
    var i = 0
    while (i < m) {
      val t = tokens.getUTF8String(i)
      if (t != null) {
        val h = XxHash64Function.hash(t, StringType, 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) fp |= (1L << j); j += 1 }
    fp
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

/** array<string> tokens → bigint simhash fingerprint. */
final case class Simhash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any =
    DedupRuntime.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.pipeline.DedupRuntime.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Simhash64Expr =
    copy(child = newChild)
}

object DedupExprs {
  def minhashSig(hashed: Column, numHashes: Int): Column =
    GraftColumnBridge.column(
      MinhashSigExpr(GraftColumnBridge.expression(hashed), numHashes))
  def simhash64(tokens: Column): Column =
    GraftColumnBridge.column(
      Simhash64Expr(GraftColumnBridge.expression(tokens)))
}
