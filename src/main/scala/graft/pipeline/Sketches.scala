package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded-memory frequency sketches for corpus statistics at 100-TB
  * scale, where an exact per-term count would shuffle one row per
  * distinct term and the vocabulary is unbounded (URLs, n-grams, user
  * ids). The SpaceSaving summary (Metwally et al., "Efficient
  * computation of frequent and top-k elements in data streams") keeps at
  * most `capacity` counters per partial aggregate; partials merge
  * associatively, so Spark plans an ordinary two-phase aggregation whose
  * shuffle volume is `capacity × partitions` — independent of both row
  * count and vocabulary size.
  *
  * Exactness contract (what the DuckDB oracle leans on): while no
  * eviction has occurred in any partial — i.e. `capacity ≥` the realized
  * distinct-key count — every reported count is exact and `err == 0`.
  * Past that point counts are overestimates bounded by `err`, the
  * classic SpaceSaving guarantee. Callers pick `capacity` as the memory
  * budget, not as a correctness knob.
  */
object Sketches {

  /** One reported heavy hitter: `count` overestimates the true frequency
    * by at most `err` (0 ⇒ exact). */
  case class HeavyHitter(term: String, count: Long, err: Long)

  /** Mutable partial state: term → [count, err], plus the largest count
    * ever evicted (`floor`) — the overestimate a merge must charge for
    * terms this partial may have dropped. Kryo-encoded; Spark's object
    * hash aggregation keeps it deserialized within a partition, so the
    * per-row cost is one HashMap probe. */
  final class SpaceSavingBuffer(
      val counters: java.util.HashMap[String, Array[Long]],
      var floor: Long) extends Serializable

  /** finish() wrapper so the output encoder is a plain product. */
  case class HeavyHitters(items: Seq[HeavyHitter])

  /** SpaceSaving aggregator over one string column. `finish` reports the
    * top-`k` surviving counters ordered (count desc, term asc). */
  final class SpaceSavingAgg(capacity: Int, k: Int)
      extends Aggregator[String, SpaceSavingBuffer, HeavyHitters] {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(k > 0, s"k must be positive, got $k")

    override def zero: SpaceSavingBuffer =
      new SpaceSavingBuffer(new java.util.HashMap[String, Array[Long]], 0L)

    /** Evict the (count, term)-minimal counter, raising the floor. */
    private def evictMin(b: SpaceSavingBuffer): Long = {
      var minTerm: String = null
      var minCount = Long.MaxValue
      val it = b.counters.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue()(0)
        if (c < minCount || (c == minCount && e.getKey < minTerm)) {
          minTerm = e.getKey; minCount = c
        }
      }
      b.counters.remove(minTerm)
      b.floor = math.max(b.floor, minCount)
      minCount
    }

    override def reduce(b: SpaceSavingBuffer, term: String): SpaceSavingBuffer = {
      if (term == null) return b // null is absence, not a countable term
      val cur = b.counters.get(term)
      if (cur != null) cur(0) += 1
      else if (b.counters.size < capacity)
        b.counters.put(term, Array(1L + b.floor, b.floor))
      else {
        val evicted = evictMin(b)
        b.counters.put(term, Array(evicted + 1, evicted))
      }
      b
    }

    override def merge(a: SpaceSavingBuffer, b: SpaceSavingBuffer): SpaceSavingBuffer = {
      // Union the counter sets: a term absent from one side is charged
      // that side's floor as both count contribution and error (it may
      // have been seen up to `floor` times there before eviction).
      val out = new SpaceSavingBuffer(
        new java.util.HashMap[String, Array[Long]], a.floor + b.floor)
      def add(src: SpaceSavingBuffer, other: SpaceSavingBuffer): Unit = {
        val it = src.counters.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (!out.counters.containsKey(e.getKey)) {
            val ca = e.getValue
            val cb = other.counters.get(e.getKey)
            val (oc, oe) =
              if (cb != null) (cb(0), cb(1)) else (other.floor, other.floor)
            out.counters.put(e.getKey, Array(ca(0) + oc, ca(1) + oe))
          }
        }
      }
      add(a, b); add(b, a)
      while (out.counters.size > capacity) evictMin(out)
      out
    }

    override def finish(b: SpaceSavingBuffer): HeavyHitters = {
      import scala.jdk.CollectionConverters._
      val all = b.counters.asScala.toSeq
        .map { case (t, ce) => HeavyHitter(t, ce(0), ce(1)) }
        .sortBy(h => (-h.count, h.term))
      HeavyHitters(all.take(k))
    }

    override def bufferEncoder: Encoder[SpaceSavingBuffer] =
      Encoders.kryo[SpaceSavingBuffer]
    override def outputEncoder: Encoder[HeavyHitters] =
      Encoders.product[HeavyHitters]
  }

  /** [[SpaceSavingAgg]] over token ARRAYS: one aggregator row per
    * document instead of one per token, so the object-agg per-row
    * overhead (encoder conversion, group probe) is paid per doc. Same
    * sketch, same guarantees. */
  final class SpaceSavingArrAgg(capacity: Int, k: Int)
      extends Aggregator[Seq[String], SpaceSavingBuffer, HeavyHitters] {
    private val one = new SpaceSavingAgg(capacity, k)
    override def zero: SpaceSavingBuffer = one.zero
    override def reduce(b: SpaceSavingBuffer, terms: Seq[String]): SpaceSavingBuffer = {
      // Null array = absence, matching the scalar aggregator's
      // null-term contract (a null text row must not kill the task).
      if (terms != null) terms.foreach(one.reduce(b, _))
      b
    }
    override def merge(a: SpaceSavingBuffer, b: SpaceSavingBuffer): SpaceSavingBuffer =
      one.merge(a, b)
    override def finish(b: SpaceSavingBuffer): HeavyHitters = one.finish(b)
    override def bufferEncoder: Encoder[SpaceSavingBuffer] =
      Encoders.kryo[SpaceSavingBuffer]
    override def outputEncoder: Encoder[HeavyHitters] =
      Encoders.product[HeavyHitters]
  }

  private def explodeHH(df: DataFrame, groupCol: String): DataFrame =
    df.select(col(groupCol), posexplode(col("hh.items")))
      .select(col(groupCol),
        col("col.term").as("term"),
        col("col.count").as("count"),
        col("col.err").as("err"),
        (col("pos") + 1).cast("long").as("rank"))

  /** Top-`k` most frequent values of `termCol` per `groupCol`, computed
    * with a per-group SpaceSaving sketch of at most `capacity` counters:
    * (group, term, count, err, rank). The input is never shuffled —
    * partial sketches are built map-side and merged on the group key.
    */
  def heavyHittersPerGroup(df: DataFrame, groupCol: String, termCol: Column,
      capacity: Int, k: Int): DataFrame = {
    val agg = udaf(new SpaceSavingAgg(capacity, k), Encoders.STRING)
    explodeHH(
      df.select(col(groupCol), termCol.as("term"))
        .groupBy(col(groupCol))
        .agg(agg(col("term")).as("hh")),
      groupCol)
  }

  /** Count-Min frequency sketch: a `depth`×`width` counter matrix; each
    * term increments one counter per row (row-seeded md5 hash), a point
    * query reads the MINIMUM across rows. Never underestimates; the
    * overestimate is bounded by collisions (≤ 2N/width with probability
    * 1−2^−depth, the classic guarantee). Partials merge by matrix
    * addition, so Spark runs it as an ordinary two-phase aggregation
    * with `depth·width·8` bytes per partial — the frequency-table
    * companion to [[SpaceSavingAgg]] when you need counts for ARBITRARY
    * query terms later, not just the top-k. */
  final class CountMinBuffer(val m: Array[Long]) extends Serializable

  final class CountMinAgg(depth: Int, width: Int)
      extends Aggregator[String, CountMinBuffer, Array[Long]] {
    require(depth > 0 && width > 0,
      s"depth/width must be positive, got $depth x $width")
    override def zero: CountMinBuffer =
      new CountMinBuffer(new Array[Long](depth * width))
    override def reduce(b: CountMinBuffer, term: String): CountMinBuffer = {
      if (term == null) return b
      val ss = CountMin.cachedSlots(term, depth, width)
      var r = 0
      while (r < depth) {
        b.m(r * width + ss(r)) += 1
        r += 1
      }
      b
    }
    override def merge(a: CountMinBuffer, b: CountMinBuffer): CountMinBuffer = {
      var i = 0
      while (i < a.m.length) { a.m(i) += b.m(i); i += 1 }
      a
    }
    override def finish(b: CountMinBuffer): Array[Long] = b.m
    override def bufferEncoder: Encoder[CountMinBuffer] =
      Encoders.kryo[CountMinBuffer]
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  object CountMin {
    /** Row-seeded slot for a term: md5 is stable across engines and
      * restarts (no JVM hash seeding), so sketches are reproducible —
      * and the 60-bit hex-prefix convention matches the repo's other
      * md5-derived oracles, so any SQL engine regenerates the exact
      * matrix: `('0x' || substring(md5(r || ':' || term), 1, 15))::BIGINT
      * % width`. */
    private val localMd5 =
      ThreadLocal.withInitial[java.security.MessageDigest](() =>
        java.security.MessageDigest.getInstance("MD5"))

    // Object-scoped per-thread slot memo (like localMd5): shared by every
    // task on the executor thread, so real token streams — which repeat a
    // heavy-tailed vocabulary — amortize the depth MD5s per term to a map
    // lookup across the WHOLE job, and completed tasks strand nothing
    // (an instance-scoped cache would reset cold per task and leave its
    // map on the thread). Bounded at 64k terms per (depth, width); rarer
    // terms just recompute.
    private val slotCaches = ThreadLocal.withInitial[
        java.util.HashMap[(Int, Int), java.util.HashMap[String, Array[Int]]]](
      () => new java.util.HashMap)

    private[pipeline] def cachedSlots(term: String, depth: Int,
        width: Int): Array[Int] = {
      val cache = slotCaches.get().computeIfAbsent((depth, width),
        _ => new java.util.HashMap[String, Array[Int]])
      val hit = cache.get(term)
      if (hit != null) return hit
      val s = Array.tabulate(depth)(r => slot(term, r, width))
      if (cache.size < 65536) cache.put(term, s)
      s
    }

    def slot(term: String, row: Int, width: Int): Int = {
      val md = localMd5.get()
      md.reset()
      val d = md.digest(s"$row:$term".getBytes("UTF-8"))
      // first 15 hex chars = first 60 bits = big-endian first-long >>> 4
      // (bit-identical to parsing the hex prefix, without string churn)
      val h = java.nio.ByteBuffer.wrap(d).getLong(0) >>> 4
      (h % width).toInt
    }

    /** Point query against a finished sketch matrix. */
    def estimate(m: Array[Long], term: String, depth: Int,
        width: Int): Long = {
      var best = Long.MaxValue
      var r = 0
      while (r < depth) {
        val c = m(r * width + slot(term, r, width))
        if (c < best) best = c
        r += 1
      }
      best
    }
  }

  /** [[heavyHittersPerGroup]] fed one token ARRAY per row (e.g. a
    * document's terms): identical output, ~an order of magnitude less
    * aggregator-row overhead on long documents. */
  def heavyHittersPerGroupArr(df: DataFrame, groupCol: String,
      termsCol: Column, capacity: Int, k: Int): DataFrame = {
    val agg = udaf(new SpaceSavingArrAgg(capacity, k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]())
    explodeHH(
      df.select(col(groupCol), termsCol.as("terms"))
        .groupBy(col(groupCol))
        .agg(agg(col("terms")).as("hh")),
      groupCol)
  }
}
