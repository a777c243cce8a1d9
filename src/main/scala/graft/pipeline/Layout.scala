package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators: how the data is ARRANGED on storage decides
  * what a 100-TB scan can skip. Parquet keeps per-row-group min/max
  * stats; a reader prunes a row group when its bounding box misses the
  * predicate. Sorting by one column gives perfect pruning on that column
  * and none on any other — Z-ordering interleaves the bits of several
  * columns so every file covers a small HYPER-RECTANGLE of the combined
  * key space, and selective predicates on ANY of the ordered columns
  * skip most files.
  */
object Layout {

  /** Bit-interleave two already-scaled non-negative int columns (each in
    * `[0, 2^bits)`) into a Z-value. Pure shifts/masks — whole-stage
    * codegen'd, no UDF. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftrightunsigned(a.cast("long"), i)
          .bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftrightunsigned(b.cast("long"), i)
          .bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Persist `df` as a BUCKETED table: rows are hash-partitioned into
    * `buckets` files by `key` AT WRITE TIME and sorted within each, and
    * the catalog records the layout. A later equi-join (or aggregation)
    * on `key` between two tables bucketed the same way runs with NO
    * shuffle exchange — at 100 TB, pre-bucketing the fact tables once
    * converts every subsequent co-located join from a full network
    * shuffle into a local merge. The write itself costs one hash
    * exchange; it is amortized over every downstream join.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Z-order `df` across two numeric columns into `nFiles` write tasks:
    * min/max-scale each column to `bits`-bit grid coordinates, compute
    * the interleaved Z-value, range-partition + sort by it. Writing the
    * result yields files whose (colA, colB) bounding boxes tile the
    * plane — the multi-dimensional data-skipping layout (the technique
    * behind Delta/Iceberg OPTIMIZE ZORDER, built from public Spark
    * primitives).
    *
    * The min/max scan is one tiny aggregate (4 longs to the driver);
    * the layout itself is one range exchange. Ties and skew degrade
    * gracefully: equal Z-values stay adjacent.
    */
  def zOrdered(df: DataFrame, colA: String, colB: String, nFiles: Int,
      bits: Int = 16): DataFrame =
    withZValue(df, colA, colB, bits, "__z")
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")

  /** Append the Z-value of (`colA`, `colB`) as `outCol`: each column
    * min/max-scaled onto a `bits`-bit grid (one tiny aggregate), then
    * bit-interleaved. The scaling chain is subtract/divide/floor on
    * doubles — correctly-rounded IEEE ops, engine-portable. */
  def withZValue(df: DataFrame, colA: String, colB: String, bits: Int,
      outCol: String): DataFrame = {
    val mm = df.agg(
      min(col(colA).cast("double")).as("minA"),
      max(col(colA).cast("double")).as("maxA"),
      min(col(colB).cast("double")).as("minB"),
      max(col(colB).cast("double")).as("maxB")).head()
    // min/max are null on an empty or all-null column — fall back to a
    // degenerate [0,0] range so the scaling chain stays well-defined.
    def d(i: Int): Double = if (mm.isNullAt(i)) 0d else mm.getDouble(i)
    val (minA, maxA) = (d(0), d(1))
    val (minB, maxB) = (d(2), d(3))
    val hi = (1L << bits) - 1
    // A null coordinate must yield a NULL Z-value, not the top grid
    // cell: floor(NULL) is NULL and least() SKIPS nulls, so without the
    // guard least(hi, NULL) = hi parks every null row at the corner.
    // Guard on the CAST value — a non-numeric coordinate is just as
    // null after cast("double") as a true NULL.
    def scaled(c: Column, lo: Double, hiV: Double): Column = {
      val d = c.cast("double")
      if (hiV <= lo) when(d.isNotNull, lit(0L))
      else when(d.isNotNull, least(lit(hi), floor(
        (d - lit(lo)) / lit(hiV - lo) * lit(hi + 1.0))
        .cast("long")))
    }
    df.withColumn(outCol,
      zValue(scaled(col(colA), minA, maxA), scaled(col(colB), minB, maxB),
        bits))
  }
}
