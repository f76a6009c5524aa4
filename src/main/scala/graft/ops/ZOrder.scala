package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional data skipping
  * — the layout optimization behind Delta/Iceberg `OPTIMIZE ZORDER`,
  * re-expressed on plain parquet + open Spark APIs.
  *
  * Why it matters at 100 TB: parquet scans skip row groups whose
  * column min/max don't intersect a pushed-down predicate. Sorting by
  * ONE column makes that pruning perfect for that column and useless
  * for every other; interleaving the bits of k columns into one sort
  * key gives every participating column locality, so a selective
  * predicate on ANY of them skips most row groups. The reference has no
  * storage-layout operators at all (pandas reads whole CSVs); this is
  * part of the additive scale surface.
  *
  * The z-value is pure codegen column math (shift/and/or chains — no
  * UDF): each column is min/max-normalized to `bits` bits, then bit b
  * of column i lands at position b·k+i of the key. Layout writes are
  * `repartitionByRange(z)` (range exchange = contiguous curve segments
  * per file) + `sortWithinPartitions(z)` (contiguous segments per row
  * group within each file).
  */
object ZOrder {

  /** Bit-interleaved Morton key over min/max-normalized columns.
    * `ranges` = (min, max) per column, typically from one `agg` pass.
    * Total key width k·bits must stay ≤ 62. */
  def zValue(cols: Seq[Column], ranges: Seq[(Double, Double)], bits: Int = 16): Column = {
    val k = cols.size
    require(k >= 1, "at least one column")
    require(k * bits <= 62, s"$k cols × $bits bits overflow a long")
    val maxVal = (1L << bits) - 1
    // normalize each column to [0, 2^bits) as a long
    val quantized = cols.zip(ranges).map { case (c, (lo, hi)) =>
      val span = math.max(hi - lo, Double.MinPositiveValue)
      least(greatest(
        floor((c.cast("double") - lit(lo)) / lit(span) * lit(maxVal.toDouble)),
        lit(0.0)), lit(maxVal.toDouble)).cast("long")
    }
    // interleave: bit b of column i → key bit b·k + i
    val parts = for {
      b <- 0 until bits
      (q, i) <- quantized.zipWithIndex
    } yield shiftleft(shiftright(q, b).bitwiseAND(lit(1L)), b * k + i)
    parts.reduce(_.bitwiseOR(_))
  }

  /** One aggregation pass for the normalization ranges. Empty input (or
    * an all-null column) yields the degenerate (0, 0) range — zValue
    * clamps everything to bucket 0, and an empty write stays valid. */
  def columnRanges(df: DataFrame, cols: Seq[String]): Seq[(Double, Double)] = {
    val aggs = cols.flatMap(c => Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    cols.indices.map { i =>
      if (r.isNullAt(2 * i)) (0.0, 0.0)
      else (r.getDouble(2 * i), r.getDouble(2 * i + 1))
    }
  }

  /** Rewrite `df` as `numFiles` z-clustered parquet files. Two jobs: the
    * range exchange samples z boundaries, the write streams through —
    * no driver materialization, so it scales to any input size. */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
                    numFiles: Int, bits: Int = 16): Unit = {
    val z = zValue(cols.map(col), columnRanges(df, cols), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  private val OracleBits = 10
  private val OracleSpan = 1024.0 // power of two ⇒ the quantization
  // divide is exact in IEEE doubles, so floor() agrees across engines

  /** Oracle twin of [[zValue]]: Morton keys over two bounded integer
    * derivations of the documents table, with FIXED power-of-two ranges
    * (data-independent, so the DuckDB replay needs no min/max pass and
    * every arithmetic step is bit-exact in both engines). */
  def zKeyQuery(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val src = graft.Tables.documents(spark, dir)
      .select(col("doc_id"),
        (col("doc_id") % 1024).cast("long").as("xk"),
        least(col("n_chars"), lit(1023L)).cast("long").as("yk"))
    src.select(col("doc_id"),
        zValue(Seq(col("xk"), col("yk")),
          Seq((0.0, OracleSpan), (0.0, OracleSpan)), OracleBits).as("z_key"))
      .orderBy("doc_id")
  }

  /** The same interleave unrolled into DuckDB bit operators. */
  val zKeySql: String = {
    def quant(e: String) =
      s"CAST(least(greatest(floor(($e - 0.0) / $OracleSpan * 1023.0), 0.0), 1023.0) AS BIGINT)"
    val qs = Seq(quant("(doc_id % 1024)"), quant("least(n_chars, 1023)"))
    val terms = for {
      b <- 0 until OracleBits
      (q, i) <- qs.zipWithIndex
    } yield s"((($q >> $b) & 1) << ${b * 2 + i})"
    // NOTE: no stripMargin here — the bitwise-OR '|' at a line start
    // would be eaten as a margin marker
    s"SELECT doc_id,\n  ${terms.mkString("\n  | ")} AS z_key\n" +
      "FROM documents\nORDER BY doc_id"
  }
}
