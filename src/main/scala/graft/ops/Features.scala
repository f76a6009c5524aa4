package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Feature-engineering operators for training-set assembly
  * (SURVEY.md §2.13): categorical target encoding with leave-one-out
  * semantics — the classic high-cardinality-categorical device that
  * replaces one-hot blow-up with the category's target mean while
  * excluding each row's OWN label from its encoding (the leakage
  * guard).
  *
  * Determinism: all arithmetic is integer micros with floor division —
  * sums of BIGINT micros are exact, the smoothed LOO quotient is a
  * single integer division, and both engines agree bit-for-bit (the
  * TPC-H Q11/Q17 cross-multiplication device).
  *
  * Scale: one aggregation keyed by the category (segments: tiny;
  * high-cardinality categories: still one combine-friendly hash agg),
  * the category stats broadcast back, and the encode itself is
  * map-only. Nothing is ever pairwise, and no window appears. */
object Features {

  /** Laplace-style smoothing weight toward the global prior. */
  val LooSmoothing = 10L

  /** Leave-one-out encode of the customer market segment against order
    * totals: each order's feature is the smoothed mean total of OTHER
    * orders in its segment. `(Σ_seg − y + m·prior) div (n_seg − 1 + m)`;
    * a singleton segment degrades to the prior exactly. */
  def looTargetEncode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey",
        Num.micros($"o_totalprice").as("y"))
    val cust = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_mktsegment".as("segment"))
    val rows = orders.join(cust, $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"segment", $"y")
    val segStats = rows.groupBy($"segment")
      .agg(sum($"y").as("seg_sum"), count(lit(1)).as("seg_n"))
    val prior = rows.agg(
      expr("sum(y) DIV count(*)").as("prior"))
    rows
      .join(broadcast(segStats), "segment")
      .crossJoin(broadcast(prior))
      .select($"o_orderkey", $"segment",
        expr(s"(seg_sum - y + ${LooSmoothing}L * prior) DIV (seg_n - 1 + $LooSmoothing)")
          .as("loo_enc_micros"))
      .orderBy($"o_orderkey")
  }

  val looTargetEncodeSql: String = {
    val y = Num.sqlMicros("o_totalprice")
    s"""WITH rows_ AS (
       |  SELECT o_orderkey, c_mktsegment AS segment, $y AS y
       |  FROM orders JOIN customer ON o_custkey = c_custkey),
       |seg AS (
       |  SELECT segment, sum(y) AS seg_sum, count(*) AS seg_n
       |  FROM rows_ GROUP BY 1),
       |prior AS (SELECT sum(y) // count(*) AS prior FROM rows_)
       |SELECT o_orderkey, rows_.segment AS segment,
       |  CAST((seg_sum - y + $LooSmoothing * prior)
       |    // (seg_n - 1 + $LooSmoothing) AS BIGINT) AS loo_enc_micros
       |FROM rows_, seg, prior
       |WHERE rows_.segment = seg.segment
       |ORDER BY o_orderkey""".stripMargin
  }
}
