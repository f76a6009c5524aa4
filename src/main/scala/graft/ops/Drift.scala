package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two corpus snapshots — the
  * check a training-data pipeline runs before trusting a new ingest:
  * Population Stability Index over reference-quantile bins,
  * PSI = Σ_b (cur_b − ref_b) · ln(cur_b / ref_b).
  * Industry reading: < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted.
  *
  * Shape: bin edges come from ONE exact-percentile aggregation on the
  * reference (a bins-sized driver array — model-sized at any scale);
  * both sides then bin in a map-only pass (edges folded into a codegen
  * filter-count expression) and aggregate to `bins` rows each. Nothing
  * driver-side ever sees a data row. Engine-specific floats (ln) keep
  * this spec-gated rather than oracle-hashed. */
object Drift {

  /** Per-bin report: [bin, ref_n, cur_n, ref_frac, cur_frac, psi_term];
    * total PSI = sum of psi_term. `bins` interior edges are the
    * reference's equally-spaced quantiles, so ref fractions are ~1/bins
    * by construction and empty-reference-bin pathologies can't occur. */
  def psiReport(ref: DataFrame, cur: DataFrame, valueCol: String,
                bins: Int = 10, epsilon: Double = 1e-6): DataFrame = {
    require(bins >= 2, "need at least two bins")
    val probs = (1 until bins).map(_.toDouble / bins)
    val edgeRow = ref.agg(
      percentile(col(valueCol), lit(probs.toArray)).as("edges")).head()
    val edges = edgeRow.getSeq[Double](0)

    def binned(df: DataFrame, side: String): DataFrame = {
      // bin index = number of edges at-or-below the value (0..bins-1)
      val bin = edges.foldLeft(lit(0): Column)((acc, e) =>
        acc + (col(valueCol) > lit(e)).cast("int"))
      df.select(bin.as("bin"))
        .groupBy("bin").agg(count(lit(1)).as(s"${side}_n"))
    }
    val r = binned(ref, "ref")
    val c = binned(cur, "cur")
    val refTotal = ref.count().toDouble
    val curTotal = cur.count().toDouble
    require(refTotal > 0 && curTotal > 0, "both slices must be non-empty")
    r.join(c, Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
      .withColumn("ref_frac",
        greatest(col("ref_n") / refTotal, lit(epsilon)))
      .withColumn("cur_frac",
        greatest(col("cur_n") / curTotal, lit(epsilon)))
      .withColumn("psi_term",
        (col("cur_frac") - col("ref_frac")) * log(col("cur_frac") / col("ref_frac")))
      .orderBy("bin")
  }

  /** Oracle-gated integer core of [[psiReport]] (`a_psi_bins`): the
    * per-bin (ref_n, cur_n) contingency table for a document-length
    * drift check between two corpus halves (ref = even doc_id, cur =
    * odd). Everything float-fragile about PSI is the ln() — the bin
    * COUNTS are pure integers once the edges agree, and the exact
    * interpolating percentile is already hash-stable cross-engine
    * (a_quantiles), so this pins the quantile-edge fold + binning +
    * full-outer merge; DriftSpec keeps gating the ln step. */
  def psiBins(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), length(col("text")).cast("double").as("v"))
    val ref = docs.filter(col("doc_id") % 2 === 0)
    val cur = docs.filter(col("doc_id") % 2 === 1)
    psiReport(ref, cur, "v", bins = 10)
      .select(col("bin").cast("long").as("bin"), col("ref_n"), col("cur_n"))
      .orderBy("bin")
  }

  val psiBinsSql: String =
    """WITH vals AS (SELECT doc_id, CAST(len(text) AS DOUBLE) AS v FROM documents),
      |r AS (SELECT v FROM vals WHERE doc_id % 2 = 0),
      |c AS (SELECT v FROM vals WHERE doc_id % 2 = 1),
      |e AS (SELECT quantile_cont(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9])
      |        AS edges FROM r),
      |rb AS (SELECT list_sum(list_transform(e.edges, x -> CAST(v > x AS INT)))
      |         AS bin, count(*) AS ref_n FROM r, e GROUP BY 1),
      |cb AS (SELECT list_sum(list_transform(e.edges, x -> CAST(v > x AS INT)))
      |         AS bin, count(*) AS cur_n FROM c, e GROUP BY 1)
      |SELECT CAST(COALESCE(rb.bin, cb.bin) AS BIGINT) AS bin,
      |  COALESCE(ref_n, 0) AS ref_n, COALESCE(cur_n, 0) AS cur_n
      |FROM rb FULL OUTER JOIN cb ON rb.bin = cb.bin
      |ORDER BY bin""".stripMargin

  /** Total PSI as a scalar. */
  def psi(ref: DataFrame, cur: DataFrame, valueCol: String,
          bins: Int = 10): Double =
    psiReport(ref, cur, valueCol, bins)
      .agg(sum(col("psi_term"))).head().getDouble(0)

  /** Categorical PSI — drift of a discrete column's mix (language,
    * source, event type): categories ARE the bins, so this is two
    * category-sized aggregations and a full-outer join. A category
    * present on one side only contributes through the epsilon floor
    * rather than exploding the log. */
  def psiCategoricalReport(ref: DataFrame, cur: DataFrame, catCol: String,
                           epsilon: Double = 1e-6): DataFrame = {
    val refTotal = ref.count().toDouble
    val curTotal = cur.count().toDouble
    require(refTotal > 0 && curTotal > 0, "both slices must be non-empty")
    val r = ref.groupBy(col(catCol)).agg(count(lit(1)).as("ref_n"))
    val c = cur.groupBy(col(catCol)).agg(count(lit(1)).as("cur_n"))
    r.join(c, Seq(catCol), "full_outer")
      .select(col(catCol),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
      .withColumn("ref_frac", greatest(col("ref_n") / refTotal, lit(epsilon)))
      .withColumn("cur_frac", greatest(col("cur_n") / curTotal, lit(epsilon)))
      .withColumn("psi_term",
        (col("cur_frac") - col("ref_frac")) * log(col("cur_frac") / col("ref_frac")))
      .orderBy(catCol)
  }

  def psiCategorical(ref: DataFrame, cur: DataFrame, catCol: String): Double =
    psiCategoricalReport(ref, cur, catCol)
      .agg(sum(col("psi_term"))).head().getDouble(0)
}
