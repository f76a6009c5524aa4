package graft.ml

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed PCA over the embedding column (SURVEY.md §2.13) — the
  * whitening/decorrelation step curation pipelines run before cosine
  * thresholds (e.g. SemDeDup preprocessing) and the classic
  * dimensionality reducer for cheap ANN.
  *
  * Shape: ONE aggregation computes (n, Σv, Σ v·vᵀ) — a d + d² buffer
  * that map-side combines, so the corpus is read once and nothing
  * driver-side scales with rows. The 64×64 covariance eigenproblem is
  * solved on the driver with cyclic Jacobi rotations (model-sized, like
  * the k-means centroid step), and the top-k components broadcast back
  * into a codegen projection (`graft_dot` per component) — map-only
  * scoring, the same serve shape as the frozen LogReg classifier.
  *
  * Floats are engine-specific (eigensolvers have no cross-engine
  * identity), so the query entry is rows-only; PcaSpec gates the math
  * against first principles instead: eigen-residuals ‖Cw − λw‖,
  * orthonormality, descending spectrum, total-variance conservation,
  * planted-direction recovery, and a full-rank reconstruction
  * round-trip. */
object Pca {

  val Dim: Int = graft.similarity.Ann.Dim
  /** Components kept by the default projection query. */
  val K = 8

  /** (count, Σv, upper-triangular Σ v·vᵀ) in one mergeable buffer —
    * the algebraic pair treeAggregate combines map-side. */
  private class GramAgg(d: Int) extends Serializable {
    private val triLen = d * (d + 1) / 2
    def zero: Array[Double] = new Array[Double](1 + d + triLen)
    def reduce(b: Array[Double], v: Array[Float]): Array[Double] = {
      b(0) += 1.0
      var i = 0
      while (i < d) { b(1 + i) += v(i); i += 1 }
      var k = 1 + d
      i = 0
      while (i < d) {
        var j = i
        while (j < d) { b(k) += v(i).toDouble * v(j); k += 1; j += 1 }
        i += 1
      }
      b
    }
    def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
  }

  /** Integer twin of [[GramAgg]] over QUANTIZED vectors — identical
    * reduce/merge loop structure, but the buffer is exact BIGINT, so the
    * distributed accumulator admits a cross-engine oracle
    * (`s_pca_gram_core`): integer + is associative-commutative, so any
    * partitioning/merge order yields the same sums bit-for-bit, and
    * DuckDB replays them in SQL. This gates the ACCUMULATOR — the one
    * treeAggregate pass PCA rides — leaving only the driver-side Jacobi
    * eigen step float-engine-specific (rows-only, PcaSpec carries it). */
  private class LongGramAgg(d: Int) extends Serializable {
    private val triLen = d * (d + 1) / 2
    def zero: Array[Long] = new Array[Long](1 + d + triLen)
    def reduce(b: Array[Long], v: Array[Long]): Array[Long] = {
      b(0) += 1L
      var i = 0
      while (i < d) { b(1 + i) += v(i); i += 1 }
      var k = 1 + d
      i = 0
      while (i < d) {
        var j = i
        while (j < d) { b(k) += v(i) * v(j); k += 1; j += 1 }
        i += 1
      }
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
  }

  /** `s_pca_gram_core`: the (n, Σq, Σ q·qᵀ) Gram accumulator over the
    * ANN-standard quantization `round(x·1000)` (the same SQL round the
    * embedding-dedup oracles replay), emitted as (i, j, s) rows:
    * (-1, -1) = n, (i, -1) = Σqᵢ, (i, j≥i) = Σqᵢqⱼ upper-triangular —
    * 1 + d + d(d+1)/2 = 2,145 rows at d=64, a model-sized result from
    * ONE map-side-combining treeAggregate pass regardless of corpus
    * size. The DuckDB oracle replays every sum in SQL, so the hash gate
    * proves the distributed Gram pass is exact — the t_perplexity_core /
    * t_dsir_bins integer-core device applied to PCA. */
  def pcaGramCore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Dim
    val agg = new LongGramAgg(d)
    val scale = graft.similarity.Ann.QuantScale
    val acc = Tables.embeddings(spark, dir)
      .select(expr(
        s"transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * $scale) AS BIGINT))")
        .as("qv"))
      .as[Array[Long]].rdd
      .treeAggregate(agg.zero)(
        (b, v) => agg.reduce(b, v), (a, b) => agg.merge(a, b))
    val rows = Seq.newBuilder[(Int, Int, Long)]
    rows += ((-1, -1, acc(0)))
    for (i <- 0 until d) rows += ((i, -1, acc(1 + i)))
    var k = 1 + d
    for (i <- 0 until d; j <- i until d) { rows += ((i, j, acc(k))); k += 1 }
    rows.result().toDF("i", "j", "s").orderBy("i", "j")
  }

  val pcaGramCoreSql: String =
    s"""WITH q AS (
       |  SELECT vec_id,
       |    list_transform(embedding,
       |      x -> CAST(round(CAST(x AS DOUBLE) * ${graft.similarity.Ann.QuantScale}) AS BIGINT)) AS qv
       |  FROM embeddings),
       |pos AS (
       |  SELECT vec_id, qv, i FROM q, UNNEST(generate_series(1, $Dim)) AS s(i)),
       |pairs AS (
       |  SELECT qv, i, j FROM pos, UNNEST(generate_series(i, $Dim)) AS s2(j))
       |SELECT -1 AS i, -1 AS j, count(*) AS s FROM q
       |UNION ALL
       |SELECT i - 1 AS i, -1 AS j, CAST(sum(qv[i]) AS BIGINT) AS s
       |FROM pos GROUP BY 1, 2
       |UNION ALL
       |SELECT i - 1 AS i, j - 1 AS j, CAST(sum(qv[i] * qv[j]) AS BIGINT) AS s
       |FROM pairs GROUP BY 1, 2
       |ORDER BY i, j""".stripMargin

  /** Covariance matrix from one pass over the corpus. */
  private[graft] def covariance(spark: SparkSession, dir: String)
      : (Long, Array[Double], Array[Array[Double]]) = {
    import spark.implicits._
    val d = Dim
    // typed Aggregator with a raw Array[Double] buffer needs an encoder
    // detour; a plain RDD treeAggregate is the simpler exact equivalent
    // and keeps the same map-side-combine shape
    val agg = new GramAgg(d)
    val acc = Tables.embeddings(spark, dir)
      .select($"embedding").as[Array[Float]].rdd
      .treeAggregate(agg.zero)(
        (b, v) => agg.reduce(b, v), (a, b) => agg.merge(a, b))
    val n = acc(0).toLong
    require(n > 1, s"PCA needs more than one vector, got $n")
    val mean = Array.tabulate(d)(i => acc(1 + i) / n)
    val cov = Array.ofDim[Double](d, d)
    var k = 1 + d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = acc(k) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        k += 1; j += 1
      }
      i += 1
    }
    (n, mean, cov)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues desc, eigenvectors as rows, orthonormal). */
  private[graft] def jacobiEigen(m0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = m0.length
    val a = Array.tabulate(d, d)((i, j) => m0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    val tol = 1e-14 * frobenius(a)
    while (off > tol && sweep < 100) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > tol / (d * d)) {
            // 2x2 rotation annihilating a(p)(q)
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
                case 0.0 => 1.0 // theta == 0 → 45°
                case x => x
              }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vpk = v(p)(k); val vqk = v(q)(k)
              v(p)(k) = c * vpk - s * vqk
              v(q)(k) = s * vpk + c * vqk
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    (order.map(i => a(i)(i)).toArray, order.map(i => v(i).clone()).toArray)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }
  private def frobenius(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices) s += a(i)(j) * a(i)(j)
    math.sqrt(s) max 1e-300
  }

  /** Fit on the corpus: top-k eigenpairs of the covariance. */
  def fit(spark: SparkSession, dir: String, k: Int = K)
      : (Array[Double], Array[Double], Array[Array[Double]]) = {
    val (_, mean, cov) = covariance(spark, dir)
    val (vals, vecs) = jacobiEigen(cov)
    (mean, vals.take(k), vecs.take(k))
  }

  /** `s_pca_project`: per-vector top-[[K]] component scores
    * ⟨v − μ, wⱼ⟩. The mean and components are k·d driver values
    * broadcast as literal arrays; the projection is `graft_dot` per
    * component inside codegen — map-only, no shuffle but the output
    * sort. Rows-only (engine-specific floats); PcaSpec carries the
    * math. */
  def pcaProject(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.VectorExpressions.register(spark)
    val (mean, _, comps) = fit(spark, dir, K)
    val meanCol = array(mean.map(lit): _*)
    val centered = expr("zip_with(CAST(embedding AS array<double>), mu, (x, m) -> x - m)")
    val projections = comps.zipWithIndex.map { case (w, j) =>
      graft.functions.VectorExpressions
        .dot(col("cv"), array(w.map(lit): _*)).as(s"pc$j")
    }
    Tables.embeddings(spark, dir)
      .withColumn("mu", meanCol)
      .withColumn("cv", centered)
      .select((col("vec_id") +: projections): _*)
      .orderBy("vec_id")
  }
}
