package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed full-batch logistic regression — the trainable text
  * quality classifier a curation pipeline fits over heuristic features
  * (the fastText-style "quality filter" role; the reference has no
  * trained text models, this is part of the additive LLM-pipeline
  * surface).
  *
  * Training is the MLlib iterative-optimizer shape, same as
  * [[graft.nfl.CompProbFit.fitAdam]]: the model (k weights + bias) lives
  * on the driver, and each Adam step evaluates mean log-loss and its
  * exact gradient in ONE distributed aggregation of codegen'd column
  * expressions (k+2 `avg`s — no UDF, no collect of rows, no RDD). At
  * 100 TB a step is one map-side-combined pass; iteration count is the
  * only serial factor.
  *
  * Features are standardized internally (one extra aggregation) so the
  * learning rate is scale-free; the returned model folds the affine
  * transform back, so scoring columns apply to RAW features.
  */
object LogReg {

  final case class Model(featureNames: Seq[String], weights: Array[Double],
                         bias: Double, loss: Double, iters: Int, n: Long)

  /** `label` must be 0/1 (castable to double). Plain L2 (`l2` per-term,
    * not applied to the bias) keeps weights finite on separable data. */
  def train(df: DataFrame, features: Seq[String], label: String,
            iters: Int = 200, lr: Double = 0.1, l2: Double = 1e-4,
            tol: Double = 1e-9): Model = {
    val k = features.size
    require(k > 0, "at least one feature")
    val cols = features.map(f => col(f).cast("double")) :+
      col(label).cast("double").as("y")
    val data = df.select(cols: _*)
    data.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // standardization constants (guard zero variance with max(std, 1e-12))
    val statAggs = features.flatMap { f =>
      Seq(avg(col(f)).as(s"m_$f"), stddev_pop(col(f)).as(s"s_$f"))
    }
    val stats = data.agg(statAggs.head, statAggs.tail: _*).head()
    require(!stats.isNullAt(0), "cannot train on an empty dataset")
    val mean = Array.tabulate(k)(i => stats.getDouble(2 * i))
    val std = Array.tabulate(k)(i => math.max(stats.getDouble(2 * i + 1), 1e-12))

    def stdCol(i: Int): Column = (col(features(i)) - mean(i)) / std(i)

    /** One pass: (mean log-loss, grad bias, grad w_0..w_{k-1}, n). */
    def step(w: Array[Double], b: Double): (Double, Double, Array[Double], Long) = {
      val zRaw = (0 until k).foldLeft(lit(b): Column)((acc, i) =>
        acc + stdCol(i) * w(i))
      val z = greatest(least(zRaw, lit(30.0)), lit(-30.0))
      val p = lit(1.0) / (exp(-z) + 1.0)
      val y = col("y")
      val pc = greatest(least(p, lit(1 - 1e-12)), lit(1e-12))
      val bce = -(y * log(pc) + (lit(1.0) - y) * log(lit(1.0) - pc))
      val resid = p - y // d loss / d z
      val aggs = (avg(bce).as("l") +: avg(resid).as("gb") +:
        (0 until k).map(i => avg(resid * stdCol(i)).as(s"g_$i"))) :+
        count(lit(1)).as("n")
      val r = data.agg(aggs.head, aggs.tail: _*).head()
      val g = Array.tabulate(k)(i => r.getDouble(2 + i) + l2 * w(i))
      (r.getDouble(0), r.getDouble(1), g, r.getLong(2 + k))
    }

    // Adam on the driver
    val w = new Array[Double](k); var b = 0.0
    val m = new Array[Double](k + 1); val v = new Array[Double](k + 1)
    val b1 = 0.9; val b2 = 0.999; val eps = 1e-8
    var lastLoss = Double.MaxValue; var finalLoss = Double.MaxValue
    var n = 0L; var it = 0; var done = false
    while (it < iters && !done) {
      val (loss, gb, g, nn) = step(w, b)
      n = nn; finalLoss = loss
      if (math.abs(lastLoss - loss) < tol) done = true
      lastLoss = loss
      val t = it + 1
      def adam(slot: Int, grad: Double): Double = {
        m(slot) = b1 * m(slot) + (1 - b1) * grad
        v(slot) = b2 * v(slot) + (1 - b2) * grad * grad
        lr * (m(slot) / (1 - math.pow(b1, t))) /
          (math.sqrt(v(slot) / (1 - math.pow(b2, t))) + eps)
      }
      var i = 0
      while (i < k) { w(i) -= adam(i, g(i)); i += 1 }
      b -= adam(k, gb)
      it += 1
    }
    data.unpersist()

    // fold standardization into raw-feature weights:
    //   z = b + Σ w_i (x_i − μ_i)/σ_i  =  (b − Σ w_i μ_i/σ_i) + Σ (w_i/σ_i) x_i
    val rawW = Array.tabulate(k)(i => w(i) / std(i))
    val rawB = b - (0 until k).map(i => w(i) * mean(i) / std(i)).sum
    Model(features, rawW, rawB, finalLoss, it, n)
  }

  /** Linear score (logit) over RAW feature columns — a pure codegen
    * expression chain, usable in any select/filter. */
  def logitCol(model: Model): Column =
    model.featureNames.zip(model.weights).foldLeft(lit(model.bias): Column) {
      case (acc, (f, w)) => acc + col(f).cast("double") * w
    }

  /** P(label = 1) over raw features. */
  def scoreCol(model: Model): Column = {
    val z = greatest(least(logitCol(model), lit(30.0)), lit(-30.0))
    lit(1.0) / (exp(-z) + 1.0)
  }
}
