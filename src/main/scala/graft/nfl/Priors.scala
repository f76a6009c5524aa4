package graft.nfl

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Historical-prior fitting (SURVEY §2.4 A8/A9; reference
  * `analysis/historical-L-T.ipynb`): gamma MLE per group as a typed
  * `Aggregator` (replacing scipy.stats.gamma.fit), binned 2-D densities
  * with driver-side separable Gaussian smoothing (replacing
  * scipy.ndimage.gaussian_filter), and the T_given_L / p_t table builders
  * the kernel consumes.
  *
  * The Aggregator is algebraic — buffer (n, Σx, Σln x) merges
  * associatively, so Catalyst plans it partial+final (map-side combine):
  * one shuffle of 3 doubles per group no matter how many samples. The
  * smoothing runs driver-side because the table is 80×80 — never ship a
  * convolution to the cluster that fits in a cache line.
  */
object Priors {

  /** Load the reference's shipped T|L prior table directly
    * (`analysis/models/in/T_given_L.csv`: rows (T, p, dist), T = flight
    * frames 1..40, dist = 1..60 — written by the completion-probability
    * notebook and consumed at `play_eppa_cpu.py:75-77`). The fitted-from-
    * data path (fitTGivenL/fitFromTracking) remains the no-artifact
    * production route; this loader is byte-faithful S4. */
  def loadTGivenL(path: String): FrameEppa.Priors = {
    val table = Array.ofDim[Double](60, FrameEppa.NT)
    val src = scala.io.Source.fromFile(path)
    try {
      src.getLines().drop(1).foreach { line =>
        val parts = line.split(",")
        val t = parts(0).toDouble.toInt - 1
        val d = parts(2).toInt - 1
        if (d >= 0 && d < 60 && t >= 0 && t < FrameEppa.NT)
          table(d)(t) = parts(1).toDouble
      }
    } finally src.close()
    FrameEppa.Priors(table)
  }

  val ReferenceTGivenLPath = "/root/reference/analysis/models/in/T_given_L.csv"

  def loadReferenceTGivenL(): Option[FrameEppa.Priors] = {
    val f = new java.io.File(ReferenceTGivenLPath)
    if (f.isFile) Some(loadTGivenL(ReferenceTGivenLPath)) else None
  }


  final case class GammaBuf(n: Long, sumX: Double, sumLnX: Double)
  final case class GammaParams(shape: Double, scale: Double, n: Long)

  /** Digamma ψ(x) — asymptotic series with upward recurrence (~1e-12). */
  def digamma(x0: Double): Double = {
    var x = x0; var acc = 0.0
    while (x < 12.0) { acc -= 1.0 / x; x += 1.0 }
    val inv = 1.0 / x; val inv2 = inv * inv
    acc + math.log(x) - 0.5 * inv -
      inv2 * (1.0 / 12 - inv2 * (1.0 / 120 - inv2 * (1.0 / 252 - inv2 / 240)))
  }

  /** Trigamma ψ′(x). */
  def trigamma(x0: Double): Double = {
    var x = x0; var acc = 0.0
    while (x < 12.0) { acc += 1.0 / (x * x); x += 1.0 }
    val inv = 1.0 / x; val inv2 = inv * inv
    acc + inv * (1.0 + inv * (0.5 +
      inv * (1.0 / 6 - inv2 * (1.0 / 30 - inv2 * (1.0 / 42 - inv2 / 30)))))
  }

  /** Gamma MLE from sufficient stats: s = ln(mean) − mean(ln x); initial
    * shape from the Minka closed form, refined by Newton on
    * ln(α) − ψ(α) = s. */
  def mleFromStats(n: Long, sumX: Double, sumLnX: Double): GammaParams = {
    if (n < 2 || sumX <= 0) return GammaParams(Double.NaN, Double.NaN, n)
    val mean = sumX / n
    val s = math.log(mean) - sumLnX / n
    if (s <= 0) return GammaParams(Double.NaN, Double.NaN, n)
    var a = (3.0 - s + math.sqrt((s - 3.0) * (s - 3.0) + 24.0 * s)) / (12.0 * s)
    var i = 0
    while (i < 20) {
      val f = math.log(a) - digamma(a) - s
      val fp = 1.0 / a - trigamma(a)
      val next = a - f / fp
      if (next > 0 && math.abs(next - a) < 1e-12) { a = next; i = 20 }
      else { a = math.max(next, 1e-9); i += 1 }
    }
    GammaParams(a, mean / a, n)
  }

  /** Typed gamma-fit aggregator: Dataset[Double] → GammaParams. */
  val gammaFit: Aggregator[Double, GammaBuf, GammaParams] =
    new Aggregator[Double, GammaBuf, GammaParams] {
      def zero: GammaBuf = GammaBuf(0L, 0.0, 0.0)
      def reduce(b: GammaBuf, x: Double): GammaBuf =
        if (x > 0) GammaBuf(b.n + 1, b.sumX + x, b.sumLnX + math.log(x)) else b
      def merge(a: GammaBuf, b: GammaBuf): GammaBuf =
        GammaBuf(a.n + b.n, a.sumX + b.sumX, a.sumLnX + b.sumLnX)
      def finish(b: GammaBuf): GammaParams = mleFromStats(b.n, b.sumX, b.sumLnX)
      def bufferEncoder: Encoder[GammaBuf] = Encoders.product[GammaBuf]
      def outputEncoder: Encoder[GammaParams] = Encoders.product[GammaParams]
    }

  /** Gamma pdf. */
  def gammaPdf(x: Double, shape: Double, scale: Double): Double =
    if (x <= 0) 0.0
    else math.exp((shape - 1) * math.log(x) - x / scale -
      logGamma(shape) - shape * math.log(scale))

  /** Lanczos log-gamma (g=7, n=9). */
  def logGamma(x: Double): Double = {
    val g = 7.0
    val c = Array(0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (x < 0.5)
      math.log(math.Pi / math.sin(math.Pi * x)) - logGamma(1.0 - x)
    else {
      val xx = x - 1.0
      var a = c(0)
      var i = 1
      while (i < 9) { a += c(i) / (xx + i); i += 1 }
      val t = xx + g + 0.5
      0.5 * math.log(2 * math.Pi) + (xx + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  /** Fit flight-time distributions per integer pass distance from observed
    * (distance, time-of-flight) pairs → the kernel's 60×40 T|L table.
    * `passes` needs columns: dist (yards), tof (seconds). Distances pool
    * ±2 yards (the reference's sliding window) so sparse bins still fit. */
  def fitTGivenL(passes: DataFrame): FrameEppa.Priors = {
    val spark = passes.sparkSession
    import spark.implicits._
    // pool each sample into neighboring distance bins: explode ±2
    val pooled = passes
      .withColumn("d_bin", explode(expr("sequence(CAST(dist AS INT) - 2, CAST(dist AS INT) + 2)")))
      .filter($"d_bin" >= 1 && $"d_bin" <= 60)
      .select($"d_bin", $"tof".cast("double"))
      .as[(Int, Double)]
    val fits = pooled.groupByKey(_._1)
      .mapValues(_._2)
      .agg(gammaFit.toColumn)
      .collect().toMap
    val table = Array.tabulate(60, FrameEppa.NT) { (d, k) =>
      fits.get(d + 1) match {
        case Some(p) if !p.shape.isNaN =>
          gammaPdf(FrameEppa.tOf(k), p.shape, p.scale)
        case _ => 0.0
      }
    }
    // normalize rows to probability vectors
    table.foreach { row =>
      val s = row.sum
      if (s > 0) { var k = 0; while (k < row.length) { row(k) /= s; k += 1 } }
    }
    FrameEppa.Priors(table)
  }

  /** Observed passes from normalized tracking: one row per play with the
    * throw→arrival ball displacement and flight time — the input
    * `fitTGivenL` fits (reference `historical-L-T.ipynb` cells 2-6 derive
    * the same pairs from `pass_forward`/`pass_arrived` ball rows). */
  def observedPasses(norm: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wPlay = Window.partitionBy("gameId", "playId")
    def ballAt(event: String, c: String) =
      max(when(col("nflId") === 0 && col("event") === event, col(c))).over(wPlay)
    norm
      .withColumn("tx", ballAt("pass_forward", "x"))
      .withColumn("ty", ballAt("pass_forward", "y"))
      .withColumn("ax", ballAt("pass_arrived", "x"))
      .withColumn("ay", ballAt("pass_arrived", "y"))
      .withColumn("tf", max(when(col("event") === "pass_forward", col("frameId"))).over(wPlay))
      .withColumn("af", max(when(col("event") === "pass_arrived", col("frameId"))).over(wPlay))
      .filter(col("tx").isNotNull && col("ax").isNotNull && col("af") > col("tf"))
      .select(col("gameId"), col("playId"),
        hypot(col("ax") - col("tx"), col("ay") - col("ty")).as("dist"),
        ((col("af") - col("tf")) * 0.1).as("tof"))
      .distinct()
  }

  /** End-to-end prior build: tracking → observed passes → fitted T|L
    * table, falling back to the synthetic prior for unobserved distances
    * (sparse corpora must not zero out the transition model). */
  def fitFromTracking(norm: DataFrame): FrameEppa.Priors = {
    val fitted = fitTGivenL(observedPasses(norm))
    val synth = FrameEppa.Priors.synthetic()
    val merged = fitted.tGivenL.zip(synth.tGivenL).map { case (f, s) =>
      if (f.sum > 0) f else s
    }
    fitted.copy(tGivenL = merged)
  }

  /** 2-D binned density + separable Gaussian smoothing (A9): counts from
    * the cluster, blur on the driver (grid is 80×80). */
  def smoothedDensity2D(points: DataFrame, xCol: String, yCol: String,
                        xMin: Double, yMin: Double, bins: Int, binW: Double,
                        sigma: Double): Array[Array[Double]] = {
    val counts = points
      .select(floor((col(xCol) - xMin) / binW).cast("int").as("bx"),
              floor((col(yCol) - yMin) / binW).cast("int").as("by"))
      .filter(col("bx") >= 0 && col("bx") < bins &&
              col("by") >= 0 && col("by") < bins)
      .groupBy("bx", "by").count()
      .collect()
    val grid = Array.ofDim[Double](bins, bins)
    counts.foreach(r => grid(r.getAs[Int]("by"))(r.getAs[Int]("bx")) =
      r.getAs[Long]("count").toDouble)
    val radius = math.max(1, (3 * sigma).toInt)
    val kernel = Array.tabulate(2 * radius + 1) { i =>
      val d = i - radius
      math.exp(-d * d / (2 * sigma * sigma))
    }
    val kSum = kernel.sum
    var i = 0
    while (i < kernel.length) { kernel(i) /= kSum; i += 1 }
    def blur1d(g: Array[Array[Double]], byRow: Boolean): Array[Array[Double]] =
      Array.tabulate(bins, bins) { (r, c) =>
        var s = 0.0
        var k = -radius
        while (k <= radius) {
          val rr = if (byRow) r else r + k
          val cc = if (byRow) c + k else c
          if (rr >= 0 && rr < bins && cc >= 0 && cc < bins)
            s += g(rr)(cc) * kernel(k + radius)
          k += 1
        }
        s
      }
    blur1d(blur1d(grid, byRow = true), byRow = false)
  }
}
