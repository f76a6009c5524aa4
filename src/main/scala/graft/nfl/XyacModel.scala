package graft.nfl

import graft.ml.{GbdtScorer, XgbBinary}

/** Loader/adapter for the reference's trained xyac (expected yards after
  * catch) GBDT — the model the kernel scores at every (endpoint, flight
  * time) cell (`analysis/models/play_eppa_cpu.py:80-87,456-459`).
  *
  * The authoritative artifact is the joblib-pickled Booster
  * `analysis/models/in/xyac_model.model` (8 classes × 400 rounds = 3,200
  * trees) — the file `play_eppa_cpu.py:80` loads and the one that
  * reproduces the shipped `test_predictions.csv` to float32 precision.
  * The sibling text dump `xyac_model.raw.txt` (30,400 boosters) is a
  * stale artifact of an earlier 76-class experiment and does NOT match
  * the shipped predictions; we parse the binary instead (XgbBinary).
  *
  * The model consumes 21 features: the 5 nearest defenders' (distance,
  * speed, relative x, relative y) at the projected catch point, plus the
  * endpoint's field y. [[kernelScorer]] adapts the kernel's 25-slot
  * feature layout (FrameEppa.XyacNumFeatures) to the model's feature
  * order, so the kernel stays model-agnostic.
  */
object XyacModel {

  /** 8 yac-bucket class values; expectation = Σ softprob·value
    * (`play_eppa_cpu.py:424` value_array). */
  val Values: Array[Double] = FrameEppa.XyacValues
  val NumClasses = 8

  /** Model feature order. Any consistent order works — the dump refers to
    * features by name — so we use the training frame's column order
    * (`analysis/models/in/features_for_xyac.csv` header). */
  val FeatureNames: Seq[String] =
    (1 to 5).flatMap(i => Seq(
      s"$i-closest-defender-distance", s"$i-closest-defender-speed",
      s"$i-closest-defender-x", s"$i-closest-defender-y")) :+ "y"

  /** Kernel feats-array slot for each model feature (FrameEppa layout:
    * 4-8 d1..d5, 9-13 x1..x5, 14-18 y1..y5, 19-23 v1..v5, 24 y). */
  private val KernelSlots: Array[Int] =
    FeatureNames.map {
      case "y" => 24
      case n =>
        val rank = n.charAt(0) - '1' // 0..4
        n.substring(n.lastIndexOf('-') + 1) match {
          case "distance" => 4 + rank
          case "speed"    => 19 + rank
          case "x"        => 9 + rank
          case "y"        => 14 + rank
        }
    }.toArray

  /** Load from either format: XGBoost binary (possibly joblib-wrapped —
    * sniffed by magic) or text dump. */
  def load(path: String): GbdtScorer.Model = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    if (XgbBinary.looksBinary(bytes)) XgbBinary.parse(bytes, FeatureNames)
    else GbdtScorer.parseFile(path, FeatureNames, NumClasses)
  }

  /** Score a model-ordered feature vector → expected yac. */
  def predict(model: GbdtScorer.Model, features: Array[Double]): Double =
    model.expectation(features, Values)

  /** Kernel-facing scorer: takes the kernel's 25-slot feats array, remaps
    * to model order, returns expected yac. Serializable (rides the Spark
    * task closure; the model's flat arrays serialize cheaply) with a
    * transient remap buffer — each task deserializes its own copy and
    * runs single-threaded, so the shared buffer is safe. */
  final class KernelScorer(model: GbdtScorer.Model)
      extends (Array[Double] => Double) with Serializable {
    @transient private lazy val buf = new Array[Double](KernelSlots.length)
    def apply(feats: Array[Double]): Double = {
      val x = buf
      var i = 0
      while (i < KernelSlots.length) { x(i) = feats(KernelSlots(i)); i += 1 }
      model.expectation(x, Values)
    }
  }

  def kernelScorer(model: GbdtScorer.Model): Array[Double] => Double =
    new KernelScorer(model)

  /** Batch scorer (the kernel's fast path): rows arrive in the kernel's
    * 25-slot layout; KernelSlots maps each model feature to its column, so
    * no per-row remap copy is needed. */
  final class KernelBatchScorer(model: GbdtScorer.Model)
      extends FrameEppa.XyacBatchScorer {
    def scoreBatch(x: Array[Double], n: Int, out: Array[Double]): Unit =
      model.expectationBatch(x, n, FrameEppa.XyacNumFeatures,
        KernelSlots, Values, out)
  }

  def kernelBatchScorer(model: GbdtScorer.Model): FrameEppa.XyacBatchScorer =
    new KernelBatchScorer(model)

  /** Reference model location when the reference checkout is present (demo
    * and spec convenience — callers pass their own path in production). */
  val ReferenceModelPath = "/root/reference/analysis/models/in/xyac_model.model"

  def loadReferenceIfPresent(): Option[GbdtScorer.Model] = {
    val f = new java.io.File(ReferenceModelPath)
    if (f.isFile) Some(load(ReferenceModelPath)) else None
  }
}
