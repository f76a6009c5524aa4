package graft.nfl

import graft.SparkTestBase

/** Prediction parity for the real xyac GBDT: parse the reference's
  * binary Booster (`analysis/models/in/xyac_model.model`) and reproduce
  * its shipped per-row predictions (`in/test_predictions.csv`, column
  * `xyac_rish` = Σ softprob · value_array as in `play_eppa_cpu.py:456-459`).
  *
  * Note the sibling text dump `xyac_model.raw.txt` is a stale 76-class
  * artifact that does NOT reproduce the shipped predictions (verified:
  * mean |err| ≈ 10 yards, negative correlation) — the binary is the model
  * the reference actually scores.
  */
class XyacModelSpec extends SparkTestBase {

  private val predCsv = "/root/reference/analysis/models/in/test_predictions.csv"
  private def refAvailable =
    new java.io.File(XyacModel.ReferenceModelPath).isFile &&
      new java.io.File(predCsv).isFile

  lazy val model = XyacModel.load(XyacModel.ReferenceModelPath)

  test("parses the reference binary: 3,200 trees (400 rounds × 8), 21 features") {
    assume(refAvailable)
    assert(model.trees.length == 3200)
    assert(model.numClasses == 8)
    assert(model.featureIndex.size == 21)
    assert(model.treeClass != null && model.treeClass.take(16).toSeq ==
      (0 until 8).toSeq ++ (0 until 8).toSeq)
  }

  private def checkParity(csv: String): Unit = {
    val src = scala.io.Source.fromFile(csv)
    val lines = try src.getLines().toVector finally src.close()
    val header = lines.head.split(",").toVector
    val featCols = XyacModel.FeatureNames.map(header.indexOf(_)).toArray
    assert(featCols.forall(_ >= 0), "all model features present in csv")
    val predCol = header.indexOf("xyac_rish")

    var n = 0; var worst = 0.0; var sumAbs = 0.0
    lines.tail.foreach { line =>
      val parts = line.split(",")
      // treelite feeds the model float32 inputs — match that rounding
      val x = featCols.map(c => parts(c).toDouble.toFloat.toDouble)
      val expected = parts(predCol).toDouble
      val got = XyacModel.predict(model, x)
      val err = math.abs(got - expected)
      worst = math.max(worst, err); sumAbs += err; n += 1
    }
    info(f"$n rows: mean |err| = ${sumAbs / n}%.2e, max = $worst%.2e")
    assert(n > 3000)
    // reference predictions come from a float32 treelite build; double
    // tree-walk agrees to float precision
    assert(sumAbs / n < 1e-5, "mean abs error vs reference predictions")
    assert(worst < 1e-3, "worst-case error vs reference predictions")
  }

  test("reproduces the reference's shipped test-set predictions") {
    assume(refAvailable)
    checkParity(predCsv)
  }

  test("reproduces the reference's shipped training-set predictions") {
    assume(refAvailable)
    val trainCsv = "/root/reference/analysis/models/in/training_predictions.csv"
    assume(new java.io.File(trainCsv).isFile)
    checkParity(trainCsv)
  }

  test("kernelScorer remaps the kernel feature layout correctly") {
    assume(refAvailable)
    val scorer = XyacModel.kernelScorer(model)
    // build a kernel-layout feats array from the first csv rows and check
    // they score identically to the model-ordered vector
    val src = scala.io.Source.fromFile(predCsv)
    val lines = try src.getLines().take(4).toVector finally src.close()
    val header = lines.head.split(",").toVector
    lines.tail.foreach { line =>
      val parts = line.split(",")
      val feats = new Array[Double](FrameEppa.XyacNumFeatures)
      for (r <- 0 until 5) {
        feats(4 + r) = parts(header.indexOf(s"${r + 1}-closest-defender-distance")).toDouble
        feats(9 + r) = parts(header.indexOf(s"${r + 1}-closest-defender-x")).toDouble
        feats(14 + r) = parts(header.indexOf(s"${r + 1}-closest-defender-y")).toDouble
        feats(19 + r) = parts(header.indexOf(s"${r + 1}-closest-defender-speed")).toDouble
      }
      feats(24) = parts(header.indexOf("y")).toDouble
      val viaKernel = scorer(feats)
      val direct = XyacModel.predict(model,
        XyacModel.FeatureNames.map(f => parts(header.indexOf(f)).toDouble).toArray)
      assert(viaKernel == direct)
    }
  }

  test("batch scorer agrees with the per-call scorer bit for bit") {
    assume(refAvailable)
    val perCall = XyacModel.kernelScorer(model)
    val batch = XyacModel.kernelBatchScorer(model)
    val n = 500
    val x = new Array[Double](n * FrameEppa.XyacNumFeatures)
    val rng = new scala.util.Random(42)
    var i = 0
    while (i < x.length) { x(i) = rng.nextDouble() * 40 - 10; i += 1 }
    val out = new Array[Double](n)
    batch.scoreBatch(x, n, out)
    val row = new Array[Double](FrameEppa.XyacNumFeatures)
    i = 0
    while (i < n) {
      System.arraycopy(x, i * FrameEppa.XyacNumFeatures, row, 0,
        FrameEppa.XyacNumFeatures)
      assert(out(i) == perCall(row), s"row $i")
      i += 1
    }
  }

  test("kernel with batch scorer matches kernel with per-call scorer") {
    assume(refAvailable)
    val players = Array.tabulate(14) { i =>
      FrameEppa.Player(i + 1, s"P$i", i < 7, 25.0 + i * 4,
        6.0 + (i % 7) * 6, 1.5, -0.5, 0.1, 0.0)
    }
    val in = FrameEppa.FrameInput(1, 1, 20, 15, 30, 26, players)
    val epa = Array.tabulate(120)(_ / 60.0)
    val p = FrameEppa.Params()
    val k1 = new FrameEppa.Kernel(p, FrameEppa.Priors.synthetic(),
      XyacModel.kernelScorer(model))
    val k2 = new FrameEppa.Kernel(p, FrameEppa.Priors.synthetic(),
      XyacModel.kernelScorer(model), XyacModel.kernelBatchScorer(model))
    val o1 = k1.compute(in, epa, -0.5)
    val o2 = k2.compute(in, epa, -0.5)
    // toString compare: the true-pass fields are NaN here and NaN != NaN
    // under case-class equality
    assert(o1.pass.toString == o2.pass.toString)
    assert(o1.players.toSeq == o2.players.toSeq)
  }

  test("scoring throughput supports per-frame use") {
    assume(refAvailable)
    val scorer = XyacModel.kernelScorer(model)
    val feats = new Array[Double](FrameEppa.XyacNumFeatures)
    var i = 0
    while (i < feats.length) { feats(i) = 1.0 + i; i += 1 }
    var s = 0.0
    var j = 0
    while (j < 2000) { s += scorer(feats); j += 1 } // warm
    val n = 20000
    val t0 = System.nanoTime()
    j = 0
    while (j < n) { feats(4) = j % 30; s += scorer(feats); j += 1 }
    val usPerScore = (System.nanoTime() - t0) / 1e3 / n
    info(f"$usPerScore%.1f µs/score (s=$s%.1f)")
    // an in-window frame is ~100k scores; keep a frame in the seconds range
    assert(usPerScore < 100.0)
  }
}
