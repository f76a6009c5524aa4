package graft.nfl

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** M2: EP GBDT through the full EPA state machine (fixture ensemble in
  * XGBoost dump format — same scoring path as a real dump). */
class EpModelSpec extends SparkTestBase {

  private def ep(yardline: Double, down: Int, ydstogo: Double,
                 isFirst: Int = 0): Double = {
    val x = new Array[Double](EpModel.FeatureNames.length)
    x(0) = yardline; x(1) = ydstogo
    x(1 + down) = 1.0 // down dummies at indices 2..6
    x(7) = isFirst
    EpModel.fixture.expectation(x, EpModel.EpValues)
  }

  test("reference EP artifact is absent from the checkout — M2 stays a " +
       "documented partial, not a silent gap") {
    // play_eppa_cpu.py:84 joblib-loads
    // analysis/models/in/epa_model_rishav_no_time.model, but the artifact
    // was never committed: only the xyac model ships. This pin makes the
    // impossibility executable. If it ever FAILS (a future checkout ships
    // the file), wire EpModel.load(path) + a parity spec mirroring
    // XyacModelSpec — XgbBinarySpec already proves the pickle-embedded
    // extraction path works on real bytes.
    val root = new java.io.File("/root/reference")
    assume(root.isDirectory)
    def walk(f: java.io.File): Iterator[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).iterator.flatten.flatMap(walk)
      else Iterator.single(f)
    val epArtifacts = walk(root).map(_.getName).filter { n =>
      val l = n.toLowerCase
      l.contains("epa") &&
        (l.endsWith(".model") || l.endsWith(".joblib") || l.endsWith(".so") ||
         l.endsWith(".dylib") || l.endsWith(".pkl"))
    }.toSeq
    assert(epArtifacts.isEmpty,
      s"EP artifact appeared in the reference checkout ($epArtifacts): " +
        "replace the fixture ensemble with the real model and add parity")
    // ...and the path string really is what the reference loads, so the
    // absence is the reference's gap, not a wrong path on our side
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(
        "/root/reference/analysis/models/play_eppa_cpu.py")), "UTF-8")
    assert(src.contains("epa_model_rishav_no_time.model"))
  }

  test("fixture parses: 14 boosters, 7 classes, 8 features") {
    assert(EpModel.fixture.trees.length == 14)
    assert(EpModel.fixture.numClasses == 7)
    assert(EpModel.fixture.featureIndex.size == 8)
  }

  test("EP is monotone decreasing in yardline_100 and bounded") {
    val eps = Seq(5.0, 15.0, 40.0, 60.0, 75.0, 92.0).map(ep(_, 1, 10.0))
    eps.sliding(2).foreach { case Seq(a, b) => assert(a > b, s"$eps") }
    assert(eps.head < 7.0 && eps.last > -7.0)
    // goal-to-go EP should be clearly positive; backed-up EP negative
    assert(eps.head > 2.0)
    assert(eps.last < 0.0)
  }

  test("4th down is worth less than 1st down at the same spot") {
    assert(ep(50.0, 4, 10.0) < ep(50.0, 1, 10.0))
  }

  test("epaTable with the GBDT scorer: overrides, sign flips, grid shape") {
    val spark = this.spark
    import spark.implicits._
    val pre = Seq(
      (1L, 100L, 1, 60.0, 10.0), // 1st-and-10 at own 40 (yardline_100=60)
      (1L, 200L, 4, 40.0, 2.0)   // 4th-and-2 at opp 40
    ).toDF("gameId", "playId", "down_x", "yardline_100", "ydstogo")

    val t = EpaModel.epaTable(pre, EpModel.scorer(EpModel.fixture)).cache()
    assert(t.count() == 2 * 120)
    // TD override: every endpoint >= 110 scores exactly 7
    val td = t.filter($"play_endpoint_x" >= 110).select("xep_comp")
      .as[Double].collect()
    assert(td.nonEmpty && td.forall(_ == 7.0))
    // safety override: endpoints <= 10 score exactly -2
    val safe = t.filter($"play_endpoint_x" <= 10).select("xep_comp")
      .as[Double].collect()
    assert(safe.nonEmpty && safe.forall(_ == -2.0))
    // catching further downfield should not lower EPA: check two interior
    // points on the 1st-down play (short of the sticks vs past them)
    val byX = t.filter($"playId" === 100L)
      .select("play_endpoint_x", "xepa_comp").as[(Double, Double)]
      .collect().toMap
    assert(byX(90.5) > byX(55.5))
    // xepa = xep - before_play_ep except turnover-on-downs inversion:
    // the 4th-down incomplete branch flips sign (down5 = 1). before_play_ep
    // for 4th-and-2 at yardline_100=40 scores the pre-state directly.
    val row4 = t.filter($"playId" === 200L).select("xep_inc", "xepa_inc")
      .as[(Double, Double)].head()
    val before4 = ep(40.0, 4, 2.0)
    assert(math.abs(row4._2 - (-row4._1 - before4)) < 1e-9)
  }

  test("EP scoring runs as a native expression, not a ScalaUDF") {
    val spark = this.spark
    import spark.implicits._
    val pre = Seq((1L, 100L, 1, 60.0, 10.0))
      .toDF("gameId", "playId", "down_x", "yardline_100", "ydstogo")
    val df = EpaModel.epaTable(pre, EpModel.fixtureScorer)
    val plan = df.queryExecution.analyzed.toString
    assert(!plan.contains("UDF"), s"UDF in plan:\n${plan.take(600)}")
    assert(plan.contains("graft_gbdt"), s"expected native gbdt expression")
  }

  test("withExpectation column path matches direct scoring") {
    val spark = this.spark
    import spark.implicits._
    val df = Seq((30.0, 7.0, 0, 1, 0, 0, 0, 0))
      .toDF("yardline_100_post", "ydstogo_post",
        "down1", "down2", "down3", "down4", "down5", "isFirstDown")
    val got = EpModel.scorer(EpModel.fixture)(df)
      .select("xep").as[Double].head()
    assert(math.abs(got - ep(30.0, 2, 7.0)) < 1e-12)
  }
}
