package graft.nfl

import graft.SparkTestBase

class CompProbFitSpec extends SparkTestBase {

  test("grid search recovers the generating tti_sigma") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val trueSigma = 0.31; val aMax = 7.67; val sMax = 9.42
    val k = math.Pi / math.sqrt(3.0) / trueSigma
    val obs = (1 to 8000).map { _ =>
      val d = 1.0 + rng.nextDouble() * 15.0
      val tof = 0.5 + rng.nextDouble() * 3.0
      val dLt = sMax * sMax / (2 * aMax)
      val tTot = if (d <= dLt) math.sqrt(2 * d / aMax)
                 else sMax / aMax + (d - dLt) / sMax
      val pInt = 1.0 / (1.0 + math.exp(-k * (tof - tTot)))
      val completed = if (rng.nextDouble() < 1.0 - pInt) 1 else 0
      (d, tof, completed)
    }.toDF("def_dist", "tof", "completed")

    val fitted = CompProbFit.fit(obs, CompProbFit.defaultGrid)
    assert(fitted.n == 8000)
    assert(fitted.ttiSigma == trueSigma,
      s"expected $trueSigma, got ${fitted.ttiSigma} (bce=${fitted.bce})")
    assert(fitted.aMax == aMax && fitted.sMax == sMax)
  }

  test("adam fit beats the grid and recovers the generating params") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val trueSigma = 0.31; val aMax = 7.67; val sMax = 9.42
    val k = math.Pi / math.sqrt(3.0) / trueSigma
    val obs = (1 to 8000).map { _ =>
      val d = 1.0 + rng.nextDouble() * 15.0
      val tof = 0.5 + rng.nextDouble() * 3.0
      val dLt = sMax * sMax / (2 * aMax)
      val tTot = if (d <= dLt) math.sqrt(2 * d / aMax)
                 else sMax / aMax + (d - dLt) / sMax
      val pInt = 1.0 / (1.0 + math.exp(-k * (tof - tTot)))
      val completed = if (rng.nextDouble() < 1.0 - pInt) 1 else 0
      (d, tof, completed)
    }.toDF("def_dist", "tof", "completed")

    val grid = CompProbFit.fit(obs, CompProbFit.defaultGrid)
    val adam = CompProbFit.fitAdam(obs, iters = 300)
    assert(adam.n == 8000)
    // continuous fit must do at least as well as the best grid point
    assert(adam.bce <= grid.bce + 1e-6,
      s"adam bce ${adam.bce} vs grid ${grid.bce}")
    // and land near the generating sigma (the sharply identified param)
    assert(math.abs(adam.ttiSigma - trueSigma) / trueSigma < 0.2,
      s"sigma ${adam.ttiSigma} vs $trueSigma")
  }

  test("adam fit converges from a far-off init without NaNs") {
    import spark.implicits._
    val obs = Seq((2.0, 1.0, 1), (9.0, 2.5, 0), (4.0, 1.2, 1), (12.0, 3.0, 0))
      .toDF("def_dist", "tof", "completed")
    val r = CompProbFit.fitAdam(obs, initSigma = 2.0, initA = 20.0,
      initS = 30.0, iters = 50)
    assert(!r.bce.isNaN && !r.bce.isInfinite)
    assert(r.ttiSigma > 0 && r.aMax > 0 && r.sMax > 0)
  }

  test("degenerate observations still return a finite loss") {
    import spark.implicits._
    val obs = Seq((5.0, 2.0, 1), (5.0, 2.0, 0)).toDF("def_dist", "tof", "completed")
    val r = CompProbFit.fit(obs, CompProbFit.defaultGrid.take(5))
    assert(!r.bce.isNaN && !r.bce.isInfinite)
  }

  test("observations derive end-to-end from tracking + play outcomes") {
    val norm = Normalize(ToyData.tracking(spark), ToyData.games(spark),
      ToyData.plays(spark))
    val obs = CompProbFit.observationsFromTracking(norm, ToyData.plays(spark))
      .collect()
    // every toy play has snap/throw/arrive events and a DEF side
    assert(obs.length == 4)
    obs.foreach { r =>
      assert(r.getAs[Double]("def_dist") > 0)
      assert(r.getAs[Double]("tof") > 0 && r.getAs[Double]("tof") < 4.1)
      val c = r.getAs[Int]("completed")
      assert(c == 0 || c == 1)
    }
    // and they feed the fit directly
    val norm2 = spark.createDataFrame(spark.sparkContext.parallelize(
      obs.toSeq), obs.head.schema)
    val fit = CompProbFit.fit(norm2, CompProbFit.defaultGrid.take(6))
    assert(fit.n == 4)
  }
}
