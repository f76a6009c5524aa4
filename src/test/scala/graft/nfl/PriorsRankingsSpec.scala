package graft.nfl

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PriorsRankingsSpec extends SparkTestBase {

  test("gamma MLE recovers known parameters from synthetic samples") {
    val rng = new scala.util.Random(42)
    // gamma(shape=4, scale=0.5) via sum of 4 exponentials
    val samples = Array.fill(20000) {
      -0.5 * (0 until 4).map(_ => math.log(rng.nextDouble())).sum
    }
    val n = samples.length.toLong
    val p = Priors.mleFromStats(n, samples.sum, samples.map(math.log).sum)
    assert(math.abs(p.shape - 4.0) < 0.15, s"shape ${p.shape}")
    assert(math.abs(p.scale - 0.5) < 0.03, s"scale ${p.scale}")
  }

  test("digamma/trigamma against known values") {
    // ψ(1) = −γ
    assert(math.abs(Priors.digamma(1.0) - (-0.5772156649015329)) < 1e-10)
    // ψ′(1) = π²/6
    assert(math.abs(Priors.trigamma(1.0) - math.Pi * math.Pi / 6) < 1e-10)
    // Γ(5) = 24
    assert(math.abs(Priors.logGamma(5.0) - math.log(24.0)) < 1e-10)
  }

  test("gamma pdf integrates to ~1") {
    val dx = 0.001
    val total = (1 to 40000).map(i => Priors.gammaPdf(i * dx, 2.5, 0.8) * dx).sum
    assert(math.abs(total - 1.0) < 1e-3)
  }

  test("fitTGivenL builds normalized distance-conditional rows") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    // synthetic passes: tof ≈ gamma scaled with distance
    val rows = (1 to 4000).map { _ =>
      val d = 1 + rng.nextInt(50)
      val tof = math.max(0.1,
        d / 20.0 * (0.5 - 0.25 * math.log(rng.nextDouble())))
      (d.toDouble, tof)
    }
    val priors = Priors.fitTGivenL(rows.toDF("dist", "tof"))
    val rowSums = priors.tGivenL.map(_.sum)
    // fitted rows normalize to 1; unfitted (sparse) rows are all-zero
    rowSums.foreach(s => assert(math.abs(s - 1.0) < 1e-9 || s == 0.0))
    assert(rowSums.count(s => s > 0) > 30)
    // longer passes → later modal flight time (weak monotonicity check)
    def mode(r: Array[Double]) = r.indexOf(r.max)
    val m10 = mode(priors.tGivenL(9)); val m40 = mode(priors.tGivenL(39))
    assert(m40 > m10)
  }

  test("2-D smoothing conserves mass and spreads peaks") {
    import spark.implicits._
    val pts = Seq.fill(100)((40.0, 40.0)).toDF("dx", "dy")
    val g = Priors.smoothedDensity2D(pts, "dx", "dy", 0, 0, 80, 1.0, 5.0)
    val mass = g.map(_.sum).sum
    assert(math.abs(mass - 100.0) < 1.0) // boundary loss only
    assert(g(40)(40) < 100.0) // peak spread out
    assert(g(40)(45) > 0.0) // neighbors got mass
    assert(math.abs(g(40)(45) - g(45)(40)) < 1e-9) // isotropic
  }

  test("rankings over kernel outputs of toy plays") {
    import spark.implicits._
    val norm = Normalize(ToyData.tracking(spark), ToyData.games(spark),
      ToyData.plays(spark))
    val epaTables = Seq((1L, 100L), (1L, 200L), (2L, 100L), (2L, 300L))
      .map(k => k -> (Array.tabulate(120)(i => i / 60.0), -0.5)).toMap
    val out = EppaJob.run(EppaJob.frameInputs(norm), epaTables).cache()
    val passes = out.map(_.pass).toDF()
    val stats = out.flatMap(_.players).toDF()

    val summary = Rankings.playSummary(passes)
    assert(summary.count() == 4) // one row per toy play
    summary.collect().foreach { r =>
      assert(r.getAs[Double]("best_eppa1_tot") >=
        r.getAs[Double]("last_eppa1_tot") - 1e-12)
    }
    val joined = Rankings.withPlayMeta(summary, ToyData.plays(spark))
    assert(joined.count() == 4)
    val calib = Rankings.calibration(joined)
    assert(calib.agg(sum("n_plays")).head.getLong(0) == 4)
    val players = Rankings.playerRanking(stats, minFrames = 1)
    assert(players.count() > 0)
    val teams = Rankings.teamRanking(stats).collect()
    assert(teams.map(_.getAs[String]("teamPos")).toSet == Set("OFF", "DEF"))
  }

  test("loads the reference's shipped T|L prior table (S4)") {
    assume(new java.io.File(Priors.ReferenceTGivenLPath).isFile)
    val p = Priors.loadReferenceTGivenL().get
    assert(p.tGivenL.length == 60)
    assert(p.tGivenL.forall(_.length == FrameEppa.NT))
    // every distance row is a (possibly unnormalized) distribution with
    // mass, and longer distances shift mass to longer flight times
    assert(p.tGivenL.forall(_.sum > 0))
    def meanT(d: Int) = {
      val row = p.tGivenL(d)
      val m = row.zipWithIndex.map { case (v, k) => v * (k + 1) }.sum / row.sum
      m
    }
    assert(meanT(50) > meanT(5))
  }
}
