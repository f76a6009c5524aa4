package graft.nfl

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** M6: receiver-target Gaussian field vs hand-computed pdf values
  * (`target_probability.ipynb` cells 4, 6). */
class TargetProbSpec extends SparkTestBase {

  import FrameEppa.{Nx, NT}

  /** One frame: QB at (20, 26); one stationary receiver past the LOS at
    * (40.5, 30.5) — on a grid point so the peak lands exactly there. */
  private def mkNorm(recVx: Double = 0.0, recVy: Double = 0.0) = {
    val spark = this.spark
    import spark.implicits._
    val vTheta = math.atan2(recVy, recVx)
    val vMag = math.hypot(recVx, recVy)
    Seq(
      (1L, 1L, 10, 99L, "QB", "OFF", 20.0, 26.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 25.0),
      (1L, 1L, 10, 7L, "WR", "OFF", 40.5, 30.5, recVx, recVy, vTheta, vMag, 0.0, 0.0, 25.0),
      (1L, 1L, 10, 55L, "CB", "DEF", 42.0, 31.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 25.0)
    ).toDF("gameId", "playId", "frameId", "nflId", "position", "team_pos",
      "x", "y", "v_x", "v_y", "v_theta", "v_mag", "a_x", "a_y", "los")
  }

  test("receivers filter: QB and defenders excluded, pocket rule applies") {
    val spark = this.spark
    import spark.implicits._
    val r = TargetProb.receivers(mkNorm()).select("nflId").as[Long].collect()
    assert(r.toSeq == Seq(7L))
    // a back inside the pocket and behind the LOS is not a candidate
    val withBack = mkNorm().union(Seq(
      (1L, 1L, 10, 30L, "RB", "OFF", 18.0, 27.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 25.0)
    ).toDF(mkNorm().columns: _*))
    val r2 = TargetProb.receivers(withBack).select("nflId").as[Long].collect()
    assert(r2.toSeq == Seq(7L))
  }

  test("surface normalizes to 1 per frame and peaks at the target point") {
    val spark = this.spark
    import spark.implicits._
    val tp = TargetProb.targetProbability(mkNorm(), nT = 4).cache()
    assert(tp.count() == FrameEppa.F * 4)
    val total = tp.agg(sum("target_prob")).as[Double].head()
    assert(math.abs(total - 1.0) < 1e-9)
    // stationary receiver: target point = (40.5, 30.5) for every t
    val top = tp.orderBy(desc("target_prob"))
      .select("cell_x", "cell_y").as[(Double, Double)].head()
    assert(top == ((40.5, 30.5)))
  }

  test("pdf matches the hand-computed bivariate Gaussian") {
    val spark = this.spark
    import spark.implicits._
    // stationary: speed_infl = 0 → Σ = dist_infl·I, rotation irrelevant.
    // QB anchor rounds to (20, 26); d = hypot(40.5-20, 30.5-26) = 20.993
    val d = math.hypot(20.5, 4.5)
    val distInfl = math.min(10.0, 4.0 + d * d / 54.0) // = 10 (d² = 440.5)
    assert(distInfl == 10.0)
    val peak = 1.0 / (2.0 * math.Pi * distInfl)
    // value 3 cells right of the peak: exp(-9/(2·10)) · peak
    val off3 = peak * math.exp(-9.0 / (2.0 * distInfl))
    val raw = TargetProb.receivers(mkNorm())
    // reconstruct un-normalized pdf via one t slice of the pipeline
    val tp = TargetProb.targetProbability(mkNorm(), nT = 1).cache()
    val byCell = tp.select("cell_x", "cell_y", "target_prob")
      .as[(Double, Double, Double)].collect()
      .map { case (x, y, p) => (x, y) -> p }.toMap
    // normalizer = Σ pdf over all cells; ratios are normalizer-free
    val ratio = byCell((43.5, 30.5)) / byCell((40.5, 30.5))
    assert(math.abs(ratio - off3 / peak) < 1e-6,
      s"ratio $ratio vs ${off3 / peak}")
    assert(raw.count() == 1)
  }

  test("motion elongates the distribution along the velocity direction") {
    val spark = this.spark
    import spark.implicits._
    // receiver sprinting +x at 8 yd/s: at t = 0.1 the target is ~(41.3, 30.5)
    val tp = TargetProb.targetProbability(mkNorm(recVx = 8.0), nT = 1).cache()
    val byCell = tp.select("cell_x", "cell_y", "target_prob")
      .as[(Double, Double, Double)].collect()
      .map { case (x, y, p) => (x, y) -> p }.toMap
    // same offset along motion (x) vs perpendicular (y): along wins
    val along = byCell((47.5, 30.5))
    val perp = byCell((41.5, 36.5))
    assert(along > perp,
      s"along-motion $along should exceed perpendicular $perp")
  }
}
