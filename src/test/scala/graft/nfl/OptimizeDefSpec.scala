package graft.nfl

import graft.SparkTestBase
import FrameEppa._

class OptimizeDefSpec extends SparkTestBase {

  val flatEpa: Array[Double] = Array.tabulate(120)(i => i / 30.0)

  test("reachable cells respect kinematic radius and field bounds") {
    val params = Params()
    val cells = OptimizeDef.reachableCells(60, 26, 0.0, params, 1.0, 2.0)
    assert(cells.nonEmpty)
    // stationary player, 1 s horizon: d ≤ 0.5·a·t² + … < ~6 yd
    val tAcc = math.min(1.0, params.sMax / params.aMax)
    val dMax = 0.5 * params.aMax * tAcc * tAcc + params.sMax * (1.0 - tAcc)
    cells.foreach { case (x, y) =>
      val d = math.hypot(x - 60, y - 26)
      assert(d <= dMax + 1e-9)
      assert(x >= 0.5 && x <= 119.5 && y >= -0.5 && y <= 53.5)
    }
  }

  test("greedy optimization never increases the objective") {
    val players = Array(
      Player(1, "WR1", isOff = true, 45, 20, 3, 0, 0, 0),
      Player(2, "WR2", isOff = true, 45, 32, 3, 0, 0, 0),
      Player(3, "CB1", isOff = false, 50, 10, 0, 0, 0, 0), // badly positioned
      Player(4, "CB2", isOff = false, 50, 42, 0, 0, 0, 0))
    val in = FrameInput(1, 1, 20, 15, 30, 26, players)
    val (moves, improved) = OptimizeDef.optimizeFrame(
      spark, in, flatEpa, -0.5, step = 4.0)
    assert(moves.length == 2) // one decision per defender
    moves.foreach(m => assert(m.objAfter <= m.objBefore + 1e-12))
    // the roll-forward means later baselines reflect earlier moves
    val k = new Kernel(Params(), Priors.synthetic(), _ => 5.0)
    val before = k.compute(in, flatEpa, -0.5).pass.eppa1Tot
    val after = k.compute(improved, flatEpa, -0.5).pass.eppa1Tot
    assert(after <= before + 1e-12)
    // defenders that moved stayed within their kinematic reach
    moves.filter(m => m.toX != m.fromX || m.toY != m.fromY).foreach { m =>
      assert(math.hypot(m.toX - m.fromX, m.toY - m.fromY) <= 10.0)
    }
  }

  test("optimizeJob: one job over many plays, greedy in-task") {
    val sparkS = this.spark
    import sparkS.implicits._
    def mkFrame(g: Long, p: Long) = FrameInput(g, p, 20, 15, 30, 26, Array(
      Player(1, "WR1", isOff = true, 45, 20, 3, 0, 0, 0),
      Player(2, "WR2", isOff = true, 45, 32, 3, 0, 0, 0),
      Player(3, "CB1", isOff = false, 50, 10, 0, 0, 0, 0),
      Player(4, "CB2", isOff = false, 50, 42, 0, 0, 0, 0)))
    val inputs = sparkS.createDataset(Seq(
      mkFrame(1, 100), mkFrame(1, 200), mkFrame(2, 300)))
    // play (2, 300) has no EPA table → dropped like the reference's skips
    val epa = Map((1L, 100L) -> (flatEpa, -0.5), (1L, 200L) -> (flatEpa, -0.5))
    val res = OptimizeDef.optimizeJob(inputs, epa, step = 6.0).collect()
    assert(res.length == 2)
    res.foreach { fo =>
      assert(fo.objAfter <= fo.objBefore + 1e-12)
      assert(fo.moves.length == 2)
      // the greedy chain is internally consistent: each step starts from
      // the previous step's outcome
      fo.moves.sliding(2).foreach {
        case Seq(a, b) => assert(b.objBefore == a.objAfter)
        case _ =>
      }
    }
    // identical inputs → identical optimization on both plays
    assert(res.map(r => (r.objBefore, r.objAfter)).distinct.length == 1)
  }
}
