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
}
