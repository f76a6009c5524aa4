package graft.nfl

import org.apache.spark.sql.SparkSession

/** Greedy defensive-positioning optimizer (M5, reference
  * `analysis/optimize_def.py:52-139`): per defender, enumerate kinematically
  * reachable positions, evaluate the EPPA surface with the defender moved
  * there, keep the argmin, and roll the improvement forward to the next
  * defender.
  *
  * The greedy outer loop is inherently sequential (SURVEY §7.4 — don't
  * force it into dataflow); each step's candidate evaluation is the
  * parallel part: candidates become a Dataset, the frame-EPPA kernel maps
  * over them as one Spark job (the reference shards this across CUDA
  * devices, `optimize_def.py:188-190`). Defenders are processed
  * line-of-scrimmage → backfield (`optimize_def.py:101-103`).
  *
  * Objective modes mirror `reduce_eppa` (`optimize_def.py:40-49`):
  * sum | max over the (F,T) surface.
  */
object OptimizeDef {

  final case class Move(nflId: Long, fromX: Double, fromY: Double,
                        toX: Double, toY: Double, objBefore: Double,
                        objAfter: Double)

  sealed trait Mode
  case object SumMode extends Mode
  case object MaxMode extends Mode

  private def objective(p: FrameEppa.PassSummary, mode: Mode): Double =
    mode match {
      case SumMode => p.eppa1Tot
      case MaxMode => p.maxEppa1
    }

  /** Positions reachable within `tHorizon` seconds given the player's
    * current speed and the a_max/s_max kinematics, sampled on a `step`
    * grid (the reference enumerates integer cells with the same
    * feasibility test, `optimize_def.py:60-78`). */
  def reachableCells(px: Double, py: Double, speed: Double,
                     params: FrameEppa.Params, tHorizon: Double,
                     step: Double): Seq[(Double, Double)] = {
    val tAcc = math.min(tHorizon, (params.sMax - speed) / params.aMax)
    val dMax = speed * tAcc + 0.5 * params.aMax * tAcc * tAcc +
      params.sMax * math.max(0.0, tHorizon - tAcc)
    val cells = for {
      dx <- BigDecimal(-dMax) to BigDecimal(dMax) by BigDecimal(step)
      dy <- BigDecimal(-dMax) to BigDecimal(dMax) by BigDecimal(step)
      x = px + dx.toDouble; y = py + dy.toDouble
      if dx.toDouble * dx.toDouble + dy.toDouble * dy.toDouble <= dMax * dMax
      if x >= 0.5 && x <= 119.5 && y >= -0.5 && y <= 53.5
    } yield (x, y)
    cells
  }

  /** Greedy pass over every defender of one frame. Returns the applied
    * moves and the final (improved) frame. */
  def optimizeFrame(spark: SparkSession, in: FrameEppa.FrameInput,
                    epaComp: Array[Double], epaInc: Double,
                    params: FrameEppa.Params = FrameEppa.Params(),
                    priors: FrameEppa.Priors = FrameEppa.Priors.synthetic(),
                    xyacScore: Array[Double] => Double = _ => 5.0,
                    mode: Mode = SumMode,
                    tHorizon: Double = 1.0,
                    step: Double = 3.0): (Seq[Move], FrameEppa.FrameInput) = {
    import spark.implicits._
    val bPriors = spark.sparkContext.broadcast(priors)
    val bEpa = spark.sparkContext.broadcast((epaComp, epaInc))

    def evalFrames(frames: Seq[FrameEppa.FrameInput], labels: Seq[Int]): Seq[(Int, Double)] = {
      val data = frames.zip(labels)
      spark.createDataset(data)
        .map { case (fi, label) =>
          val k = new FrameEppa.Kernel(params, bPriors.value, xyacScore)
          val out = k.compute(fi, bEpa.value._1, bEpa.value._2)
          (label, mode match {
            case SumMode => out.pass.eppa1Tot
            case MaxMode => out.pass.maxEppa1
          })
        }.collect().toSeq
    }

    var current = in
    val moves = scala.collection.mutable.ArrayBuffer.empty[Move]
    // LoS → backfield order: defenders sorted by x descending
    val defOrder = current.players.zipWithIndex
      .filter(!_._1.isOff).sortBy(-_._1.x).map(_._2)

    defOrder.foreach { jIdx =>
      val p = current.players(jIdx)
      val speed = math.sqrt(p.vx * p.vx + p.vy * p.vy)
      val cands = (p.x, p.y) +: reachableCells(p.x, p.y, speed, params, tHorizon, step)
        .filterNot { case (x, y) => x == p.x && y == p.y }
      val frames = cands.map { case (x, y) =>
        val moved = current.players.clone()
        moved(jIdx) = p.copy(x = x, y = y)
        current.copy(players = moved)
      }
      val scored = evalFrames(frames, cands.indices)
      val baseline = scored.find(_._1 == 0).get._2
      val (bestIdx, bestObj) = scored.minBy { case (i, v) => (v, i) }
      if (bestObj < baseline - 1e-12 && bestIdx != 0) {
        val (bx, by) = cands(bestIdx)
        moves += Move(p.nflId, p.x, p.y, bx, by, baseline, bestObj)
        val moved = current.players.clone()
        moved(jIdx) = p.copy(x = bx, y = by)
        current = current.copy(players = moved)
      } else {
        moves += Move(p.nflId, p.x, p.y, p.x, p.y, baseline, baseline)
      }
    }
    (moves.toSeq, current)
  }
}
