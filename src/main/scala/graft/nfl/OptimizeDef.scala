package graft.nfl

import org.apache.spark.sql.{Dataset, SparkSession}

/** Greedy defensive-positioning optimizer (M5, reference
  * `analysis/optimize_def.py:52-139`): per defender, enumerate kinematically
  * reachable positions, evaluate the EPPA surface with the defender moved
  * there, keep the argmin, and roll the improvement forward to the next
  * defender.
  *
  * The greedy outer loop is inherently sequential (SURVEY §7.4 — don't
  * force it into dataflow). Parallelism comes from sharding PLAYS, the
  * reference's own shape (`optimize_def.py:188-190` shards plays across
  * CUDA devices): [[optimizeJob]] is ONE Spark job mapping over frames,
  * the greedy loop and every candidate kernel running in-process inside
  * the task. No per-step driver jobs, no collect — at season scale this
  * is thousands of frames × one task each, not thousands of tiny jobs.
  * Defenders are processed line-of-scrimmage → backfield
  * (`optimize_def.py:101-103`).
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

  /** Pure in-process greedy pass over every defender of one frame — the
    * unit of work [[optimizeJob]] runs inside each Spark task. Returns the
    * applied moves and the final (improved) frame. */
  def optimizeFrameLocal(in: FrameEppa.FrameInput,
                         epaComp: Array[Double], epaInc: Double,
                         params: FrameEppa.Params = FrameEppa.Params(),
                         priors: FrameEppa.Priors = FrameEppa.Priors.synthetic(),
                         xyacScore: Array[Double] => Double = _ => 5.0,
                         mode: Mode = SumMode,
                         tHorizon: Double = 1.0,
                         step: Double = 3.0): (Seq[Move], FrameEppa.FrameInput) = {
    val kernel = new FrameEppa.Kernel(params, priors, xyacScore)
    def score(fi: FrameEppa.FrameInput): Double =
      objective(kernel.compute(fi, epaComp, epaInc).pass, mode)

    var current = in
    var currentObj = score(current)
    val moves = scala.collection.mutable.ArrayBuffer.empty[Move]
    // LoS → backfield order: defenders sorted by x descending
    val defOrder = current.players.zipWithIndex
      .filter(!_._1.isOff).sortBy(-_._1.x).map(_._2)

    defOrder.foreach { jIdx =>
      val p = current.players(jIdx)
      val speed = math.sqrt(p.vx * p.vx + p.vy * p.vy)
      val cands = reachableCells(p.x, p.y, speed, params, tHorizon, step)
        .filterNot { case (x, y) => x == p.x && y == p.y }
      var bestObj = currentObj
      var bestX = p.x; var bestY = p.y
      cands.foreach { case (x, y) =>
        val moved = current.players.clone()
        moved(jIdx) = p.copy(x = x, y = y)
        val v = score(current.copy(players = moved))
        if (v < bestObj - 1e-12) { bestObj = v; bestX = x; bestY = y }
      }
      if (bestX != p.x || bestY != p.y) {
        moves += Move(p.nflId, p.x, p.y, bestX, bestY, currentObj, bestObj)
        val moved = current.players.clone()
        moved(jIdx) = p.copy(x = bestX, y = bestY)
        current = current.copy(players = moved)
        currentObj = bestObj
      } else {
        moves += Move(p.nflId, p.x, p.y, p.x, p.y, currentObj, currentObj)
      }
    }
    (moves.toSeq, current)
  }

  /** Back-compat single-frame entry (demo/interactive use): same local
    * greedy; SparkSession kept in the signature for source compatibility. */
  def optimizeFrame(spark: SparkSession, in: FrameEppa.FrameInput,
                    epaComp: Array[Double], epaInc: Double,
                    params: FrameEppa.Params = FrameEppa.Params(),
                    priors: FrameEppa.Priors = FrameEppa.Priors.synthetic(),
                    xyacScore: Array[Double] => Double = _ => 5.0,
                    mode: Mode = SumMode,
                    tHorizon: Double = 1.0,
                    step: Double = 3.0): (Seq[Move], FrameEppa.FrameInput) =
    optimizeFrameLocal(in, epaComp, epaInc, params, priors, xyacScore,
      mode, tHorizon, step)

  /** One optimized frame: the moves applied plus before/after objective. */
  final case class FrameOpt(gameId: Long, playId: Long, frameId: Int,
                            objBefore: Double, objAfter: Double,
                            moves: Seq[Move])

  /** Season-scale shape: ONE Spark job over many frames, the greedy loop
    * and all candidate kernels running inside each task (mirrors
    * `optimize_def.py:188-190` sharding plays across devices). EPA tables
    * and priors ride as broadcasts; frames without an EPA table are
    * dropped (reference skips error plays). */
  def optimizeJob(inputs: Dataset[FrameEppa.FrameInput],
                  epaTables: Map[(Long, Long), (Array[Double], Double)],
                  params: FrameEppa.Params = FrameEppa.Params(),
                  priors: FrameEppa.Priors = FrameEppa.Priors.synthetic(),
                  xyacScore: Array[Double] => Double = _ => 5.0,
                  mode: Mode = SumMode,
                  tHorizon: Double = 1.0,
                  step: Double = 3.0): Dataset[FrameOpt] = {
    val spark = inputs.sparkSession
    import spark.implicits._
    val bEpa = spark.sparkContext.broadcast(epaTables)
    val bPriors = spark.sparkContext.broadcast(priors)
    inputs.flatMap { in =>
      bEpa.value.get((in.gameId, in.playId)) match {
        case Some((comp, inc)) =>
          val (moves, _) = optimizeFrameLocal(in, comp, inc, params,
            bPriors.value, xyacScore, mode, tHorizon, step)
          val before = moves.headOption.map(_.objBefore).getOrElse(0.0)
          val after = moves.lastOption.map(_.objAfter).getOrElse(before)
          Iterator.single(FrameOpt(in.gameId, in.playId, in.frameId,
            before, after, moves))
        case None => Iterator.empty
      }
    }
  }
}
