package graft.nfl
import FrameEppa._
object KernelBenchReal {
  def main(args: Array[String]): Unit = {
    val players = Array.tabulate(21) { i =>
      Player(i + 1, s"P$i", i < 10, 20.0 + i * 3, 5.0 + (i % 11) * 4, 2.0, 1.0, 0.1, 0.1)
    }
    val in = FrameInput(1, 1, 20, 15, 30, 26, players)
    val epa = Array.tabulate(120)(_ / 60.0)
    val model = XyacModel.loadReferenceIfPresent()
    val xyac = model.map(XyacModel.kernelScorer)
      .getOrElse((_: Array[Double]) => 5.0)
    val useBatch = !args.contains("--per-call")
    val batch = if (useBatch) model.map(XyacModel.kernelBatchScorer).orNull else null
    println(s"mode=${if (batch != null) "batch" else "per-call"}")
    val k = new Kernel(Params(), Priors.synthetic(), xyac, batch)
    k.compute(in, epa, -0.5)
    k.compute(in, epa, -0.5)
    val n = 5
    val t0 = System.nanoTime()
    var i = 0
    while (i < n) { k.compute(in, epa, -0.5); i += 1 }
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"KERNEL_REAL_FRAMES_PER_SEC=${n / dt}%.2f (single-thread), ${dt / n * 1000}%.1f ms/frame")
  }
}
