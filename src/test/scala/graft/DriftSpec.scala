package graft

import graft.ops.Drift
import org.apache.spark.sql.functions._

class DriftSpec extends SparkTestBase {

  private def gaussian(n: Int, mean: Double, sd: Double, seed: Int) = {
    import spark.implicits._
    val rng = new scala.util.Random(seed)
    (1 to n).map(_ => mean + sd * rng.nextGaussian()).toDF("v").repartition(6)
  }

  test("identical distributions score near zero; a shift crosses the alarm bar") {
    val ref = gaussian(20000, 0.0, 1.0, 1)
    val same = gaussian(20000, 0.0, 1.0, 2)
    val shifted = gaussian(20000, 0.8, 1.0, 3)
    val psiSame = Drift.psi(ref, same, "v")
    val psiShift = Drift.psi(ref, shifted, "v")
    info(f"psi(same)=$psiSame%.4f psi(shifted)=$psiShift%.4f")
    assert(psiSame < 0.02, f"same-distribution PSI $psiSame%.4f not ~0")
    assert(psiShift > 0.25, f"0.8σ shift PSI $psiShift%.4f below the alarm bar")
    assert(psiShift > psiSame * 10)
  }

  test("report bins are complete, fractions sum to ~1, self-PSI is 0") {
    val ref = gaussian(5000, 10.0, 3.0, 7)
    val rep = Drift.psiReport(ref, ref, "v", bins = 8).collect()
    assert(rep.map(_.getInt(0)).sorted.sameElements(0 until 8))
    val refFrac = rep.map(_.getDouble(3)).sum
    assert(math.abs(refFrac - 1.0) < 1e-6)
    // quantile binning: each reference bin holds ~1/bins of the mass
    rep.foreach(r => assert(math.abs(r.getDouble(3) - 0.125) < 0.02, r.toString))
    assert(rep.map(_.getDouble(5)).sum == 0.0, "self-PSI must be exactly 0")
  }

  test("categorical PSI flags a mix shift and tolerates one-sided categories") {
    import spark.implicits._
    val ref = (Seq.fill(700)("en") ++ Seq.fill(200)("fr") ++ Seq.fill(100)("de"))
      .toDF("lang")
    val same = (Seq.fill(1400)("en") ++ Seq.fill(400)("fr") ++ Seq.fill(200)("de"))
      .toDF("lang")
    val shifted = (Seq.fill(300)("en") ++ Seq.fill(500)("fr") ++
      Seq.fill(100)("de") ++ Seq.fill(100)("zh")).toDF("lang")
    assert(Drift.psiCategorical(ref, same, "lang") < 1e-9)
    val p = Drift.psiCategorical(ref, shifted, "lang")
    info(f"mix-shift categorical PSI = $p%.3f")
    assert(p > 0.25, f"mix shift + new category must alarm, got $p%.3f")
    // the zh category exists only on one side — finite contribution
    val rep = Drift.psiCategoricalReport(ref, shifted, "lang").collect()
    assert(rep.forall(r => !r.getDouble(5).isInfinite && !r.getDouble(5).isNaN))
    assert(rep.map(_.getString(0)).sorted.sameElements(Array("de", "en", "fr", "zh")))
  }

  test("events value distribution is stable across the corpus's two halves") {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .withColumn("day", date_format($"ts", "yyyy-MM-dd"))
    val days = ev.select("day").distinct().orderBy("day").as[String].collect()
    val mid = days(days.length / 2)
    val first = ev.filter($"day" < mid)
    val second = ev.filter($"day" >= mid)
    val p = Drift.psi(first, second, "value")
    info(f"first-vs-second-half PSI = $p%.4f")
    assert(p < 0.1, f"synthetic corpus halves should be stable, PSI $p%.4f")
  }
}
