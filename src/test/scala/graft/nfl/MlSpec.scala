package graft.nfl

import graft.SparkTestBase
import graft.ml.GbdtScorer
import org.apache.spark.sql.functions._

class MlSpec extends SparkTestBase {

  val toyDump: String =
    """booster[0]:
      |0:[f0<1.5] yes=1,no=2,missing=1
      |	1:leaf=0.1
      |	2:leaf=0.3
      |booster[1]:
      |0:leaf=0.2
      |booster[2]:
      |0:[f1<0] yes=1,no=2,missing=2
      |	1:leaf=-0.5
      |	2:leaf=0.5
      |booster[3]:
      |0:leaf=-0.2
      |""".stripMargin

  lazy val model = GbdtScorer.parse(
    toyDump.linesIterator, Seq("f0", "f1"), numClasses = 2)

  test("gbdt dump parses tree shapes") {
    assert(model.trees.length == 4)
    assert(model.trees(0).leaf(1) == 0.1)
    assert(model.trees(1).feat(0) == -1)
  }

  test("margins accumulate per class with correct branch logic") {
    // x = (1.0, -1.0): b0 → yes leaf 0.1; b2 → yes leaf -0.5
    val m = model.margins(Array(1.0, -1.0))
    assert(math.abs(m(0) - (0.1 + (-0.5))) < 1e-12)
    assert(math.abs(m(1) - (0.2 + (-0.2))) < 1e-12)
    // x = (2.0, 1.0): b0 → no leaf 0.3; b2 → no leaf 0.5
    val m2 = model.margins(Array(2.0, 1.0))
    assert(math.abs(m2(0) - 0.8) < 1e-12)
  }

  test("missing (NaN) routes to the missing branch") {
    val m = model.margins(Array(Double.NaN, Double.NaN))
    // b0 missing=1 → 0.1 ; b2 missing=2 → 0.5
    assert(math.abs(m(0) - (0.1 + 0.5)) < 1e-12)
  }

  test("softprob sums to 1 and expectation interpolates class values") {
    val p = model.softprob(Array(1.0, -1.0))
    assert(math.abs(p.sum - 1.0) < 1e-12)
    val e = model.expectation(Array(1.0, -1.0), Array(0.0, 10.0))
    assert(e > 0 && e < 10)
    assert(math.abs(e - p(1) * 10.0) < 1e-12)
  }

  test("withExpectation scores a DataFrame column-wise") {
    import spark.implicits._
    val df = Seq((1.0, -1.0), (2.0, 1.0)).toDF("f0", "f1")
    val scored = GbdtScorer.withExpectation(df, model, Array(0.0, 10.0),
      Seq("f0", "f1"), "score")
    val vals = scored.select("score").collect().map(_.getDouble(0))
    assert(vals.length == 2 && vals.forall(v => v > 0 && v < 10))
  }

  test("epa state machine: first down resets downs, TD scores 7") {
    import spark.implicits._
    val pre = Seq((1L, 1L, 1, 60.0, 10.0)).toDF(
      "gameId", "playId", "down_x", "yardline_100", "ydstogo")
    // stub scorer: xep = linear in field position (further downfield =
    // more points), so overrides are distinguishable
    val score: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => df.withColumn("xep", (lit(100.0) - col("yardline_100_post")) / 20.0)
    val epa = EpaModel.epaTable(pre, score).collect()
    assert(epa.length == 120)
    val byX = epa.map(r => r.getAs[Double]("play_endpoint_x") -> r).toMap
    // touchdown override at x >= 110
    assert(byX(110.5).getAs[Double]("xep_comp") == 7.0)
    assert(byX(119.5).getAs[Double]("xep_comp") == 7.0)
    // safety override at x <= 10
    assert(byX(0.5).getAs[Double]("xep_comp") == -2.0)
    // LOS at yardline_100=60 → los=50, first down line 60:
    // endpoint 70.5 is a first down, no turnover, xep from stub
    val fd = byX(70.5)
    assert(fd.getAs[Double]("xep_comp") > 0)
  }

  test("epa state machine: 4th-down incompletion inverts possession") {
    import spark.implicits._
    val pre = Seq((1L, 1L, 4, 60.0, 10.0)).toDF(
      "gameId", "playId", "down_x", "yardline_100", "ydstogo")
    val score: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => df.withColumn("xep", lit(2.0))
    val epa = EpaModel.epaTable(pre, score).head
    // down5 path: xepa_inc = -xep - before_ep = -2 - 2 = -4
    assert(math.abs(epa.getAs[Double]("xepa_inc") - (-4.0)) < 1e-9)
  }

  test("movement stats: rolling speed bounded by instantaneous max") {
    val norm = Normalize(ToyData.tracking(spark), ToyData.games(spark),
      ToyData.plays(spark))
    val top = MovementStats.topSpeedByPosition(norm, 3)
    val maxInst = norm.agg(max("v_mag")).head.getDouble(0)
    assert(top.count() > 0)
    assert(top.agg(max("max_speed")).head.getDouble(0) <= maxInst + 1e-9)
    val q = MovementStats.positionQuantiles(norm)
    assert(q.filter(col("p90") < col("p50")).count() == 0)
  }
}
