package graft.ml

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LogRegSpec extends SparkTestBase {

  test("recovers a separable decision boundary with high accuracy") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    // y = 1 iff 2*x1 - x2 + 0.5 > noise-ish margin
    val rows = (1 to 4000).map { _ =>
      val x1 = rng.nextGaussian() * 2
      val x2 = rng.nextGaussian() * 3 + 1
      val z = 2.0 * x1 - x2 + 0.5 + rng.nextGaussian() * 0.3
      (x1, x2, if (z > 0) 1 else 0)
    }
    val df = rows.toDF("x1", "x2", "y").repartition(8)
    val model = LogReg.train(df, Seq("x1", "x2"), "y", iters = 250)
    assert(model.n == 4000)
    val agree = df.withColumn("pred", (LogReg.scoreCol(model) > 0.5).cast("int"))
      .filter($"pred" === $"y").count()
    assert(agree >= 3800, s"accuracy ${agree / 4000.0}")
    // boundary direction: w1 > 0 > w2, |w1/w2| ≈ 2
    assert(model.weights(0) > 0 && model.weights(1) < 0)
    val ratio = -model.weights(0) / model.weights(1)
    assert(ratio > 1.2 && ratio < 3.2, s"w1/w2 ratio $ratio")
  }

  test("scoring columns equal a driver-side evaluation of the model") {
    import spark.implicits._
    val df = Seq((1.0, 10.0, 1), (2.0, -5.0, 0), (-3.0, 2.0, 1), (0.5, 0.0, 0))
      .toDF("a", "b", "y")
    val model = LogReg.train(df, Seq("a", "b"), "y", iters = 30)
    val got = df.select(col("a"), col("b"),
      LogReg.logitCol(model).as("z"), LogReg.scoreCol(model).as("p")).collect()
    got.foreach { r =>
      val z = model.bias + model.weights(0) * r.getDouble(0) +
        model.weights(1) * r.getDouble(1)
      assert(math.abs(r.getDouble(2) - z) < 1e-9)
      val p = 1.0 / (1.0 + math.exp(-math.max(-30, math.min(30, z))))
      assert(math.abs(r.getDouble(3) - p) < 1e-9)
    }
  }

  test("constant features do not blow up training (zero-variance guard)") {
    import spark.implicits._
    val df = (1 to 100).map(i => (5.0, i.toDouble, if (i > 50) 1 else 0))
      .toDF("c", "x", "y")
    val model = LogReg.train(df, Seq("c", "x"), "y", iters = 80)
    assert(!model.loss.isNaN && model.loss < 0.7)
    assert(model.weights.forall(w => !w.isNaN && !w.isInfinite))
  }

  test("the frozen quality-classifier constants agree with the float scorer") {
    import graft.ops.TextOps
    val exact = TextOps.qualityClassifier(spark, sfDir)
    // the same logit via the general scorer with weights = micros / 1e6
    val floatModel = LogReg.Model(
      Seq("digit_bp", "upper_bp", "space_bp", "chars_capped"),
      TextOps.ClassifierWeightsMicros.map(_ / 1e6),
      TextOps.ClassifierBiasMicros / 1e6, 0.0, 0, 0L)
    import spark.implicits._
    val feats = TextOps.qualityScore(spark, sfDir)
      .withColumn("chars_capped", least($"n_chars", lit(2000L)))
    val viaFloat = feats.select($"doc_id",
      round(LogReg.logitCol(floatModel) * 1e6).cast("long").as("float_micros"))
    val disagree = exact.join(viaFloat, "doc_id")
      .filter($"logit_micros" =!= $"float_micros").count()
    assert(disagree == 0, "integer and float scoring paths disagree")
    // both classes must actually occur, or the classifier is vacuous
    val classes = exact.select("is_quality").distinct().as[Long].collect().sorted
    assert(classes.sameElements(Array(0L, 1L)), classes.mkString(","))
  }
}
