package graft

import graft.ops.Sketches
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkTestBase {

  private def overlaps(df: org.apache.spark.sql.DataFrame, col3: String) =
    df.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  test("with k above every set size the sketch is exact") {
    val est = Sketches.kmvUserOverlap(spark, sfDir, k = 100000)
      .select("type_a", "type_b", "est_overlap")
    val exact = Sketches.exactUserOverlap(spark, sfDir)
    assert(overlaps(est, "est_overlap") == overlaps(exact, "n_overlap"))
  }

  test("estimation regime stays within a usable error bound") {
    val k = 64
    val est = overlaps(Sketches.kmvUserOverlap(spark, sfDir, k = k)
      .select("type_a", "type_b", "est_overlap"), "est_overlap")
    val exact = overlaps(Sketches.exactUserOverlap(spark, sfDir), "n_overlap")
    assert(est.keySet == exact.keySet)
    assert(exact.values.forall(_ > 0), "test corpus must have overlaps")
    val relErrs = exact.map { case (pair, ex) =>
      math.abs(est(pair) - ex).toDouble / ex
    }
    val meanErr = relErrs.sum / relErrs.size
    // KMV stderr ~ 1/sqrt(k) ≈ 0.125 at k=64; allow 2× on the mean
    assert(meanErr < 0.25, f"mean relative error $meanErr%.3f at k=$k")
    // and sides' ndv estimates are sane too
    val sides = Sketches.kmvUserOverlap(spark, sfDir, k = k).collect()
    val exactSides = Tables.events(spark, sfDir)
      .select("event_type", "user_id").distinct()
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sides.foreach { r =>
      val ea = r.getAs[Long]("est_users_a").toDouble / exactSides(r.getString(0))
      assert(ea > 0.6 && ea < 1.5, s"ndv estimate off: $r")
    }
  }

  test("sketches are mergeable: union sketch equals sketch of the union") {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val k = 32
    val sk = Sketches.kmvSketches(ev, k).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val types = sk.keys.toSeq.sorted.take(2)
    val merged = (sk(types(0)) ++ sk(types(1))).distinct.sorted.take(k)
    val direct = Sketches.kmvSketches(
      ev.filter($"event_type".isin(types: _*))
        .withColumn("event_type", lit("both")), k)
      .collect().head.getSeq[Long](1)
    assert(merged == direct, "k-min of sketch union must equal union's sketch")
  }
}
