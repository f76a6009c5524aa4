package graft.ml

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Distributed PCA: the eigensolver and the one-pass covariance are
  * gated against first principles (floats have no cross-engine oracle
  * identity) — eigen-residuals, orthonormality, spectrum order, trace
  * conservation, planted-direction recovery, and a full-rank
  * reconstruction round-trip. */
class PcaSpec extends SparkTestBase {

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("covariance matches a driver-side two-pass reference") {
    import spark.implicits._
    val vs = Tables.embeddings(spark, sfDir)
      .select($"embedding").as[Array[Float]].collect()
      .map(_.map(_.toDouble))
    val n = vs.length
    val d = Pca.Dim
    val mean = Array.tabulate(d)(i => vs.map(_(i)).sum / n)
    val (gotN, gotMean, gotCov) = Pca.covariance(spark, sfDir)
    assert(gotN == n)
    (0 until d).foreach(i => assert(math.abs(gotMean(i) - mean(i)) < 1e-9))
    // spot-check a band of covariance cells against the naive form
    for (i <- 0 until d by 7; j <- i until d by 11) {
      val ref = vs.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n
      assert(math.abs(gotCov(i)(j) - ref) < 1e-7, s"cov($i,$j)")
    }
  }

  test("eigenpairs: residuals, orthonormality, order, trace conservation") {
    val (_, _, cov) = Pca.covariance(spark, sfDir)
    val (vals, vecs) = Pca.jacobiEigen(cov)
    val d = cov.length
    // descending spectrum, non-negative for a covariance
    vals.sliding(2).foreach(p => assert(p(0) >= p(1) - 1e-12))
    assert(vals.last > -1e-9)
    // ‖C w − λ w‖ small for every pair
    val scale = math.max(vals.head, 1e-12)
    for (k <- 0 until d) {
      val w = vecs(k)
      val cw = Array.tabulate(d)(i => dot(cov(i), w))
      val res = math.sqrt((0 until d)
        .map(i => { val r = cw(i) - vals(k) * w(i); r * r }).sum)
      assert(res < 1e-8 * scale + 1e-10, s"eigenpair $k residual $res")
    }
    // orthonormal rows
    for (a <- 0 until d by 5; b <- a until d by 5) {
      val g = dot(vecs(a), vecs(b))
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(g - want) < 1e-9, s"gram($a,$b)=$g")
    }
    // Σλ = trace(C): rotations preserve total variance
    val trace = (0 until d).map(i => cov(i)(i)).sum
    assert(math.abs(vals.sum - trace) < 1e-8 * math.max(math.abs(trace), 1.0))
  }

  test("a planted dominant direction is recovered as PC1") {
    val rng = new scala.util.Random(7)
    val d = 16
    val dir0 = Array.tabulate(d)(i => math.sin(i + 1.0))
    val nrm = math.sqrt(dot(dir0, dir0))
    val u = dir0.map(_ / nrm)
    // x = 10·g·u + 0.1·noise → covariance ≈ 100·uuᵀ + 0.01·I
    val xs = Array.fill(4000) {
      val g = rng.nextGaussian() * 10.0
      Array.tabulate(d)(i => g * u(i) + 0.1 * rng.nextGaussian())
    }
    val mean = Array.tabulate(d)(i => xs.map(_(i)).sum / xs.length)
    val cov = Array.tabulate(d, d) { (i, j) =>
      xs.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / xs.length
    }
    val (vals, vecs) = Pca.jacobiEigen(cov)
    assert(vals(0) > 50 * vals(1), s"spectrum gap missing: ${vals.take(3).toSeq}")
    val align = math.abs(dot(vecs(0), u))
    assert(align > 0.999, s"PC1 alignment $align")
  }

  test("projection query matches the driver reference; full rank reconstructs") {
    import spark.implicits._
    val (mean, _, comps) = Pca.fit(spark, sfDir, Pca.K)
    val got = Pca.pcaProject(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (1 to Pca.K).map(j => r.getDouble(j)).toArray).toMap
    val vs = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    vs.foreach { case (id, v) =>
      val c = v.map(_.toDouble).zip(mean).map { case (x, m) => x - m }
      comps.zipWithIndex.foreach { case (w, j) =>
        val ref = dot(c, w)
        assert(math.abs(got(id)(j) - ref) < 1e-6,
          s"vec $id pc$j: ${got(id)(j)} vs $ref")
      }
    }
    // k = d reconstructs exactly (orthonormal basis round-trip)
    val (m2, _, full) = Pca.fit(spark, sfDir, Pca.Dim)
    val (id0, v0) = vs.head
    val c0 = v0.map(_.toDouble).zip(m2).map { case (x, m) => x - m }
    val scores = full.map(w => dot(c0, w))
    val rec = Array.tabulate(Pca.Dim)(i =>
      m2(i) + full.zip(scores).map { case (w, s) => s * w(i) }.sum)
    val err = math.sqrt((0 until Pca.Dim)
      .map(i => { val r = rec(i) - v0(i); r * r }).sum)
    assert(err < 1e-8, s"vec $id0 full-rank reconstruction error $err")
  }
}
