package graft.scale

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaled-corpus synthesis for the scale rehearsal (ScaleBench).
  *
  * The driver ships sf0.001/sf0.01/sf0.1; every 100-TB design claim in
  * this engine (df-capped postings, band joins, broadcast thresholds,
  * union-find/propagation crossover) was argued in scaladoc but measured
  * only at sf0.1. This generator produces ×N corpora from sf0.1 so those
  * claims can be MEASURED at 10–50× (sf1/sf5-equivalent row counts).
  *
  * Scale model: N independent shards of the same distribution — exactly
  * what a larger crawl looks like (more pages, same per-shard structure;
  * vocabulary grows with corpus size, per-token df distribution is
  * preserved). Concretely, copy `c` of each table is the sf0.1 table with
  * keys shifted by a stride and content made disjoint from other copies:
  *
  *  - documents: copy c applies a substitution cipher — a per-copy
  *    permutation of [a-z] (case-consistently) and [0-9] via
  *    `translate`. A character bijection maps every char-K shingle set
  *    bijectively, so within-copy Jaccard/minhash/simhash structure is
  *    EXACTLY the sf0.1 structure (near-dup pairs replicate linearly),
  *    while across copies a shingle collides only if every one of its
  *    characters happens to map identically under both permutations —
  *    vanishing for 7-grams of real text. (A first attempt salted each
  *    token with a copy prefix; that injects the same 3-char substring
  *    before every word and INFLATES within-copy char-shingle overlap —
  *    the smoke run showed a ~3000× pair explosion. The cipher has no
  *    such artifact.) True near-dup pairs therefore grow exactly
  *    linearly, so any super-linear growth in candidates or output is an
  *    artifact of the ALGORITHM, which is what the rehearsal detects.
  *  - embeddings: copy c applies a DENSE random rotation (Gaussian QR,
  *    seeded per copy). Orthogonality preserves every within-copy cosine
  *    to float precision; across copies any vector maps to a uniformly
  *    random direction, so P(|cos| ≥ 0.95) ≈ e^(−d·t²/2) ≈ 10⁻¹³ at
  *    d=64. Two cheaper constructions fail on this corpus and were
  *    measured failing: a per-dimension sign flip keeps cos(F₁x, F₂x)
  *    near ±1 when one dimension dominates, and a signed PERMUTATION
  *    still collides at ~1/(2d) per cross pair for axis-aligned vectors
  *    (the x50 run emitted 22.7M cross-copy "near-dups" from exactly
  *    that — the corpus clusters are near-axis-aligned).
  *  - events / orders / lineitem: id-shifted copies (facts grow ×N,
  *    dimension tables stay fixed — the realistic shape of growth; the
  *    TPC-H dims are at most `customer`, which stays broadcast-sized).
  *
  * Everything is pure column expressions — the generator itself is a
  * map-only Spark job and runs at any N.
  */
object ScaleData {

  val DocStride = 10000000L
  val VecStride = 10000000L
  val EventStride = 1000000000L
  val UserStride = 100000L
  val OrderStride = 100000000L

  private def copies(spark: SparkSession, n: Int): DataFrame =
    spark.range(n).select(col("id").cast("int").as("copy"))

  private val Lower = "abcdefghijklmnopqrstuvwxyz"
  private val Digits = "0123456789"

  /** Deterministic per-copy cipher alphabets for `translate` (copy 0 is
    * the identity). Upper-case maps to the upper-case of the permuted
    * lower-case letter, so the cipher commutes with `lower()` — the
    * dedup pipeline's first step. */
  private[scale] def cipher(c: Int): (String, String) = {
    val from = Lower + Lower.toUpperCase + Digits
    if (c == 0) (from, from)
    else {
      val rnd = new scala.util.Random(7919L * c + 13)
      val pl = rnd.shuffle(Lower.toVector).mkString
      val pd = rnd.shuffle(Digits.toVector).mkString
      (from, pl + pl.toUpperCase + pd)
    }
  }

  /** Documents ×n: per-copy substitution cipher (see object doc).
    * `translate` preserves length, so n_chars carries over unchanged. */
  def documents(spark: SparkSession, baseDir: String, n: Int): DataFrame = {
    val base = graft.Tables.documents(spark, baseDir)
    (0 until n).map { c =>
      val (from, to) = cipher(c)
      base.select(
        (col("doc_id") + lit(c.toLong * DocStride)).as("doc_id"),
        translate(col("text"), from, to).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
  }

  /** Deterministic random rotation: Gaussian matrix, Gram–Schmidt rows.
    * Copy 0 is the identity. */
  private[scale] def rotation(d: Int, c: Int): Array[Array[Double]] = {
    if (c == 0) return Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val rnd = new scala.util.Random(104729L * c + 7)
    val m = Array.fill(d, d)(rnd.nextGaussian())
    for (i <- 0 until d) {
      for (k <- 0 until i) {
        var dot = 0.0
        var j = 0
        while (j < d) { dot += m(i)(j) * m(k)(j); j += 1 }
        j = 0
        while (j < d) { m(i)(j) -= dot * m(k)(j); j += 1 }
      }
      var nrm = 0.0
      var j = 0
      while (j < d) { nrm += m(i)(j) * m(i)(j); j += 1 }
      nrm = math.sqrt(nrm)
      j = 0
      while (j < d) { m(i)(j) /= nrm; j += 1 }
    }
    m
  }

  /** Embeddings ×n: per-copy dense random rotation (orthogonal,
    * cosine-preserving within a copy; see object doc). The rotations for
    * all copies (n·d² doubles — ~1.6 MB at n=50, d=64) ride into the
    * tasks as a closure constant; the map itself is one typed pass. */
  def embeddings(spark: SparkSession, baseDir: String, n: Int): DataFrame = {
    import spark.implicits._
    val base = graft.Tables.embeddings(spark, baseDir)
    val dim = base.select(size(col("embedding"))).first().getInt(0)
    val qs: Array[Array[Array[Double]]] =
      Array.tabulate(n)(c => rotation(dim, c))
    val stride = VecStride
    base.select(col("vec_id"), col("embedding"), col("label"))
      .as[(Long, Seq[Float], Int)]
      .flatMap { case (id, v, label) =>
        val x = v.toArray
        (0 until n).map { c =>
          val out =
            if (c == 0) x
            else {
              val q = qs(c)
              val o = new Array[Float](dim)
              var j = 0
              while (j < dim) {
                var s = 0.0
                var i = 0
                while (i < dim) { s += q(j)(i) * x(i); i += 1 }
                o(j) = s.toFloat
                j += 1
              }
              o
            }
          (id + c.toLong * stride, out, label)
        }
      }
      .toDF("vec_id", "embedding", "label")
  }

  /** Events ×n: id/user-shifted copies. The footer schema (not a forced
    * one) decides how ts reads, so whichever physical layout the base
    * corpus has survives the copy and Tables.eventsAt re-adapts on read. */
  def events(spark: SparkSession, baseDir: String, n: Int): DataFrame =
    spark.read
      .parquet(s"$baseDir/events.parquet")
      .crossJoin(broadcast(copies(spark, n)))
      .select(
        (col("event_id") + col("copy") * EventStride).as("event_id"),
        col("ts"),
        (col("user_id") + col("copy") * UserStride).as("user_id"),
        col("event_type"), col("value"), col("props"))

  def orders(spark: SparkSession, baseDir: String, n: Int): DataFrame =
    graft.Tables.orders(spark, baseDir)
      .crossJoin(broadcast(copies(spark, n)))
      .select(
        (col("o_orderkey") + col("copy") * OrderStride).as("o_orderkey"),
        col("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate"), col("o_orderpriority"))

  def lineitem(spark: SparkSession, baseDir: String, n: Int): DataFrame =
    graft.Tables.lineitem(spark, baseDir)
      .crossJoin(broadcast(copies(spark, n)))
      .select(
        (col("l_orderkey") + col("copy") * OrderStride).as("l_orderkey"),
        col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_returnflag"), col("l_linestatus"),
        col("l_shipdate"))

  /** Materialize a full ×n corpus under `outDir` (same file layout as the
    * driver's sf dirs, so every `queries()` entry runs on it unchanged).
    * Dimension tables are copied as-is. Returns outDir. */
  def write(spark: SparkSession, baseDir: String, outDir: String,
            n: Int): String = {
    def parts(rows: Long): Int =
      math.max(4, math.min(64, (rows / 500000L).toInt)).toInt
    documents(spark, baseDir, n).repartition(parts(5000L * n))
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    embeddings(spark, baseDir, n).repartition(parts(2000L * n))
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    events(spark, baseDir, n).repartition(parts(100000L * n))
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    orders(spark, baseDir, n).repartition(parts(150000L * n))
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
    lineitem(spark, baseDir, n).repartition(parts(600000L * n))
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      spark.read.parquet(s"$baseDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
    outDir
  }
}
