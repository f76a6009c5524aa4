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
  *  - embeddings: copy c applies a signed permutation of the dimensions
  *    (orthogonal transform: x'_j = ±x_perm(j)). Orthogonality preserves
  *    every within-copy cosine exactly; across copies even mass-
  *    concentrated ("spiky") vectors decorrelate, because matching the
  *    heavy dimensions requires two independent permutations to agree —
  *    a plain per-dimension sign flip is NOT enough for spiky vectors
  *    (cos(F₁x, F₂x) stays near ±1 when one dimension dominates).
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

  /** Embeddings ×n: per-copy signed dimension permutation (orthogonal,
    * cosine-preserving within a copy; see object doc). */
  def embeddings(spark: SparkSession, baseDir: String, n: Int): DataFrame = {
    val base = graft.Tables.embeddings(spark, baseDir)
    val dim = base.select(size(col("embedding"))).first().getInt(0)
    (0 until n).map { c =>
      val emb =
        if (c == 0) col("embedding")
        else {
          val rnd = new scala.util.Random(104729L * c + 7)
          val perm = rnd.shuffle((0 until dim).toVector)
          val sign = Vector.fill(dim)(if (rnd.nextBoolean()) 1f else -1f)
          array((0 until dim).map { j =>
            (element_at(col("embedding"), perm(j) + 1) * lit(sign(j)))
              .cast("float")
          }: _*)
        }
      base.select(
        (col("vec_id") + lit(c.toLong * VecStride)).as("vec_id"),
        emb.as("embedding"), col("label"))
    }.reduce(_ unionByName _)
  }

  /** Events ×n: id/user-shifted copies (raw INT64-nanos ts preserved). */
  def events(spark: SparkSession, baseDir: String, n: Int): DataFrame =
    spark.read.schema(graft.Tables.eventsRawSchema)
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
