package graft.similarity

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the embeddings table.
  *
  * Similarity metric for oracle-gated queries: integer-quantized dot
  * product. Each float coordinate is quantized per-row to round(x*1000) —
  * an integer-valued double. Products and 64-term sums of integer-valued
  * doubles < 2^53 are EXACT in IEEE arithmetic, so the score is
  * bit-identical in any engine and any summation order. Cosine (float)
  * variants live in tests with tolerance, not in the oracle gate.
  *
  * Scale path: [[annLsh]] buckets vectors by random-hyperplane signs
  * (deterministic ±1 planes derived from md5) so the pair space shrinks
  * ~256× before scoring; brute force stays linear in n for a fixed query
  * set and is the accuracy baseline.
  */
object Ann {

  val QuantScale = 1000.0
  val NumPlanes = 8
  val Dim = 64

  /** Quantized embedding: array<double> of exact integer values. */
  def quantized(c: Column): Column =
    transform(c, x => round(x.cast("double") * QuantScale))

  /** Exact integer dot product of two quantized arrays via the native
    * codegen expression (graft.functions.VectorExpressions) — same strict
    * left-to-right fold as the HOF composition it replaced, so results are
    * bit-identical; the loop just runs unboxed inside WholeStageCodegen.
    * Callers must have VectorExpressions.register(spark)'d the session. */
  def intDot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot(a, b)

  /** The composed-builtins equivalent, kept for benchmarking the native
    * expression against (interpreted lambda + boxing per element). */
  def intDotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Brute-force top-5 neighbors for query vectors (vec_id < 20) by
    * quantized dot product; deterministic tie-break on neighbor id. */
  def bruteForceTopK(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), quantized(col("embedding")).as("q"))
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("q").as("qv"))
    val cand = emb.select(col("vec_id").as("neighbor_id"), col("q").as("nv"))
    val scored = broadcast(queries).join(cand, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        intDot(col("qv"), col("nv")).cast("long").as("dot"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("query_id", "rank", "neighbor_id", "dot")
      .orderBy("query_id", "rank")
  }

  // DuckDB: list_transform to the same integer-valued doubles, then
  // list_dot_product — exact for the same reason.
  private val qListSql =
    "list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000.0))"

  val bruteForceTopKSql: String =
    s"""WITH q AS (SELECT vec_id, $qListSql AS qv FROM embeddings),
       |scored AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    CAST(list_dot_product(a.qv, b.qv) AS BIGINT) AS dot
       |  FROM q a JOIN q b ON a.vec_id < 20 AND a.vec_id <> b.vec_id)
       |SELECT query_id, rank, neighbor_id, dot FROM (
       |  SELECT query_id, neighbor_id, dot,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY dot DESC, neighbor_id) AS rank
       |  FROM scored) t
       |WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  /** Deterministic ±1 hyperplane matrix: sign(p,i) = +1 iff the first hex
    * digit of md5("p_i") is >= '8'. Computed driver-side once; the oracle
    * reproduces the identical md5 logic in SQL. */
  lazy val planes: Array[Array[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(NumPlanes, Dim) { (p, i) =>
      val hex = md.digest(s"${p}_$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if ("89abcdef".contains(hex.charAt(0))) 1 else -1
    }
  }

  /** LSH bucket id: NumPlanes sign bits of plane·v (exact int arithmetic). */
  def bucketExpr(q: Column): Column = {
    (0 until NumPlanes).map { p =>
      val planeLit = array(planes(p).map(s => lit(s.toDouble)): _*)
      when(intDot(q, planeLit) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** LSH-bucketed near-dup pairs: same bucket, dot >= threshold. The
    * bucket equi-join is the scale path — pair space shrinks ~2^NumPlanes×
    * and the shuffle key (bucket) is uniform by construction. */
  def lshPairs(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), quantized(col("embedding")).as("q"))
      .withColumn("bucket", bucketExpr(col("q")))
    val l = emb.select(col("bucket").as("bkt"), col("vec_id").as("vec_a"), col("q").as("qa"))
    val r = emb.select(col("bucket").as("bkt_r"), col("vec_id").as("vec_b"), col("q").as("qb"))
    l.join(r, col("bkt") === col("bkt_r") && col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), col("bkt").as("bucket"),
        intDot(col("qa"), col("qb")).cast("long").as("dot"))
      .orderBy("vec_a", "vec_b")
  }

  val lshPairsSql: String = {
    // plane sign replicated inline: md5('p_i') first hex digit >= '8'
    s"""WITH qv AS (SELECT vec_id, $qListSql AS q FROM embeddings),
       |coords AS (
       |  SELECT vec_id, i, q[i + 1] AS x
       |  FROM qv, UNNEST(range(0, $Dim)) AS t(i)),
       |proj AS (
       |  SELECT c.vec_id, p.p,
       |    sum(c.x * (CASE WHEN strpos('89abcdef',
       |        substring(md5(CAST(p.p AS VARCHAR) || '_' || CAST(c.i AS VARCHAR)), 1, 1)) > 0
       |      THEN 1.0 ELSE -1.0 END)) AS dot_p
       |  FROM coords c, UNNEST(range(0, $NumPlanes)) AS p(p)
       |  GROUP BY 1, 2),
       |buckets AS (
       |  SELECT vec_id,
       |    CAST(sum(CASE WHEN dot_p > 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM proj GROUP BY vec_id)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, ba.bucket,
       |  CAST(list_dot_product(a.q, b.q) AS BIGINT) AS dot
       |FROM qv a JOIN buckets ba ON a.vec_id = ba.vec_id
       |JOIN buckets bb ON ba.bucket = bb.bucket
       |JOIN qv b ON b.vec_id = bb.vec_id AND a.vec_id < b.vec_id
       |ORDER BY vec_a, vec_b""".stripMargin
  }
}
