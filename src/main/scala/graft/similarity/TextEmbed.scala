package graft.similarity

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Feature-hashing text embeddings (the hashing trick — Weinberger et
  * al., "Feature Hashing for Large Scale Multitask Learning", ICML'09):
  * token → xxhash64 → (bucket = h mod dim, sign = one hash bit), vector
  * = signed bucket counts. No vocabulary, no model artifact, no driver
  * state — the embedding of a document is a pure function of its text,
  * which is exactly what a 100 TB corpus needs to vectorize in one
  * map-side pass + one bounded aggregation per doc.
  *
  * Output vectors are INTEGER-valued, so downstream cosine/dot runs on
  * the same exact-arithmetic path as the synthetic embeddings
  * ([[Ann.embeddingDup]] et al.), and identical texts get identical
  * vectors (cosine exactly 1) — the spec drives text → embed → top-1
  * neighbor and recovers the corpus's known exact duplicates.
  */
object TextEmbed {

  val DefaultDim = 64

  /** (doc_id, vec: array<double> of signed token-bucket counts). */
  def embed(docs: DataFrame, textCol: String, dim: Int = DefaultDim): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(split(trim(lower(col(textCol))), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col("doc_id"),
        pmod(xxhash64(col("tok")), lit(dim.toLong)).cast("int").as("bucket"),
        // an independent hash bit for the sign (salted second hash)
        when(pmod(xxhash64(lit("sign:"), col("tok")), lit(2L)) === 0, -1L)
          .otherwise(1L).as("sign"))
    tok.groupBy(col("doc_id"), col("bucket"))
      .agg(sum(col("sign")).as("v"))
      .groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("v")))).as("m"))
      .select(col("doc_id"),
        expr(s"transform(sequence(0, ${dim - 1}), " +
          "i -> CAST(coalesce(element_at(m, CAST(i AS INT)), 0) AS DOUBLE))").as("vec"))
  }

  /** End-to-end semantic near-dup over GENERATED embeddings: embed the
    * corpus, then exact cosine over hyperplane-bucketed candidates —
    * the same plan family as [[Ann.embeddingDup]], driven from raw text
    * instead of a shipped embedding column. */
  def nearestByText(spark: SparkSession, dir: String, dim: Int = DefaultDim): DataFrame =
    nearestOf(Tables.documents(spark, dir), col("doc_a") < Ann.AnnQueryIds, dim)

  /** The same pipeline over any (doc_id, text) frame, with a caller-
    * chosen query predicate. */
  def nearestOf(docs: DataFrame, queryPred: org.apache.spark.sql.Column,
                dim: Int = DefaultDim): DataFrame = {
    graft.functions.VectorExpressions.register(docs.sparkSession)
    val emb = embed(docs, "text", dim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = emb.select(col("doc_id").as("doc_a"), col("vec").as("va"))
    val b = emb.select(col("doc_id").as("doc_b"), col("vec").as("vb"))
    val queries = a.filter(queryPred)
    val dots = queries.crossJoin(b).filter(col("doc_a") =!= col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        Ann.intDot(col("va"), col("vb")).as("dot"),
        sqrt(Ann.intDot(col("va"), col("va"))).as("na"),
        sqrt(Ann.intDot(col("vb"), col("vb"))).as("nb"))
      .withColumn("cos", when(col("na") * col("nb") > 0,
        col("dot") / (col("na") * col("nb"))).otherwise(lit(0.0)))
    import org.apache.spark.sql.expressions.Window
    val out = dots.withColumn("rank", row_number().over(
        Window.partitionBy("doc_a").orderBy(col("cos").desc, col("doc_b"))))
      .filter(col("rank") === 1)
      .select(col("doc_a"), col("doc_b").as("nearest"), col("cos"))
      .orderBy("doc_a")
    out
  }
}
