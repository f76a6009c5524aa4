package graft.functions

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis functions for a training-data pipeline: document
  * fingerprinting (rolling hash), heuristic language ID, and a BPE-ish
  * regex tokenizer. All pure column expressions (whole-stage codegen) —
  * no UDFs, so the 100 TB scan stays in Tungsten.
  */
object TextFunctions {

  /** Rolling-hash modulus (2^31 - 1) and base. */
  val P = 2147483647L
  val B = 256L

  /** Polynomial rolling hash (Horner fold) of the full text:
    * h = fold(chars, 0, (acc, c) -> (acc * B + codepoint(c)) % P).
    * Exact 64-bit integer arithmetic — identical in any engine. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        expr(s"aggregate(split(text, ''), 0L, (acc, c) -> (acc * $B + ascii(c)) % $P)")
          .as("fp"))
      .orderBy("doc_id")
  }

  val fingerprintSql: String =
    s"""SELECT doc_id,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
       |    (acc, c) -> (acc * $B + c) % $P) AS fp
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  /** Marker-word tables for heuristic language ID. Deterministic scoring:
    * count token hits per language, argmax with lexicographic tie-break. */
  val Markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "nicht", "ist"),
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "los", "y", "de", "que"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  /** Per-document language prediction: explode tokens, join the
    * (broadcast) marker table, count hits per (doc, lang), keep argmax
    * (lexicographic tie-break). Docs with zero marker hits get 'und'.
    * Shared by the confusion-matrix query and the training pipeline's
    * language-filter stage. */
  def langPredictions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val markers = Markers.flatMap { case (l, ws) => ws.map(w => (l, w)) }
      .toDF("cand_lang", "marker")
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(col("doc_id"), col("lang"),
      explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
    val hits = toks.join(broadcast(markers), col("tok") === col("marker"))
      .groupBy("doc_id", "lang", "cand_lang")
      .agg(count(lit(1)).as("hits"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("hits").desc, col("cand_lang"))
    val pred = hits.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("cand_lang").as("predicted"))
    docs.select("doc_id", "lang")
      .join(pred.select("doc_id", "predicted"), Seq("doc_id"), "left")
      .withColumn("predicted", coalesce(col("predicted"), lit("und")))
  }

  /** Language ID confusion matrix: per (actual lang, predicted) counts —
    * which also oracle-checks the argmax logic. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    langPredictions(spark, dir)
      .groupBy("lang", "predicted")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "predicted")
  }

  /** CTE chain producing per-doc (doc_id, lang, predicted) — shared by
    * the confusion-matrix oracle and the pipeline-audit oracle. */
  val langPredictionsCtes: String = {
    val markerValues = Markers.flatMap { case (l, ws) =>
      ws.map(w => s"('$l', '$w')")
    }.mkString(", ")
    s"""markers(cand_lang, marker) AS (VALUES $markerValues),
       |toks AS (
       |  SELECT doc_id, lang,
       |    UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS tok
       |  FROM documents),
       |hits AS (
       |  SELECT doc_id, lang, cand_lang, count(*) AS hits
       |  FROM toks JOIN markers ON tok = marker
       |  GROUP BY 1, 2, 3),
       |pred AS (
       |  SELECT doc_id, lang, cand_lang AS predicted
       |  FROM (SELECT doc_id, lang, cand_lang,
       |          row_number() OVER (PARTITION BY doc_id
       |                             ORDER BY hits DESC, cand_lang) AS rn
       |        FROM hits) t
       |  WHERE rn = 1),
       |all_pred AS (
       |  SELECT d.doc_id, d.lang, coalesce(p.predicted, 'und') AS predicted
       |  FROM documents d LEFT JOIN pred p ON d.doc_id = p.doc_id)""".stripMargin
  }

  val langIdSql: String =
    s"""WITH $langPredictionsCtes
       |SELECT lang, predicted, count(*) AS n_docs
       |FROM all_pred
       |GROUP BY 1, 2
       |ORDER BY lang, predicted""".stripMargin



  /** BPE-ish tokenizer: letter runs, digit runs, or single non-space
    * symbols; counts per doc aggregated per source. */
  def bpeTokenCount(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(col("source"),
        size(expr("regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)"))
          .cast("long").as("n_bpe"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_bpe")).as("total_bpe_tokens"),
           max(col("n_bpe")).as("max_bpe_tokens"))
      .orderBy("source")
  }

  val bpeTokenCountSql: String =
    """SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_bpe) AS BIGINT) AS total_bpe_tokens,
      |  max(n_bpe) AS max_bpe_tokens
      |FROM (
      |  SELECT source,
      |    CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS BIGINT) AS n_bpe
      |  FROM documents) t
      |GROUP BY source
      |ORDER BY source""".stripMargin
}
