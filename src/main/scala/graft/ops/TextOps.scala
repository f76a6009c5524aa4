package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-pipeline operators over the documents table: exact dedup, token
  * counting, quality scoring. (Near-dup families live in graft.dedup.)
  *
  * Scale: all of these are embarrassingly parallel scans with one
  * hash-aggregate; the dedup groupBy shuffles on a 128-bit digest, which
  * distributes uniformly — no skew mitigation needed.
  */
object TextOps {

  /** P8 / exact dedup: group by md5(text), keep the smallest doc_id.
    * Hashing the text (not grouping raw strings) keeps shuffle rows small
    * when documents are MB-sized. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .groupBy(md5($"text".cast("binary")).as("text_hash"))
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select($"keep_id", $"n_copies")
      .orderBy($"keep_id")
  }

  val dedupExactSql: String =
    """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents
      |GROUP BY md5(text)
      |ORDER BY keep_id""".stripMargin

  /** Token counting: whitespace tokens per doc, aggregated per language.
    * (The BPE-ish variant is in graft.functions.TextFunctions.) */
  def tokenStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("n_tokens",
        size(split(trim($"text"), "\\s+")).cast("long"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
           sum($"n_tokens").as("total_tokens"),
           max($"n_tokens").as("max_tokens"))
      .orderBy($"lang")
  }

  val tokenStatsSql: String =
    """SELECT lang, count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens, max(n_tokens) AS max_tokens
      |FROM (
      |  SELECT lang,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
      |  FROM documents) t
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** Quality scoring: per-doc length / digit-ratio / uppercase-ratio
    * heuristics, integer-scaled so the oracle hash is exact. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val txt = $"text"
    val nChars = length(txt).cast("double")
    val nDigits = length(txt) - length(regexp_replace(txt, "[0-9]", ""))
    val nUpper = length(txt) - length(regexp_replace(txt, "[A-Z]", ""))
    val nSpaces = length(txt) - length(regexp_replace(txt, " ", ""))
    Tables.documents(spark, dir)
      .select($"doc_id",
        length(txt).cast("long").as("n_chars"),
        floor(nDigits * lit(10000) / nChars).cast("long").as("digit_bp"),
        floor(nUpper * lit(10000) / nChars).cast("long").as("upper_bp"),
        floor(nSpaces * lit(10000) / nChars).cast("long").as("space_bp"))
      .orderBy($"doc_id")
  }

  // Integer basis points via floor(int * 10000 / len) — identical integer
  // division semantics in both engines, no float comparison at all.
  val qualityScoreSql: String =
    """SELECT doc_id,
      |  CAST(len(text) AS BIGINT) AS n_chars,
      |  CAST(floor(len(regexp_replace(text, '[^0-9]', '', 'g')) * 10000.0
      |       / len(text)) AS BIGINT) AS digit_bp,
      |  CAST(floor(len(regexp_replace(text, '[^A-Z]', '', 'g')) * 10000.0
      |       / len(text)) AS BIGINT) AS upper_bp,
      |  CAST(floor((len(text) - len(replace(text, ' ', ''))) * 10000.0
      |       / len(text)) AS BIGINT) AS space_bp
      |FROM documents
      |ORDER BY doc_id""".stripMargin
}
