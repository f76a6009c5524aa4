package graft.pipelines

import graft.Tables
import graft.dedup.Dedup
import graft.functions.TextFunctions
import graft.ops.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed training-data pipeline: every curation operator the repo
  * ships, chained the way a real 100 TB pretraining ingest runs them,
  * with a per-stage audit trail (`t_pipeline_audit`).
  *
  * Semantics are annotate-then-filter: every per-document annotation
  * (quality metrics, language prediction, exact-dup canonical flag,
  * near-dup cluster canonical flag, contamination flag) is computed over
  * the FULL corpus in one pass each, then the stages apply as a
  * conjunction prefix — stage k's survivors are the docs passing the
  * first k predicates. That is the production topology: annotations are
  * embarrassingly parallel scans (plus the dedup machinery's own bounded
  * band joins), while sequential re-filtering would serialize the whole
  * pipeline into k dependent passes over shrinking copies of the data.
  *
  * Stage order mirrors common practice (cheap row-local filters first,
  * corpus-global dedup after, decontamination last so eval overlap is
  * judged against what would actually be trained on):
  *
  *   0 raw        — every document
  *   1 quality    — length and whitespace-ratio gates (integer basis
  *                  points, no float compare)
  *   2 lang       — marker-word prediction must not CONTRADICT the
  *                  declared language ('und' passes: absence of evidence
  *                  is not evidence of mislabeling)
  *   3 exact      — canonical doc (min doc_id) per normalized-text digest
  *   4 near_dedup — canonical doc per MinHash-LSH duplicate cluster
  *   5 decontam   — drop the held-out eval subset and every doc with
  *                  >= 3 distinct 25-char shingles overlapping it
  *
  * The audit output is one row per stage with surviving doc and char
  * counts — the table a data curator actually reports. Everything is
  * integer arithmetic over deterministic annotations, so the whole
  * composition sits under the DuckDB hash gate. (The synthetic corpus
  * happens to contain near-duplicates but no byte-exact ones, so the
  * `exact` stage passes everything through there; PipelineSpec checks
  * the invariants that hold on any corpus.)
  */
object TrainingPipeline {

  /** Quality gates, in the integer basis-point space of
    * [[TextOps.qualityScore]]. */
  val MinChars = 100L
  val MaxSpaceBp = 2000L

  def pipelineAudit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val quality = TextOps.qualityScore(spark, dir)
      .select(col("doc_id"), col("n_chars").as("q_chars"), col("space_bp"))
    val lang = TextFunctions.langPredictions(spark, dir)
      .select(col("doc_id"), col("predicted"))
    val exact = TextOps.normalizeText(spark, dir)
      .select(col("doc_id"), col("norm_md5"))
      .withColumn("e_keep", row_number().over(
        Window.partitionBy("norm_md5").orderBy("doc_id")) === 1)
      .select(col("doc_id"), col("e_keep"))
    val near = Dedup.dupClusters(spark, dir)
      .select(col("doc_id"), (col("keep") === 1).as("n_keep"))
    val contam = Dedup.decontaminate(spark, dir)
      .select(col("doc_id"), lit(true).as("contaminated"))
    val ann = docs
      .join(quality, Seq("doc_id"))
      .join(lang, Seq("doc_id"))
      .join(exact, Seq("doc_id"))
      .join(near, Seq("doc_id"))
      .join(contam, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        (col("q_chars") >= MinChars && col("space_bp") <= MaxSpaceBp).as("q_keep"),
        (col("predicted") === col("lang") || col("predicted") === "und").as("l_keep"),
        col("e_keep"), col("n_keep"),
        (col("doc_id") % Dedup.DecontamEvalMod =!= 0 &&
          col("contaminated").isNull).as("c_keep"))
    // conjunction prefixes → 6 (count, chars) aggregate pairs in ONE pass
    val stages = Seq(
      "raw" -> lit(true),
      "quality" -> col("q_keep"),
      "lang" -> col("l_keep"),
      "exact" -> col("e_keep"),
      "near_dedup" -> col("n_keep"),
      "decontam" -> col("c_keep"))
    val cumulative = stages.scanLeft(lit(true)) { case (acc, (_, p)) => acc && p }
      .drop(1)
    val aggs = stages.zip(cumulative).zipWithIndex.flatMap {
      case (((name, _), keep), i) => Seq(
        sum(when(keep, 1L).otherwise(0L)).as(s"d$i"),
        sum(when(keep, col("n_chars")).otherwise(0L)).as(s"c$i"))
    }
    val one = ann.agg(aggs.head, aggs.tail: _*)
    val stackArgs = stages.zipWithIndex.map { case ((name, _), i) =>
      s"${i}L, '$name', d$i, c$i"
    }.mkString(", ")
    one.selectExpr(
        s"stack(${stages.size}, $stackArgs) AS (stage_idx, stage, n_docs, n_chars_total)")
      .orderBy("stage_idx")
  }

  /** The scrub-mode pipeline (`t_pipeline_scrub`): stages 0–4 are
    * [[pipelineAudit]]'s, but the decontamination stage TRANSFORMS
    * instead of drops — eval docs themselves leave the corpus, while a
    * training doc that overlaps the eval set stays, with only its
    * overlapping spans scrubbed ([[TextOps.decontamScrub]]). That is the
    * form production pipelines actually run: dropping a whole book for
    * one quoted benchmark question wastes data.
    *
    * The audit is denominated in TOKENS (the scrub's native unit, same
    * whitespace tokenization as the scrub itself) so the final row can
    * honestly account for partial removal: `decontam_scrub`'s
    * n_tokens_total sums each survivor's post-scrub token count
    * (n_tokens − n_covered), not its raw size. Annotate-then-filter as
    * before — the scrub annotation is computed corpus-wide in one pass
    * and applied as the last conjunction prefix. */
  def pipelineScrubAudit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
    val quality = TextOps.qualityScore(spark, dir)
      .select(col("doc_id"), col("n_chars").as("q_chars"), col("space_bp"))
    val lang = TextFunctions.langPredictions(spark, dir)
      .select(col("doc_id"), col("predicted"))
    val exact = TextOps.normalizeText(spark, dir)
      .select(col("doc_id"), col("norm_md5"))
      .withColumn("e_keep", row_number().over(
        Window.partitionBy("norm_md5").orderBy("doc_id")) === 1)
      .select(col("doc_id"), col("e_keep"))
    val near = Dedup.dupClusters(spark, dir)
      .select(col("doc_id"), (col("keep") === 1).as("n_keep"))
    val scrub = TextOps.decontamScrub(spark, dir)
      .select(col("doc_id"), (col("n_tokens") - col("n_covered")).as("n_tok_scrubbed"))
    val ann = docs
      .join(quality, Seq("doc_id"))
      .join(lang, Seq("doc_id"))
      .join(exact, Seq("doc_id"))
      .join(near, Seq("doc_id"))
      .join(scrub, Seq("doc_id"), "left") // eval docs carry no scrub row
      .select(col("doc_id"), col("n_tok"),
        (col("q_chars") >= MinChars && col("space_bp") <= MaxSpaceBp).as("q_keep"),
        (col("predicted") === col("lang") || col("predicted") === "und").as("l_keep"),
        col("e_keep"), col("n_keep"),
        (col("doc_id") % Dedup.DecontamEvalMod =!= 0).as("s_keep"),
        coalesce(col("n_tok_scrubbed"), col("n_tok")).as("n_tok_scrubbed"))
    val stages = Seq(
      ("raw", lit(true), col("n_tok")),
      ("quality", col("q_keep"), col("n_tok")),
      ("lang", col("l_keep"), col("n_tok")),
      ("exact", col("e_keep"), col("n_tok")),
      ("near_dedup", col("n_keep"), col("n_tok")),
      ("decontam_scrub", col("s_keep"), col("n_tok_scrubbed")))
    val cumulative = stages.scanLeft(lit(true)) { case (acc, (_, p, _)) => acc && p }
      .drop(1)
    val aggs = stages.zip(cumulative).zipWithIndex.flatMap {
      case (((_, _, tokCol), keep), i) => Seq(
        sum(when(keep, 1L).otherwise(0L)).as(s"d$i"),
        sum(when(keep, tokCol).otherwise(0L)).as(s"t$i"))
    }
    val one = ann.agg(aggs.head, aggs.tail: _*)
    val stackArgs = stages.zipWithIndex.map { case ((name, _, _), i) =>
      s"${i}L, '$name', d$i, t$i"
    }.mkString(", ")
    one.selectExpr(
        s"stack(${stages.size}, $stackArgs) AS (stage_idx, stage, n_docs, n_tokens_total)")
      .orderBy("stage_idx")
  }

  val pipelineScrubAuditSql: String = {
    s"""WITH ${TextFunctions.langPredictionsCtes},
       |q AS (SELECT doc_id, n_chars AS q_chars, space_bp
       |      FROM (${TextOps.qualityScoreSql}) t),
       |e AS (SELECT doc_id,
       |        (row_number() OVER (PARTITION BY norm_md5 ORDER BY doc_id) = 1) AS e_keep
       |      FROM (${TextOps.normalizeTextSql}) t),
       |nd AS (SELECT doc_id, (keep = 1) AS n_keep
       |       FROM (${Dedup.dupClustersSql}) t),
       |scr AS (SELECT doc_id, n_tokens - n_covered AS n_tok_scrubbed
       |        FROM (${TextOps.decontamScrubSql}) t),
       |tok AS (SELECT doc_id, lang,
       |          CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok
       |        FROM documents),
       |ann AS (
       |  SELECT d.doc_id, d.n_tok,
       |    (q.q_chars >= $MinChars AND q.space_bp <= $MaxSpaceBp) AS q_keep,
       |    (ap.predicted = d.lang OR ap.predicted = 'und') AS l_keep,
       |    e.e_keep, nd.n_keep,
       |    (d.doc_id % ${Dedup.DecontamEvalMod} <> 0) AS s_keep,
       |    COALESCE(scr.n_tok_scrubbed, d.n_tok) AS n_tok_scrubbed
       |  FROM tok d
       |  JOIN q USING (doc_id)
       |  JOIN all_pred ap USING (doc_id)
       |  JOIN e USING (doc_id)
       |  JOIN nd USING (doc_id)
       |  LEFT JOIN scr USING (doc_id))
       |SELECT * FROM (
       |  SELECT CAST(0 AS BIGINT) AS stage_idx, 'raw' AS stage,
       |    count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens_total
       |  FROM ann
       |  UNION ALL SELECT 1, 'quality', count(*), CAST(sum(n_tok) AS BIGINT)
       |  FROM ann WHERE q_keep
       |  UNION ALL SELECT 2, 'lang', count(*), CAST(sum(n_tok) AS BIGINT)
       |  FROM ann WHERE q_keep AND l_keep
       |  UNION ALL SELECT 3, 'exact', count(*), CAST(sum(n_tok) AS BIGINT)
       |  FROM ann WHERE q_keep AND l_keep AND e_keep
       |  UNION ALL SELECT 4, 'near_dedup', count(*), CAST(sum(n_tok) AS BIGINT)
       |  FROM ann WHERE q_keep AND l_keep AND e_keep AND n_keep
       |  UNION ALL SELECT 5, 'decontam_scrub', count(*),
       |    CAST(sum(n_tok_scrubbed) AS BIGINT)
       |  FROM ann WHERE q_keep AND l_keep AND e_keep AND n_keep AND s_keep) s
       |ORDER BY stage_idx""".stripMargin
  }

  val pipelineAuditSql: String = {
    s"""WITH ${TextFunctions.langPredictionsCtes},
       |q AS (SELECT doc_id, n_chars AS q_chars, space_bp
       |      FROM (${TextOps.qualityScoreSql}) t),
       |e AS (SELECT doc_id,
       |        (row_number() OVER (PARTITION BY norm_md5 ORDER BY doc_id) = 1) AS e_keep
       |      FROM (${TextOps.normalizeTextSql}) t),
       |nd AS (SELECT doc_id, (keep = 1) AS n_keep
       |       FROM (${Dedup.dupClustersSql}) t),
       |con AS (SELECT doc_id FROM (${Dedup.decontaminateSql}) t),
       |ann AS (
       |  SELECT d.doc_id, d.n_chars,
       |    (q.q_chars >= $MinChars AND q.space_bp <= $MaxSpaceBp) AS q_keep,
       |    (ap.predicted = d.lang OR ap.predicted = 'und') AS l_keep,
       |    e.e_keep, nd.n_keep,
       |    (d.doc_id % ${Dedup.DecontamEvalMod} <> 0
       |      AND con.doc_id IS NULL) AS c_keep
       |  FROM documents d
       |  JOIN q USING (doc_id)
       |  JOIN all_pred ap USING (doc_id)
       |  JOIN e USING (doc_id)
       |  JOIN nd USING (doc_id)
       |  LEFT JOIN con USING (doc_id))
       |SELECT * FROM (
       |  SELECT CAST(0 AS BIGINT) AS stage_idx, 'raw' AS stage,
       |    count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars_total
       |  FROM ann
       |  UNION ALL SELECT 1, 'quality', count(*), CAST(sum(n_chars) AS BIGINT)
       |  FROM ann WHERE q_keep
       |  UNION ALL SELECT 2, 'lang', count(*), CAST(sum(n_chars) AS BIGINT)
       |  FROM ann WHERE q_keep AND l_keep
       |  UNION ALL SELECT 3, 'exact', count(*), CAST(sum(n_chars) AS BIGINT)
       |  FROM ann WHERE q_keep AND l_keep AND e_keep
       |  UNION ALL SELECT 4, 'near_dedup', count(*), CAST(sum(n_chars) AS BIGINT)
       |  FROM ann WHERE q_keep AND l_keep AND e_keep AND n_keep
       |  UNION ALL SELECT 5, 'decontam', count(*), CAST(sum(n_chars) AS BIGINT)
       |  FROM ann WHERE q_keep AND l_keep AND e_keep AND n_keep AND c_keep) s
       |ORDER BY stage_idx""".stripMargin
  }
}
