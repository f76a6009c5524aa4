package graft

import graft.pipelines.TrainingPipeline

/** Corpus-independent invariants of the composed training pipeline
  * (`t_pipeline_audit`); the DuckDB hash gate pins the exact values. */
class PipelineSpec extends SparkTestBase {

  test("audit stages are ordered, monotone non-increasing, and end non-empty") {
    val rows = TrainingPipeline.pipelineAudit(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("stage_idx")).toSeq == (0L to 5L))
    assert(rows.map(_.getAs[String]("stage")).toSeq ==
      Seq("raw", "quality", "lang", "exact", "near_dedup", "decontam"))
    val docs = rows.map(_.getAs[Long]("n_docs")).toSeq
    val chars = rows.map(_.getAs[Long]("n_chars_total")).toSeq
    assert(docs == docs.sorted.reverse, s"doc counts must not grow: $docs")
    assert(chars == chars.sorted.reverse, s"char counts must not grow: $chars")
    assert(docs.last > 0, "the pipeline must not filter the corpus to nothing")
    // chars track docs: a stage dropping docs must drop at least one char
    docs.zip(chars).sliding(2).foreach { case Seq((d0, c0), (d1, c1)) =>
      if (d1 < d0) assert(c1 < c0, s"docs fell $d0->$d1 but chars held at $c0")
    }
  }

  test("scrub-mode pipeline keeps contaminated docs but strictly fewer tokens") {
    val drop = TrainingPipeline.pipelineAudit(spark, sfDir).collect()
    val rows = TrainingPipeline.pipelineScrubAudit(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("stage_idx")).toSeq == (0L to 5L))
    assert(rows.map(_.getAs[String]("stage")).toSeq ==
      Seq("raw", "quality", "lang", "exact", "near_dedup", "decontam_scrub"))
    val docs = rows.map(_.getAs[Long]("n_docs")).toSeq
    val toks = rows.map(_.getAs[Long]("n_tokens_total")).toSeq
    assert(docs == docs.sorted.reverse, s"doc counts must not grow: $docs")
    assert(toks == toks.sorted.reverse, s"token counts must not grow: $toks")
    assert(docs.last > 0)
    // the whole point of scrub-mode: contaminated docs SURVIVE (only the
    // eval subset itself leaves), so the final stage keeps at least as
    // many docs as the drop-mode pipeline's decontam stage
    assert(docs.last >= drop.last.getAs[Long]("n_docs"),
      s"scrub-mode kept ${docs.last} docs < drop-mode ${drop.last.getAs[Long]("n_docs")}")
    // stages 0-4 share drop-mode's predicates: doc counts must agree
    assert(docs.take(5).toSeq == drop.take(5).map(_.getAs[Long]("n_docs")).toSeq,
      "stages 0-4 must be identical between the two pipeline modes")
  }
}
