package graft

import org.apache.spark.sql.functions._

/** The r18 scrub kernels (`graft_covered_idx`, `graft_scrub_kept`) must
  * be bit-identical to the nested-HOF compositions they replaced — that
  * equivalence keeps the unchanged scrub-family oracle SQL valid for
  * t_span_scrub(_guarded), t_decontam_scrub, t_selfdedup_* and
  * t_pipeline_scrub. Driven over real corpus token frames with
  * synthesized window-start sets (including overlaps, doc edges, full
  * coverage, empty coverage, and a leading-empty token from unstripped
  * tab whitespace). */
class ScrubKernelSpec extends SparkTestBase {

  private val G = 8 // ScrubGram

  test("covered_idx and scrub_kept equal the HOF forms on corpus-shaped frames") {
    import spark.implicits._
    graft.functions.ScrubExpressions.register(spark)
    val toks = Tables.documents(spark, sfDir)
      .select($"doc_id", split(trim($"text"), "\\s+").as("t"))
      .select($"doc_id", $"t", size($"t").as("n"))
      .filter($"n" >= G)
    // synthesized flagged-window starts per doc: overlapping pair at the
    // front, one mid-doc, one at the last valid start; every third doc
    // gets NO windows (empty cov), every fifth doc gets dense coverage
    val withJs = toks.withColumn("js", expr(
      s"""CASE
         |  WHEN doc_id % 3 = 0 THEN CAST(array() AS array<int>)
         |  WHEN doc_id % 5 = 0 THEN transform(sequence(0, n - $G), i -> CAST(i AS INT))
         |  ELSE array(CAST(0 AS INT), CAST(3 AS INT),
         |             CAST((n - $G) DIV 2 AS INT), CAST(n - $G AS INT))
         |END""".stripMargin))
    val both = withJs
      .withColumn("cov_k",
        graft.functions.ScrubExpressions.coveredIdx($"js", G))
      .withColumn("cov_h", expr(s"array_sort(array_distinct(flatten(" +
        s"transform(js, j -> sequence(j, j + ${G - 1})))))"))
      .withColumn("kept_k",
        graft.functions.ScrubExpressions.scrubKept($"t", $"cov_k"))
      .withColumn("kept_h", concat_ws(" ", expr(
        """flatten(transform(
          |  filter(
          |    transform(sequence(0, size(cov_h)), k -> struct(
          |      CASE WHEN k = 0 THEN 0 ELSE cov_h[k - 1] + 1 END AS s,
          |      CASE WHEN k = size(cov_h) THEN n - 1 ELSE cov_h[k] - 1 END AS e)),
          |    g -> g.e >= g.s),
          |  g -> slice(t, g.s + 1, g.e - g.s + 1)))""".stripMargin)))
    val bad = both.filter($"cov_k" =!= $"cov_h" || $"kept_k" =!= $"kept_h")
      .select($"doc_id").collect()
    assert(bad.isEmpty, s"kernel/HOF divergence on docs ${bad.mkString(",")}")
    // full coverage must reconstruct to the empty string
    val full = both.filter($"doc_id" % 5 === 0 && $"doc_id" % 3 =!= 0)
      .filter($"n" >= G) // dense windows cover every index
      .select($"kept_k").limit(5).collect()
    full.foreach(r => assert(r.getString(0) == ""))
  }

  test("scrub_kept handles empty tokens and empty coverage") {
    import spark.implicits._
    graft.functions.ScrubExpressions.register(spark)
    val df = Seq(
      (1L, "\tlead tok three four five six seven eight nine ten"),
      (2L, "a b c d e f g h i j"),
    ).toDF("doc_id", "text")
      .select($"doc_id", split(trim($"text"), "\\s+").as("t"))
      .select($"doc_id", $"t", size($"t").as("n"))
      .withColumn("js", expr("array(CAST(1 AS INT))"))
    val got = df
      .withColumn("cov", graft.functions.ScrubExpressions.coveredIdx($"js", G))
      .withColumn("kept", graft.functions.ScrubExpressions.scrubKept($"t", $"cov"))
      .withColumn("kept_hof", concat_ws(" ", expr(
        """flatten(transform(
          |  filter(
          |    transform(sequence(0, size(cov)), k -> struct(
          |      CASE WHEN k = 0 THEN 0 ELSE cov[k - 1] + 1 END AS s,
          |      CASE WHEN k = size(cov) THEN n - 1 ELSE cov[k] - 1 END AS e)),
          |    g -> g.e >= g.s),
          |  g -> slice(t, g.s + 1, g.e - g.s + 1)))""".stripMargin)))
      .collect()
    got.foreach { r =>
      assert(r.getAs[String]("kept") == r.getAs[String]("kept_hof"),
        s"doc ${r.getLong(0)}")
    }
    // doc 1's tokens start with an EMPTY string (tab survives trim); the
    // kept text must preserve concat_ws's keep-empties-with-separator rule
    assert(got.find(_.getLong(0) == 1L).get.getAs[String]("kept").nonEmpty)
  }
}
