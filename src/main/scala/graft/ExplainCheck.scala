package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: prints whether the extension-installed session's
  * optimizer actually rewrites the window-top-k oracle queries
  * (one line per query: name, fired yes/no). Used to confirm the
  * GraftExtensions → RewriteWindowTopK path end-to-end, the same wiring
  * the driver's Verify/Bench sessions get. */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- Seq("w_topk_per_group", "t_top_ngrams", "s_ann_topk", "w_last_per_group",
        "t_stratified_sample", "t_training_mix", "a_mode_per_user",
        "t_domain_cap")) {
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.optimizedPlan.toString
      val fired = plan.contains("collect_top_k") || plan.contains("graft_top_k_ordered")
      println(s"[explain-check] $name rewriteWindowTopK fired=$fired")
      if (!fired) println(plan.linesIterator.map("[plan] " + _).mkString("\n"))
    }
    spark.stop()
  }
}
