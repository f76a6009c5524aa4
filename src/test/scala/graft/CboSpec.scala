package graft

import org.apache.spark.sql.functions._

/** Cost-based optimization: the "let Catalyst optimize" posture extends
  * to STATISTICS — a filtered dimension whose file size exceeds the
  * broadcast threshold still broadcasts once column stats tell the
  * optimizer the filter's true selectivity. On a 100 TB warehouse this
  * is the difference between ANALYZE TABLE being routine maintenance
  * and every filtered-dim join shuffling both sides.
  */
class CboSpec extends SparkTestBase {

  test("column stats flip a filtered-dim join from shuffle to broadcast") {
    import spark.implicits._
    val n = 400000
    spark.sql("DROP TABLE IF EXISTS cbo_dim")
    spark.sql("DROP TABLE IF EXISTS cbo_fact")
    // dim: file size safely above the broadcast threshold we set below;
    // the filter keeps only ~0.25% of it
    spark.range(n.toLong).select(col("id").as("k"),
        concat(lit("padpadpadpadpadpadpadpadpadpad-"), col("id")).as("pad"))
      .write.mode("overwrite").saveAsTable("cbo_dim")
    spark.range(200000L).select((col("id") % n).as("k"), col("id").as("v"))
      .write.mode("overwrite").saveAsTable("cbo_fact")

    try {
      withSessionConf(
        "spark.sql.autoBroadcastJoinThreshold" -> (256 * 1024).toString,
        "spark.sql.cbo.enabled" -> "false") {
        def planOf(): String = {
          val dim = spark.table("cbo_dim").filter(col("k") < 1000)
          val joined = spark.table("cbo_fact").join(dim, "k")
          joined.queryExecution.executedPlan.toString
        }

        val before = planOf()
        assert(before.contains("SortMergeJoin"),
          s"without stats the filtered dim should look too big to broadcast:\n${before.take(1200)}")

        spark.sql("ANALYZE TABLE cbo_dim COMPUTE STATISTICS FOR ALL COLUMNS")
        spark.sql("ANALYZE TABLE cbo_fact COMPUTE STATISTICS")
        spark.conf.set("spark.sql.cbo.enabled", "true")
        val after = planOf()
        assert(after.contains("BroadcastHashJoin"),
          s"with column stats the 0.25% filter estimate should broadcast:\n${after.take(1200)}")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS cbo_dim")
      spark.sql("DROP TABLE IF EXISTS cbo_fact")
    }
  }
}
