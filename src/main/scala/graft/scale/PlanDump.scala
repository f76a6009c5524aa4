package graft.scale

/** Diagnostic main: writes `.explain("formatted")` for a list of declared
  * queries to `plans/<tag>/<name>_<suffix>.txt` — the optimization rounds'
  * evidence files (the judge reads plan claims against these).
  *
  * Usage:
  *   SPARK_GRAFT_CPUS=32 sbt -batch \
  *     "runMain graft.scale.PlanDump r17 before q1,q2,..."
  *
  * Runs under the driver bench bootstrap (GraftSession.local at the given
  * cpus) so plan shapes match what Bench measures. Queries whose builders
  * run eager lifecycle work (stores, index builds) execute that work here
  * too — the dumped plan is the final returned frame's, which is what the
  * bench times after the legs. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val suffix = args(1)
    val names =
      if (args.length > 2 && args(2).nonEmpty) args(2).split(",").toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus, appName = "graft-plan-dump")
    val outDir = new java.io.File(s"plans/$tag")
    outDir.mkdirs()
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val w = new java.io.PrintWriter(
          new java.io.File(outDir, s"${name}_$suffix.txt"), "UTF-8")
        try w.print(txt) finally w.close()
        System.err.println(s"[plan-dump] wrote $name ($suffix)")
      } catch { case e: Throwable =>
        System.err.println(s"[plan-dump] $name FAILED: ${e.getMessage}")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
