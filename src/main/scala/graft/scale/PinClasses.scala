package graft.scale

/** Derives the PINNED shuffle-class membership for the bench's two-class
  * statistic (r15 VERDICT finding 2): one idle pass over the full suite,
  * each query's task byte pair snapshotted, class = `Bench.shuffleHeavy`
  * (shuffle_write_bytes > input_bytes). Output is the committed
  * `src/main/resources/graft/bench_classes.tsv`, read by Bench and by
  * tools/probe_calibration.scala so both artifacts cite the SAME
  * membership.
  *
  * MUST run under the driver bench's exact session bootstrap —
  * `GraftSession.local` at SPARK_GRAFT_CPUS=32 — because the byte pairs
  * are conf-dependent: `local()` sets shuffle partitions = cpus, and
  * per-partition framing overhead moves small queries' shuffle bytes
  * (the first r16 pin ran inside spark-shell, whose pre-existing session
  * keeps ITS conf, and 8 of 184 tiny-byte queries flipped against the
  * bench's own measurement). That conf-dependence is also why the bytes
  * are a PLAN property worth pinning: under ONE bootstrap they reproduce
  * bit-for-bit; across bootstraps they are not comparable at all.
  *
  * Re-run ONLY when a query is added/removed or its plan changes shape —
  * BenchCalibSpec fails until the file matches SparkEntry.queries:
  *
  *   SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.scale.PinClasses"
  */
object PinClasses {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outFile = sys.env.getOrElse("SPARK_GRAFT_OUT",
      "src/main/resources/graft/bench_classes.tsv")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus, appName = "graft-pin-classes")
    val listener = new MetricsListener
    spark.sparkContext.addSparkListener(listener)

    def clearPersisted(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc(); Thread.sleep(50)
    }

    // warm-up: codegen + classloading, as Bench does
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().queryExecution.toRdd.count()
    } catch { case _: Throwable => () }
    clearPersisted()

    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
    // r16 ADVICE: a query whose execution throws must ABORT the pin, not
    // silently commit a (0, 0) byte pair classified 'scan' — a transient
    // error during regeneration would otherwise pin a wrong class that
    // BenchCalibSpec's byte-pair consistency check cannot catch (0 > 0 is
    // self-consistent).
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val rows = qs.map { case (name, fn) =>
      listener.reset()
      graft.ops.Legs.drain()
      try { fn(spark, sfDir).queryExecution.toRdd.count(); () }
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[pin] $name FAILED: ${e.getMessage}")
      }
      MetricsListener.drainBus(spark)
      val m = listener.snapshot
      clearPersisted()
      val sw = m.getOrElse("shuffle_write_bytes", 0L)
      val ib = m.getOrElse("input_bytes", 0L)
      val cls = if (graft.Bench.shuffleHeavy(m)) "shuffle" else "scan"
      System.err.println(f"[pin] $name%-28s $cls%-8s shufW=$sw%12d input=$ib%12d")
      s"$name\t$cls\t$sw\t$ib"
    }
    if (failed.nonEmpty) {
      System.err.println(s"[pin] ABORTED — ${failed.length} queries failed " +
        s"(${failed.mkString(", ")}); $outFile NOT written")
      spark.stop()
      sys.exit(1)
    }
    val header = Seq(
      "# PINNED bench class membership (r15 VERDICT finding 2).",
      "# Derived by graft.scale.PinClasses: one idle pass under the driver",
      s"# bench bootstrap (GraftSession.local, cpus=$cpus, sf_dir=$sfDir);",
      "# class = shuffle iff shuffle_write_bytes > input_bytes.",
      "# columns: query<TAB>class<TAB>shuffle_write_bytes<TAB>input_bytes",
      "# Byte pairs committed so a session whose measured bytes disagree is",
      "# DETECTABLE (Bench publishes class_flips) without moving the statistic.")
    val w = new java.io.PrintWriter(outFile, "UTF-8")
    try { header.foreach(w.println); rows.foreach(w.println) } finally w.close()
    System.err.println(s"[pin] wrote $outFile (${rows.length} queries, " +
      s"${rows.count(_.contains("\tshuffle\t"))} shuffle-class)")
    spark.stop()
  }
}
