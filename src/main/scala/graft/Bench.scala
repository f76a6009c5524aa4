package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus.toInt, appName = "graft-bench")

    // Free any cached/persisted intermediates a query left behind (the
    // dedup family persists its shingle table) so run 2 measures the same
    // work as run 1 and 82 executions don't accumulate storage memory.
    def clearPersisted(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      // Quiesce between queries: with 100+ queries in one JVM, GC debt
      // from query N lands in query N+1's wall time and reads as a
      // phantom regression (r5 adjudicated 8 such). An explicit GC +
      // short settle makes each measurement start from the same heap.
      System.gc()
      Thread.sleep(50)
    }

    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Map[String, Double]) = {
      graft.ops.Legs.drain() // clear any leftover from a failed prior run
      val t0 = System.nanoTime()
      // toRdd.count() executes the FULL physical plan (a plain .count()
      // lets the optimizer drop final sorts and projections)
      try { fn(spark, sfDir).queryExecution.toRdd.count() }
      catch { case e: Throwable =>
        System.err.println(s"[bench] failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      clearPersisted()
      (dt, graft.ops.Legs.drain())
    }

    // JVM/codegen warm-up: one untimed scan+agg so the first timed query
    // doesn't book classloading + codegen compiler start-up (~6 s in r01).
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().queryExecution.toRdd.count()
    } catch { case _: Throwable => () }

    // MEDIAN-of-3 per query (r13 — the r12 verdict's headline item):
    // best-of-3 tracked the machine's fast tail, so two runs of ONE tree
    // could disagree by ~15% on the total — more than any claimed
    // round-over-round effect, making bench deltas unfalsifiable. The
    // per-query median discards the one-off stall AND the one-off lucky
    // run; the probes adopted the same statistic in r12 and reproduce
    // across independent runs. Each run also drains any per-leg wall
    // times the lifecycle queries recorded (graft.ops.Legs); the
    // published legs are the MEDIAN run's (same statistic as the total,
    // so legs + lazy-serve remainder stay internally consistent).
    //
    // The three repeats run as INTERLEAVED WHOLE-SUITE PASSES, not
    // back-to-back: a transient machine stall (page-cache eviction,
    // background compaction, a neighboring process) spans seconds, so
    // back-to-back repeats of one query all land inside it and the
    // median keeps the stall — measured as the ±14% per-query wobble
    // between two consecutive back-to-back-median runs of one tree.
    // With passes, the same stall hits each query in at most ONE pass,
    // and its other two runs vote it down. Per-query lifecycle
    // semantics are order-free (each query stages its own state and
    // clearPersisted() runs after every execution), and pass 1 doubles
    // as the global warm-up the per-query cold run used to absorb.
    // Machine-state calibration probe (r13 VERDICT item 1): the ≤2.3%
    // consecutive-run band is a WITHIN-SESSION band — the same tree
    // measured 14% apart across sessions (161.5 s committed vs the
    // driver's 138.5 s), all machine state. This fixed probe — a
    // scan + hash-agg + sort over lineitem, the suite's dominant cost
    // shape — runs once per pass; its median wall is published as
    // `calib_sec`, and `total_per_calib` (= total / calib_sec) is the
    // statistic that survives a machine-state change: both numerator
    // and denominator carry the same state multiplier
    // (tools/probe_calibration.scala, CALIB_r14.json: under a busy-spin
    // thread per core the full-suite raw total shifts 2.18x while the
    // ratio shifts 14.3% — an ~8x reduction in state sensitivity).
    // Cross-session comparisons must use the ratio or touched-cell
    // medians/legs, never raw totals.
    def calibOnce(): Double = {
      val t0 = System.nanoTime()
      try {
        spark.read.parquet(s"$sfDir/lineitem.parquet")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(org.apache.spark.sql.functions.sum("l_quantity"),
               org.apache.spark.sql.functions.avg("l_extendedprice"),
               org.apache.spark.sql.functions.count("*"))
          .orderBy("l_returnflag", "l_linestatus")
          .queryExecution.toRdd.count()
      } catch { case _: Throwable => () }
      val dt = (System.nanoTime() - t0) / 1e9
      clearPersisted()
      dt
    }
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
    val calibWalls = scala.collection.mutable.ArrayBuffer.empty[Double]
    val passes = Vector.fill(3) {
      calibWalls += calibOnce()
      qs.map { case (_, fn) => runOnce(fn) }
    }
    val calib = calibWalls.sorted.apply(calibWalls.length / 2)
    val runs = qs.zipWithIndex.map { case ((name, _), i) =>
      name -> passes.map(_(i)).sortBy(_._1).apply(1)
    }
    val results = runs.map { case (n, (dt, _)) => n -> dt }.toMap
    // serve_overhead legs (the per-call lock/DDL/sweep segment of the
    // bucketed serve path) are recorded by EVERY query that serves a
    // layout; publishing them under the bare layout key would collide
    // across queries. Keep them for the bucketed attach cells — the
    // attribution target (r13 VERDICT item 3) — prefixed by the query,
    // and drop the rest (their per-cell split lives in SCALE's legs).
    val legs: Map[String, Double] = runs.flatMap { case (qname, (_, ls)) =>
      ls.flatMap { case (k, v) =>
        if (!k.endsWith(".serve_overhead")) Some(k -> v)
        else if (qname.contains("_bucketed")) Some(s"$qname.$k" -> v)
        else None
      }
    }.toMap
    // The driver captures only the LAST ~2 KB of stdout; a name-keyed map
    // over 160+ queries can NEVER fit (names alone ≈ 3.3 KB — r07 and r08
    // both recorded "parsed": null). So the printed line is SHORT — total
    // + query count + a pointer to the committed file, with the file's md5
    // tying the two together — and the full-precision per-query map lives
    // only in BENCH.json.
    def fmt(v: Double, digits: Int) = BigDecimal(v)
      .setScale(digits, BigDecimal.RoundingMode.HALF_UP).toString
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    val calibJson = s""""calib_sec":${fmt(calib, 3)},"calib_walls":[${
      calibWalls.map(fmt(_, 3)).mkString(",")}],"total_per_calib":${
      fmt(if (calib > 0) total / calib else 0.0, 1)},"""
    val full = s"""{"metric":"total","value":$total,"unit":"sec",$calibJson"queries":${
      results.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    },"legs":${
      legs.toSeq.sortBy(_._1).map { case (k, v) => s"\"" + k + "\":" + fmt(v, 3) }
        .mkString("{", ",", "}")
    },"sf":"$sfDir"}"""
    val bytes = (full + "\n").getBytes("UTF-8")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile), bytes)
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString
    // the lifecycle per-leg walls ride the SHORT line too: ~11 keys,
    // well inside the driver's stdout capture, and the round ledger
    // then carries them without dereferencing the committed file
    val legsShort = legs.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + fmt(v, 2) }.mkString("{", ",", "}")
    val json = s"""{"metric":"total","value":${fmt(total, 3)},"unit":"sec",""" +
      s""""n_queries":${results.size},$calibJson"file":"$outFile","md5":"$md5",""" +
      s""""legs":$legsShort,"sf":"$sfDir"}"""
    spark.stop()
    // print LAST, after spark.stop(), so no executor-shutdown log lands
    // between the JSON and the end of this JVM's output
    println(json)
  }
}
