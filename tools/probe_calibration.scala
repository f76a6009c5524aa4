// Probe behind CALIB_r16.json (r15 VERDICT finding 1 + next-round item 1;
// history: CALIB_r14 one-class, CALIB_r15 two-class): raw bench totals are
// comparable only within a session, so Bench publishes probe-normalized
// statistics. CALIB_r15 measured that the fixed probes do NOT move 1:1
// with their query class — the scan probe OVER-reacts to contention
// (probe 2.37x vs scan-class 1.86x under cpu_spin; 1.80x vs 1.35x under
// alloc_churn) and the shuffle probe UNDER-reacts (1.77x vs 1.91x;
// 1.27x vs 1.41x) — so the r15 normalized totals overshot (the
// builder/driver session pair's 9% raw gap read as ~21% normalized).
//
// The r16 correction, PRE-REGISTERED in graft.BenchCalib before this
// probe runs: dampen each class's denominator to probe_shift^lambda with
// lambda fitted on CALIB_r15's two induced states (equal-|log-residual|:
// lambda_scan = 0.633, lambda_shuffle = 1.226; in-sample residuals
// +7.8%/-7.2% scan, -5.0%/+5.3% shuffle). This probe VALIDATES the fit on
// FRESH sessions of the same two induced states and reports per-class
// residuals, undamped and damped — the claim is damped residuals <= 10%
// in both states. Class membership is the PINNED committed list
// (BenchCalib.shuffleClass — the same set Bench cites, r15 finding 2),
// so n_shuffle_class can no longer drift between the artifacts.
//
//  - cpu_spin: one busy-spin daemon per core (CPU steal — the r14 shift);
//  - alloc_churn: allocation-churn daemons forcing constant young-gen GC
//    (the off-CPU-stall anatomy the r14 in-regime probe measured in the
//    wild: task_gc_ms 2-4.7x at identical shuffle bytes).
//
//   /opt/spark/bin/spark-shell --master local[32] --driver-memory 16g \
//     --driver-class-path target/scala-2.13/classes \
//     -I tools/probe_calibration.scala
val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
val outFile = sys.env.getOrElse("SPARK_GRAFT_OUT", "CALIB_r16.json")
val spark2 = graft.GraftSession.local(32, appName = "probe-calibration")
val listener = new graft.scale.MetricsListener
spark2.sparkContext.addSparkListener(listener)

def clearPersisted(): Unit = {
  spark2.catalog.clearCache()
  spark2.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
  System.gc(); Thread.sleep(50)
}
// the two fixed probes, SAME shapes as Bench.calibScanOnce /
// calibShuffleOnce (keep in sync by hand — the probe demonstrates the
// published statistic, so the denominators must be the published ones)
def calibScanOnce(): Double = {
  import org.apache.spark.sql.functions._
  val t0 = System.nanoTime()
  spark2.read.parquet(s"$sfDir/lineitem.parquet")
    .groupBy("l_returnflag", "l_linestatus")
    .agg(sum("l_quantity"), avg("l_extendedprice"), count("*"))
    .orderBy("l_returnflag", "l_linestatus")
    .queryExecution.toRdd.count()
  val dt = (System.nanoTime() - t0) / 1e9
  clearPersisted()
  dt
}
def calibShuffleOnce(): Double = {
  import org.apache.spark.sql.functions._
  val t0 = System.nanoTime()
  val l = spark2.read.parquet(s"$sfDir/lineitem.parquet").select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
  val r = spark2.read.parquet(s"$sfDir/lineitem.parquet").select(col("l_orderkey"), col("l_suppkey"))
  l.repartition(64, col("l_orderkey")).hint("merge").join(r.repartition(64, col("l_orderkey")), "l_orderkey").groupBy(pmod(col("l_partkey"), lit(97)).as("g")).agg(sum(col("l_quantity") * col("l_suppkey")), count("*")).orderBy(col("g")).queryExecution.toRdd.count()
  val dt = (System.nanoTime() - t0) / 1e9
  clearPersisted()
  dt
}
// the FULL suite: the statistics are defined over the whole bench, so
// the demonstration measures exactly the published numbers (one caveat
// vs Bench proper: spark-shell's pre-existing session keeps its static
// confs, so the 10k codegen-class cache doesn't apply here and absolute
// walls sit ~30-45% above Bench's — irrelevant to the ratios, which
// compare states inside THIS session). NOTE: keep chained expressions
// single statements — the REPL's leading-dot continuation binds to the
// previous result, not the val.
val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
// class membership: the PINNED committed list — the same set Bench reads
val shuffleClass: Set[String] = graft.BenchCalib.shuffleClass
def medw(ws: Seq[Double]): Double = { val s = ws.sorted; if (s.length % 2 == 1) s(s.length / 2) else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0 }
def runState(label: String): (Map[String, Double], Double, Double) = {
  // same statistic as Bench: per-query median over 3 interleaved passes,
  // each calibration probe at the START and END of every pass (6 walls —
  // the r16 Bench sampling; the 3-wall medians were themselves the
  // dominant noise at near-idle states)
  val scans = scala.collection.mutable.ArrayBuffer.empty[Double]
  val shufs = scala.collection.mutable.ArrayBuffer.empty[Double]
  val passes = Vector.fill(3) {
    scans += calibScanOnce()
    shufs += calibShuffleOnce()
    val pass = qs.map { case (_, fn) =>
      val t0 = System.nanoTime()
      try fn(spark2, sfDir).queryExecution.toRdd.count()
      catch { case e: Throwable => System.err.println(s"[calib] $label: ${e.getMessage}") }
      val dt = (System.nanoTime() - t0) / 1e9
      clearPersisted()
      dt
    }
    scans += calibScanOnce()
    shufs += calibShuffleOnce()
    pass
  }
  val med = qs.zipWithIndex.map { case ((n, _), i) => n -> passes.map(_(i)).sorted.apply(1) }.toMap
  val cScan = medw(scans.toSeq)
  val cShuf = medw(shufs.toSeq)
  System.err.println(f"[calib] $label: total=${med.values.sum}%.2f s calib_scan=$cScan%.3f calib_shuffle=$cShuf%.3f")
  (med, cScan, cShuf)
}

// state A: the box as-is
val (medA, scanA, shufA) = runState("idle")

// state B: CPU contention — one busy-spin daemon per core steals ~half
// of every Spark task's cycles (the r14/r15 induced shift)
@volatile var loadOn = true
val spinners = (1 to Runtime.getRuntime.availableProcessors).map { i =>
  val t = new Thread(() => { var x = 0L; while (loadOn) { x += 1 }; () },
    s"calib-load-$i")
  t.setDaemon(true); t.start(); t
}
val (medB, scanB, shufB) = runState("cpu_spin")
loadOn = false
spinners.foreach(_.join(1000))
Thread.sleep(2000)

// state C: allocation churn — 8 daemons each cycling 1 MiB arrays
// through a small ring force constant young-gen collections on the heap
// Spark's tasks share (local mode = one JVM), modeling the measured
// in-the-wild drift (gc_ms 2-4.7x, cpu_ms ~flat). CPU steal is bounded
// (8 threads on 32 cores); the induced tax is GC/allocation stall.
@volatile var churnOn = true
val churners = (1 to 8).map { i =>
  val t = new Thread(() => {
    val ring = new Array[Array[Byte]](64)
    var j = 0
    while (churnOn) { ring(j % 64) = new Array[Byte](1 << 20); j += 1 }
  }, s"calib-churn-$i")
  t.setDaemon(true); t.start(); t
}
val (medC, scanC, shufC) = runState("alloc_churn")
churnOn = false
churners.foreach(_.join(1000))

val LS = graft.BenchCalib.LambdaScan
val LH = graft.BenchCalib.LambdaShuffle
def f3(d: Double) = f"$d%.3f"
case class St(total: Double, scanSec: Double, shufSec: Double, cScan: Double, cShuf: Double)
def mk(med: Map[String, Double], cScan: Double, cShuf: Double): St = {
  val total = med.values.sum
  val shufSec = med.collect { case (n, dt) if shuffleClass(n) => dt }.sum
  St(total, total - shufSec, shufSec, cScan, cShuf)
}
val A = mk(medA, scanA, shufA)
val B = mk(medB, scanB, shufB)
val C = mk(medC, scanC, shufC)
def stateJson(s: St): String =
  s"""{"total_sec": ${f3(s.total)}, "calib_sec": ${f3(s.cScan)}, "calib_shuffle_sec": ${f3(s.cShuf)}, "scan_class_sec": ${f3(s.scanSec)}, "shuffle_class_sec": ${f3(s.shufSec)}, "scan_class_per_calib": ${f3(s.scanSec / s.cScan)}, "shuffle_class_per_calib": ${f3(s.shufSec / s.cShuf)}, "total_per_calib": ${f3(s.total / s.cScan)}, "total_per_calib2": ${f3(s.scanSec / s.cScan + s.shufSec / s.cShuf)}}"""
def shiftJson(s: St): String = {
  val pScan = s.cScan / A.cScan   // fresh-session probe shift vs this run's idle
  val pShuf = s.cShuf / A.cShuf
  val clsScan = s.scanSec / A.scanSec
  val clsShuf = s.shufSec / A.shufSec
  val dampedTotal = (s.scanSec / math.pow(pScan, LS) + s.shufSec / math.pow(pShuf, LH)) / (A.scanSec + A.shufSec)
  s"""{"raw_total_shift": ${f3(s.total / A.total)}, "scan_probe_shift": ${f3(pScan)}, "shuffle_probe_shift": ${f3(pShuf)}, "scan_class_shift": ${f3(clsScan)}, "shuffle_class_shift": ${f3(clsShuf)}, "residual_scan_raw": ${f3(clsScan / pScan)}, "residual_shuffle_raw": ${f3(clsShuf / pShuf)}, "residual_scan_damped": ${f3(clsScan / math.pow(pScan, LS))}, "residual_shuffle_damped": ${f3(clsShuf / math.pow(pShuf, LH))}, "normalized_shift_one_class": ${f3((s.total / s.cScan) / (A.total / A.cScan))}, "normalized_shift_two_class": ${f3((s.scanSec / s.cScan + s.shufSec / s.cShuf) / (A.scanSec / A.cScan + A.shufSec / A.cShuf))}, "normalized_shift_damped": ${f3(dampedTotal)}}"""
}
val json = s"""{
  "note": "CALIB_r16: validates the PRE-REGISTERED dampening exponents (BenchCalib: lambda_scan=$LS, lambda_shuffle=$LH, fitted on CALIB_r15's two induced states) on FRESH sessions of the same states. Statistic = per-query median over 3 interleaved passes; probe walls = median-of-6 (start+end of each pass). Class membership = the PINNED committed list (bench_classes.tsv) — the same set Bench cites. Reading rule: residual_<class>_damped is the per-class residual after dampening (claim: <= 10% in both induced states); residual_<class>_raw shows the undamped overshoot for comparison; normalized_shift_damped is the headline total statistic (Bench's total_sec_adj) under the induced state. Induced states: cpu_spin = one busy-spin thread per core (CPU steal), alloc_churn = 8 allocation-churn threads (constant young-gen GC on the shared heap — the off-CPU-stall signature measured in the wild).",
  "queries": ${qs.length},
  "n_shuffle_class": ${shuffleClass.size},
  "lambda_scan": $LS,
  "lambda_shuffle": $LH,
  "sf": "$sfDir",
  "idle": ${stateJson(A)},
  "cpu_spin": ${stateJson(B)},
  "alloc_churn": ${stateJson(C)},
  "shifts_vs_idle": {
    "cpu_spin": ${shiftJson(B)},
    "alloc_churn": ${shiftJson(C)}
  }
}
"""
// explicit UTF-8: the default-charset PrintWriter mangles any non-ASCII
// in the note to '?' under a POSIX locale
val w = new java.io.PrintWriter(outFile, "UTF-8")
try w.write(json) finally w.close()
def resid(s: St) = {
  val pScan = s.cScan / A.cScan; val pShuf = s.cShuf / A.cShuf
  (f"${(s.scanSec / A.scanSec) / math.pow(pScan, LS)}%.3f", f"${(s.shufSec / A.shufSec) / math.pow(pShuf, LH)}%.3f")
}
System.err.println(s"[calib] wrote $outFile  cpu_spin damped(scan,shuf)=${resid(B)}  alloc_churn damped=${resid(C)}")
spark2.stop()
sys.exit(0)
