// Probe behind SCALE_PROBE_BUILDWARM_r13.json: is the ×50 layout_d4d
// build wall (57.96 s in SCALE_r13) a real plan asymmetry vs layout_d4b
// (18.6 s), or single-shot JVM-state noise? Alternates FORCED builds
// under a probe-private cache root; walls come from the Legs device.
//
//   GRAFT_ANN_CACHE_DIR=$(mktemp -d) /opt/spark/bin/spark-shell \
//     --master local[32] --driver-memory 64g \
//     --driver-class-path target/scala-2.13/classes \
//     -I tools/probe_layout_build_warm.scala
//
// Verdict (r13): both families converge to the SAME steady-state wall
// (15.36 vs 15.39 s at ×50); the single-shot rehearsal walls measure
// cold-JVM warm-up order, not the plan.
val base = "/root/testdata/sf0.1"
val dataRoot = sys.env.getOrElse("PROBE_DATA", "/root/repo/target/scaledata")
val n = 50
val dir = s"$dataRoot/x$n"
val marker = new java.io.File(s"$dir/_SCALE_DONE")
val spark2 = graft.GraftSession.local(32, appName = "probe-d4d")
if (!marker.exists()) {
  System.err.println(s"[probe] staging x$n under $dir")
  graft.scale.ScaleData.write(spark2, base, dir, n)
  marker.createNewFile()
}
def clearPersisted(): Unit = {
  spark2.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
  spark2.catalog.clearCache()
}
def buildOnce(kind: String): Double = {
  clearPersisted()
  graft.ops.Legs.drain()
  val t0 = System.nanoTime()
  kind match {
    case "d4b" => graft.dedup.Dedup.ngramJaccardBucketedAttach(spark2, dir).queryExecution.toRdd.count()
    case "d4d" => graft.dedup.Dedup.containmentBucketedAttach(spark2, dir).queryExecution.toRdd.count()
  }
  val total = (System.nanoTime() - t0) / 1e9
  val legs = graft.ops.Legs.drain()
  val b = legs.getOrElse(s"layout_$kind.build", -1.0)
  System.err.println(f"[probe] $kind build=$b%.2f s total=$total%.2f s legs=$legs")
  b
}
// interleave to decorrelate from JVM warm-up / GC debt
val order = Seq("d4b", "d4d", "d4b", "d4d", "d4b", "d4d")
val walls = order.map(k => k -> buildOnce(k))
System.err.println("[probe] RESULT " + walls.map { case (k, v) => f"$k:$v%.2f" }.mkString(" "))
spark2.stop()
sys.exit(0)
