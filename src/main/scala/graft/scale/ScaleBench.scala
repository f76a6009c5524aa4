package graft.scale

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.util.concurrent.atomic.AtomicLong

/** Per-task metric accumulation across whole queries: wall time alone
  * can't distinguish "the algorithm stayed linear" from "the box got
  * lucky"; shuffle bytes/records and input bytes are the scale-invariant
  * evidence. Registered once, snapshotted around each measured query. */
final class MetricsListener extends SparkListener {
  val shuffleReadB, shuffleWriteB, shuffleWriteRec, inputB, spillB, peakMem,
    runTimeMs, cpuTimeNs, gcTimeMs = new AtomicLong(0)
  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) {
      shuffleReadB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      shuffleWriteB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      shuffleWriteRec.addAndGet(m.shuffleWriteMetrics.recordsWritten)
      inputB.addAndGet(m.inputMetrics.bytesRead)
      spillB.addAndGet(m.diskBytesSpilled)
      peakMem.updateAndGet(p => math.max(p, m.peakExecutionMemory))
      // wall-attribution trio (r11 VERDICT item 2): summed task run time
      // vs cpu time vs GC time separates "the plan did more work" from
      // "the JVM was digesting another cell's garbage" — the ×50
      // containment-vs-gram wall gap could not be convicted without it
      runTimeMs.addAndGet(m.executorRunTime)
      cpuTimeNs.addAndGet(m.executorCpuTime)
      gcTimeMs.addAndGet(m.jvmGCTime)
    }
  }
  def snapshot: Map[String, Long] = Map(
    "shuffle_read_bytes" -> shuffleReadB.get,
    "shuffle_write_bytes" -> shuffleWriteB.get,
    "shuffle_write_records" -> shuffleWriteRec.get,
    "input_bytes" -> inputB.get,
    "disk_spill_bytes" -> spillB.get,
    "peak_task_memory" -> peakMem.get,
    "task_run_ms" -> runTimeMs.get,
    "task_cpu_ms" -> cpuTimeNs.get / 1000000L,
    "task_gc_ms" -> gcTimeMs.get)
  def reset(): Unit =
    Seq(shuffleReadB, shuffleWriteB, shuffleWriteRec, inputB, spillB, peakMem,
      runTimeMs, cpuTimeNs, gcTimeMs).foreach(_.set(0))
}

object MetricsListener {
  /** Drain the async listener bus so a metrics snapshot sees every task
    * of the query that just ran. `listenerBus` is `private[spark]` at the
    * source level but public in bytecode — reflection reaches it; if the
    * internals ever move, a half-second settle keeps the numbers sane.
    * Shared by every main that snapshots task metrics (Bench for the
    * two-class calibration split, ScaleBench/SeasonScaleBench for cells). */
  def drainBus(spark: SparkSession): Unit =
    try {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      ()
    } catch { case _: Throwable => Thread.sleep(500) }
}

/** The scale rehearsal: measure the 100-TB design claims instead of
  * arguing them (VERDICT r4 "Next round" item 1).
  *
  * Generates ×10 and ×50 corpora from sf0.1 (= sf1 / sf5 row counts) via
  * [[ScaleData]], runs the dedup / ANN / pipeline / relational headline
  * family at ×1, ×10, ×50 with the xxhash64 production twins, and writes
  * `SCALE_r5.json`: per query per scale — wall seconds, output rows, and
  * task-metric totals (shuffle read/write bytes + records, input bytes,
  * spill, peak task memory) — plus the growth ratios that back each
  * claim:
  *
  *  - band join never goes all-pairs: `candidate_pairs` from the minhash
  *    band join vs the n²/2 it replaced;
  *  - df-capped postings bound n-gram candidates: `d_ngram_jaccard`
  *    shuffle records grow ~linearly;
  *  - broadcast thresholds hold: ANN query/centroid/LUT sides stay
  *    broadcast (no growth in shuffle on the corpus side beyond linear);
  *  - union-find/propagation crossover: `d_dup_clusters_dist` forces the
  *    distributed min-label path on the same corpus and must produce the
  *    same cluster count as the driver fast path;
  *  - overall ~linear wall-time growth for every measured query.
  *
  * Runs standalone: `sbt "runMain graft.scale.ScaleBench"` (env:
  * SPARK_GRAFT_SCALES=1,10,50 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_OUT=...).
  */
object ScaleBench {

  private def jnum(d: Double): String =
    if (d.isNaN || d.isInfinite) "null" else f"$d%.3f"

  /** JSON string escaping incl. control chars (r15 ADVICE: Spark
    * exception messages carry newlines, which the quote/backslash-only
    * escaping let straight into the calib_error field — corrupting the
    * artifact exactly when the fail-loudly path fires). */
  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Diagnostic CONTROL cells: alternate shapes measured for comparison
    * against a standard cell (the `_slim` pair experiment moves gs_b
    * instead of gs_a; `d_dup_clusters_dist` forces the distributed
    * min-label path the driver fast path would never take at this size).
    * They are excluded from the "every growth ratio below ideal" claim —
    * their ×1 walls are sub-second, so the ratio divides by noise
    * (SCALE_r15's only over-ideal cell was a slim control at 52.3 vs
    * ideal 50 with a 0.29 s base wall) — and flagged in the artifact so
    * the exclusion is readable, not tribal knowledge (r15 VERDICT
    * finding / next-round item 5). */
  val ControlCells: Set[String] = Set(
    "d_ngram_bucketed_slim", "d_containment_bucketed_slim",
    "d_dup_clusters_dist")

  /** NaN-safe median that AVERAGES the middle pair on even counts: the
    * upper-middle pick biased 2-sample "medians" high whenever one pass
    * of a 3-pass family failed (r14 ADVICE). NaN entries (failed probe
    * walls) are excluded rather than sorted to an end. */
  private def med(ws: Seq[Double]): Double = {
    val ok = ws.filterNot(d => d.isNaN || d.isInfinite).sorted
    if (ok.isEmpty) Double.NaN
    else if (ok.length % 2 == 1) ok(ok.length / 2)
    else (ok(ok.length / 2 - 1) + ok(ok.length / 2)) / 2.0
  }

  private def drainListenerBus(spark: SparkSession): Unit =
    MetricsListener.drainBus(spark)

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "1,10,50")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val outFile = sys.env.getOrElse("SPARK_GRAFT_OUT", "SCALE_r6.json")
    val dataRoot = sys.env.getOrElse("SPARK_GRAFT_SCALE_DATA", "target/scaledata")

    val spark = graft.GraftSession.local(cpus, appName = "graft-scale")
    val listener = new MetricsListener
    spark.sparkContext.addSparkListener(listener)

    // ---- corpora ----------------------------------------------------
    val dirs: Map[Int, String] = scales.map { n =>
      if (n == 1) n -> baseDir
      else {
        val d = s"$dataRoot/x$n"
        val marker = new java.io.File(s"$d/_SCALE_DONE")
        if (!marker.exists()) {
          System.err.println(s"[scale] generating x$n corpus under $d")
          ScaleData.write(spark, baseDir, d, n)
          marker.createNewFile()
        }
        n -> d
      }
    }.toMap

    // bucket count for the bucketed-attach twins: the LIBRARY's derived
    // count (-1 → bucketsForCorpus: 64 MB of source text per bucket,
    // parallelism floor). r12: the rehearsal previously pinned its own
    // 8×scale here, which now DIFFERS from what the default entries
    // derive — and with the bucket count folded into the layout
    // fingerprint (the r11 ADVICE fix), a twin cell and a default-entry
    // consumer cell alternating counts would rebuild the shared layout
    // inside TIMED cells, ping-ponging generations. Measuring the count
    // production actually serves is also simply the honest cell.
    // SPARK_GRAFT_NBUCKETS pins an explicit count FOR PROBES ONLY — the
    // r13 clamp-regime cell: past the 200k-bucket clamp (~13 TB of
    // text) per-bucket slices grow linearly with the corpus, and the
    // documented claim is that the SMJ sorts spill gracefully instead
    // of OOMing. A deliberately tiny pinned count + small heap emulates
    // that regime at probe scale. Never pin in the standard rehearsal:
    // the count is folded into the layout fingerprint, so a pinned
    // probe rebuilds the shared entry (point GRAFT_ANN_CACHE_DIR at a
    // probe-private root), and a count differing from the derived one
    // also measures the wrong compression regime (the r12 `_nb8x`
    // lesson).
    def bucketsFor(d: String): Int =
      sys.env.get("SPARK_GRAFT_NBUCKETS").map(_.toInt).getOrElse(-1)

    // ---- measured queries -------------------------------------------
    // Production twins (xxhash64) for the dedup family; oracle-identity
    // md5 forms are deliberately NOT the scale path and are not measured
    // here. d_dup_clusters_dist = same corpus, crossover forced to the
    // distributed min-label propagation (maxEdges=0).
    val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "d_minhash_lsh_fast" -> (graft.dedup.Dedup.minhashLshFast _),
      "d_minhash_capped" -> ((s: SparkSession, d: String) =>
        graft.dedup.Dedup.minhashLshCapped(s, d, maxBucket = 256)),
      "d_lsh_jaccard_fast" -> (graft.dedup.Dedup.lshJaccardFast _),
      "d_lsh_jaccard_capped" -> ((s: SparkSession, d: String) =>
        graft.dedup.Dedup.lshJaccardCapped(s, d, maxBucket = 256)),
      "d_lsh_dup_pairs" -> ((s: SparkSession, d: String) =>
        graft.dedup.Dedup.lshJaccardFast(s, d)
          .filter(org.apache.spark.sql.functions.col("is_dup") === 1)),
      // r11: the DEFAULT d_ngram_jaccard entry serves the bucketed
      // layout, so this cell (the r10 "d_ngram_jaccard" measurement)
      // is now the explicitly-named INLINE CONTROL — the layout-free
      // attach whose regime behavior motivated the default change
      "d_ngram_inline" -> (graft.dedup.Dedup.ngramJaccardInline _),
      // r10: the rehearsal leads with the PRODUCTION simhash — the
      // 56-bit wide form. The 32-bit variant stays oracle-gated at
      // sf-scale (SparkEntry) but is not a scale path: its ×50 cell
      // spent 84 s mostly materializing the measured 6.4% cross-copy
      // false pairs (SCALE_r9), which rehearses a configuration no
      // 100 TB deployment would run. Its FP floor is still measured
      // below (cross-copy census, bounded to ×10).
      "d_simhash_wide" -> (graft.dedup.Dedup.simhashDupWide _),
      "d_embedding_dup" -> (graft.similarity.Ann.embeddingDup _),
      "d_embedding_capped" -> ((s: SparkSession, d: String) =>
        graft.similarity.Ann.embeddingDupCapped(s, d)),
      "d_embedding_scaled" -> ((s: SparkSession, d: String) =>
        graft.similarity.Ann.embeddingDupScaled(s, d)),
      // SemDeDup scale form: LSH cells (planes grow with log n) keep the
      // within-cell pairwise term at occupancy², assignment map-only
      "d_semantic_scaled" -> ((s: SparkSession, d: String) =>
        graft.similarity.Ann.semanticDedupScaled(s, d)),
      "d_decontaminate" -> (graft.dedup.Dedup.decontaminate _),
      "d_dup_clusters_fast" -> ((s: SparkSession, d: String) =>
        graft.dedup.Dedup.dupClustersFast(s, d)),
      "d_dup_clusters_dist" -> ((s: SparkSession, d: String) =>
        graft.dedup.Dedup.dupClustersFast(s, d, maxEdges = 0L)),
      "s_ann_topk" -> ((s: SparkSession, d: String) =>
        graft.similarity.Ann.bruteForceTopK(s, d)),
      "s_ivf_topk" -> (graft.similarity.Ann.ivfTopK _),
      "s_pq_topk" -> (graft.similarity.Ann.pqTopK _),
      // persisted-index serve path: indexes are pre-built untimed below,
      // so these cells measure QUERY-ONLY latency growth with corpus size
      "s_ivf_topk_indexed" -> (graft.similarity.Ann.ivfTopKCached _),
      // incremental index maintenance: build on 2/3, fold 1/3 in, serve —
      // the upsert leg must track the BATCH + touched cells, so total
      // growth stays bounded by the build leg's corpus scan
      "s_ivf_upsert" -> (graft.similarity.Ann.ivfUpsertServe _),
      "s_pq_topk_indexed" -> (graft.similarity.Ann.pqTopKCached _),
      "t_pipeline_audit" -> (graft.pipelines.TrainingPipeline.pipelineAudit _),
      // cross-batch admission: per-batch cost must track the BATCH (probe
      // partition-pruned, store side map-only), so the three-batch total
      // should grow ~linearly with the corpus like the one-shot band join
      "d_incremental_admit_fast" -> ((s: SparkSession, d: String) =>
        graft.dedup.IncrementalDedup.incrementalAdmitFast(s, d)),
      // PII audit: pure map-side scan + tiny per-source aggregate — the
      // strictest linear-growth case in the suite
      "t_pii_redact" -> (graft.ops.TextOps.piiRedact _),
      "t_span_scrub" -> (graft.ops.TextOps.spanScrub _),
      // hot-gram guard: the replicated scale corpus drives every
      // duplicated gram's df past ScrubHotDf, so the broadcast path
      // carries the bulk of the windows — the mega-hot skew case measured
      // against the plain shuffle form above (outputs bit-identical)
      "t_span_scrub_guarded" -> (graft.ops.TextOps.spanScrubGuarded _),
      // eval side stays fixed-size while the corpus grows: probe must
      // scale linearly with ZERO corpus-keyed shuffle before the cov agg
      "t_decontam_scrub" -> (graft.ops.TextOps.decontamScrub _),
      // training runs on the 10% sample (dictionary-sized rounds), encode
      // is map-only: wall growth must track the corpus scan, not training
      "t_bpe_encode" -> (graft.ops.Bpe.bpeEncode _),
      "q1_pricing_summary" -> (graft.ops.Relational.q1PricingSummary _),
      "q3_top_orders" -> (graft.ops.Relational.q3TopOrders _),
      "q18_big_orders" -> (graft.ops.Relational.q18BigOrders _),
      "e_daily_rollup" -> (graft.ops.Events.dailyRollup _),
      // round-5 additions: the map-only family must scale exactly
      // linearly; scd2 is one exchange; the KMV cross stays G²-sized no
      // matter the corpus (the point of the sketch)
      "t_chunk_docs" -> (graft.ops.TextOps.chunkDocs _),
      "t_doc_keywords" -> (graft.ops.TextOps.docKeywords _),
      "t_quality_classifier" -> (graft.ops.TextOps.qualityClassifier _),
      "w_scd2_intervals" -> (graft.ops.Windows.scd2Intervals _),
      // round-7 additions: ewma/attribution are one user_id exchange over
      // a corpus that grows by USERS (series length fixed — no window
      // frame ever grows); merge is one full-outer join whose source side
      // stays customer-keyed while order counts grow ×N inside the agg
      "w_ewma" -> (graft.ops.Windows.ewma _),
      "e_attribution" -> (graft.ops.Events.attribution _),
      "s_merge_upsert" -> (graft.ops.Merge.mergeUpsert _),
      "a_kmv_overlap" -> ((s: SparkSession, d: String) =>
        graft.ops.Sketches.kmvUserOverlap(s, d)),
      "s_zorder_key" -> (graft.ops.ZOrder.zKeyQuery _),
      // round-7 batch 2: DSIR's model stays B buckets at every corpus
      // size (the broadcast never grows); shard assignment is map-only
      // plus one shard-keyed exchange; BM25's posting join grows with
      // postings while the query side is constant; RRF fuses two
      // bounded-k lists so fusion cost is flat in corpus size
      "t_dsir_weights" -> (graft.ops.DataSelection.dsirWeights _),
      "t_shard_shuffle" -> (graft.ops.DataSelection.shardShuffle _),
      "s_bm25_topk" -> (graft.similarity.Retrieval.bm25TopK _),
      "s_bm25_topk_indexed" -> (graft.similarity.Retrieval.bm25TopKCached _),
      "s_hybrid_rrf" -> (graft.similarity.Retrieval.hybridRrf _),
      // containment rides the same rare-gram posting join as the ngram
      // family (pair count bounded by the df cap) — measured separately
      // because the planted excerpts change the df profile. This is the
      // INLINE control (= the r10 "d_containment" cell; the default
      // entry now serves the bucketed layout, measured below)
      "d_containment_inline" -> (graft.dedup.Dedup.containmentInline _),
      // r10: the bucketed-attach twins — the production layout for the
      // gram family's verify attach. The r10 probe showed WHY they are
      // the only honest shape: at ×50 the inline jaccard attach survives
      // on a stats-underestimated BROADCAST of the corpus-sized gram
      // array table (complex-type size estimation lowballs arrays — a
      // per-executor OOM at real scale), while inline containment's
      // union-defeated estimate flips to SMJ and re-exchanges the wide
      // arrays three times (the measured 680× shuffle bend). Bucketed:
      // arrays move ONCE (pair intermediate onto the doc_b layout), and
      // the tables are PRE-BUILT untimed (the ANN *_indexed precedent —
      // the one-time write amortizes across every pass sharing the
      // layout) with the bucket count scaled to the corpus (a fixed 8
      // caps write+SMJ parallelism at 8 tasks, the D7e fixed-bucket
      // mistake in layout form)
      // r11: these ARE the default d_ngram_jaccard / d_containment serve
      // paths now (SparkEntry routes them through the bucketed attach
      // with reuse=true); bytes-per-pair for the doc_b exchange =
      // shuffle_write_bytes / rows of these cells
      "d_ngram_bucketed" -> ((s: SparkSession, d: String) =>
        graft.dedup.Dedup.ngramJaccardBucketedAttach(
          s, d, nBuckets = bucketsFor(d), reuse = true)),
      "d_containment_bucketed" -> ((s: SparkSession, d: String) =>
        graft.dedup.Dedup.containmentBucketedAttach(
          s, d, nBuckets = bucketsFor(d), reuse = true)),
      // the slim-pair experiment (VERDICT r10 item 2): bare pairs to the
      // doc_b layout first, arrays ride the exchange BACK — measures
      // whether the one array pass can be avoided (it moves gs_b instead
      // of gs_a, so on the copy corpus the volume answer is "no"; the
      // cell makes that measured, not argued)
      "d_ngram_bucketed_slim" -> ((s: SparkSession, d: String) =>
        graft.dedup.Dedup.ngramJaccardBucketedSlim(
          s, d, nBuckets = bucketsFor(d), reuse = true)),
      "d_containment_bucketed_slim" -> ((s: SparkSession, d: String) =>
        graft.dedup.Dedup.containmentBucketedSlim(
          s, d, nBuckets = bucketsFor(d), reuse = true)),
      "d_lsh_bucketed" -> ((s: SparkSession, d: String) =>
        graft.dedup.Dedup.lshJaccardBucketedAttach(
          s, d, nBuckets = bucketsFor(d), reuse = true)),
      // r10: ExactSubstr self-dedup — one combinable aggregate + one
      // equi-join over the window fan-out, then the in-row reconstruct;
      // must track the linear t_span_scrub family. The incremental form's
      // per-batch probe is partition-selective on the window-owner store,
      // so its three-batch total should also stay ~linear
      "t_selfdedup_scrub" -> (graft.ops.TextOps.selfDedupScrub _),
      "t_selfdedup_guarded" -> (graft.ops.TextOps.selfDedupScrubGuarded _),
      "t_selfdedup_incremental" -> (graft.ops.TextOps.selfDedupIncremental _),
      // r10: group-cohesive split — one narrow combinable agg + one
      // narrow join-back; the strict-linear class
      "t_leakage_split" -> (graft.ops.DataSelection.leakageSplit _),
      // r8: the persisted rare-gram index lifecycle (build 2/3 + upsert
      // 1/3 + serve) must track the one-shot d_ngram_jaccard above —
      // the upsert leg's probe is key-filtered, and the serve tail is
      // the identical candidate+verify join
      "d_ngram_incremental" -> (graft.dedup.NgramIndex.incrementalServe _),
      // r9: the curriculum pair — the inline form global-sorts the
      // narrow rank table through one ntile window (single-partition at
      // any size), the scaled form replaces it with a bounded q-histogram
      // + map-side cut-point compare; identical output (the unmodified
      // inline SQL gates it), so the growth gap IS the global sort's cost
      "t_curriculum_order" -> (graft.ops.DataSelection.curriculumOrder _),
      "t_curriculum_scaled" -> (graft.ops.DataSelection.curriculumOrderScaled _))

    def clearPersisted(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      // same quiesce as Bench: ~90 measured queries share this JVM and the
      // x50 cells run LAST — without it they inherit the whole run's GC
      // debt and the growth ratios read systematically worse than reality
      System.gc()
      Thread.sleep(50)
    }

    // warm-up (codegen/classloading, as Bench does)
    try {
      spark.read.parquet(s"$baseDir/lineitem.parquet")
        .groupBy("l_returnflag").count().queryExecution.toRdd.count()
    } catch { case _: Throwable => () }

    // machine-state calibration (r14 — Bench's calib_sec device): the
    // fixed scan+hash-agg+sort probe over the BASE lineitem, three walls
    // up front and one at the end, published in meta. Scale artifacts
    // from different sessions compare via cell/calib ratios, never raw
    // seconds: SCALE_PROBE_INREGIME_r14 measured 1.5-2x wall drift at
    // IDENTICAL shuffle bytes between two same-tree runs an hour apart
    // (off-CPU stall — GC pressure + evicted page cache). The trailing
    // wall also exposes within-run state decay. A FAILED probe records a
    // null wall + calib_error instead of its elapsed-to-failure time
    // (r14 ADVICE: a near-zero denominator silently corrupts every
    // normalized ratio downstream).
    var calibError: Option[String] = None
    def calibOnce(): Double = {
      val t0 = System.nanoTime()
      val dt =
        try {
          spark.read.parquet(s"$baseDir/lineitem.parquet")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(org.apache.spark.sql.functions.sum("l_quantity"),
                 org.apache.spark.sql.functions.avg("l_extendedprice"),
                 org.apache.spark.sql.functions.count("*"))
            .orderBy("l_returnflag", "l_linestatus")
            .queryExecution.toRdd.count()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          calibError = calibError.orElse(Some(
            s"${e.getClass.getSimpleName}: " +
              String.valueOf(e.getMessage).take(160)))
          System.err.println(s"[scale] CALIBRATION PROBE FAILED: $e")
          Double.NaN
        }
      clearPersisted()
      dt
    }
    // labeled walls: SCALE_r14b showed the up-front median misreading
    // the state the CELLS later ran under (start walls 1.41/0.62/0.61 s
    // vs a trailing 0.32 s — the box recovered mid-run while the cells
    // median-matched the earlier rehearsal within 8%), so walls are
    // taken before EACH scale's cell block too and published labeled;
    // normalize a scale's cells by its own adjacent wall.
    val calibWalls =
      scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    (1 to 3).foreach(i => calibWalls += (s"start$i" -> calibOnce()))

    // SPARK_GRAFT_ONLY=a,b,c runs a targeted probe: just the named
    // queries, skipping the censuses (band-join, cross-copy, capped
    // recall, chain) — the fast loop for verifying one family's growth
    // curve after a fix without paying the full ~hour rehearsal
    val only: Option[Set[String]] = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val measured = only.fold(queries)(sel => queries.filter(q => sel(q._1)))

    // pre-build the persisted ANN indexes (train + write, untimed) so the
    // *_indexed cells below book only the serve-path query
    val measuredNames = measured.map(_._1).toSet
    for (n <- scales) {
      try {
        if (measuredNames("s_pq_topk_indexed"))
          graft.similarity.Ann.pqTopKCached(spark, dirs(n)).queryExecution.toRdd.count()
        if (measuredNames("s_ivf_topk_indexed"))
          graft.similarity.Ann.ivfTopKCached(spark, dirs(n)).queryExecution.toRdd.count()
        if (measuredNames("s_bm25_topk_indexed"))
          graft.similarity.Retrieval.bm25TopKCached(spark, dirs(n)).queryExecution.toRdd.count()
      } catch { case e: Throwable =>
        System.err.println(s"[scale] index pre-build x$n failed: ${e.getMessage}")
      }
      ()
    }
    // pre-build the bucketed attach layouts (untimed cells, same
    // rationale): the reuse=true timed cells then measure the SERVE path
    // — pair-gen over the bucketed posting plus the single-exchange
    // attach. r13 (VERDICT finding 3): the build walls are RECORDED and
    // published in a "layout_build" section, so a capacity plan reading
    // the artifact sees build and serve costs separately instead of
    // inferring the split from the in-regime probe artifacts.
    val layoutBuildWalls =
      scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def buildLayouts(n: Int): Unit = {
      if (measuredNames("d_ngram_bucketed"))
        graft.dedup.Dedup.ngramJaccardBucketedAttach(
          spark, dirs(n), nBuckets = bucketsFor(dirs(n))).queryExecution.toRdd.count()
      if (measuredNames("d_containment_bucketed"))
        graft.dedup.Dedup.containmentBucketedAttach(
          spark, dirs(n), nBuckets = bucketsFor(dirs(n))).queryExecution.toRdd.count()
      if (measuredNames("d_lsh_bucketed"))
        graft.dedup.Dedup.lshJaccardBucketedAttach(
          spark, dirs(n), nBuckets = bucketsFor(dirs(n))).queryExecution.toRdd.count()
    }
    // warm-build statistic (r13 VERDICT item 2): the warm walls get the
    // SAME interleaved median-of-3 discipline the serve cells got — the
    // r13 artifacts showed single-shot build walls scattering 2–6×
    // across probes (×50 d4b warm recorded 51.8 s in one artifact and
    // 15.1 s in another against a 15.4 s BUILDWARM steady state), which
    // a capacity plan could misread. Three full forced-build passes,
    // each pass interleaving the families (a transient stall lands in
    // at most one pass per family), per-family MEDIAN published plus
    // the walls array. Cost: the forced rebuilds are minutes at ×50 —
    // SPARK_GRAFT_WARM_BUILDS=0 opts out for probe runs that only need
    // serve cells (r13 ADVICE).
    val warmBuildPasses =
      if (sys.env.get("SPARK_GRAFT_WARM_BUILDS").contains("0")) 0 else 3
    val layoutBuildWallArrays =
      scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    def buildLegs(): Map[String, Double] =
      graft.ops.Legs.drain().filter(_._1.endsWith(".build"))
    for (n <- scales) {
      try {
        graft.ops.Legs.drain()
        buildLayouts(n)
        buildLegs().foreach { case (k, v) =>
          layoutBuildWalls.update(s"x$n.$k", v) }
        // measure the warm builds under the SAME cache state as the
        // BUILDWARM probe they are calibrated against: the lsh build
        // persists band rows that would otherwise stay cached across
        // passes (r13 ADVICE)
        clearPersisted()
        val passes = (1 to warmBuildPasses).map { _ =>
          buildLayouts(n)
          val legs = buildLegs()
          clearPersisted()
          legs
        }
        passes.flatMap(_.keys).distinct.foreach { k =>
          val walls = passes.flatMap(_.get(k)).sorted
          if (walls.nonEmpty) {
            // med() averages the middle pair when a pass failed and only
            // two walls survive (r14 ADVICE: the upper pick biased high)
            layoutBuildWalls.update(s"x$n.$k.warm", med(walls))
            layoutBuildWallArrays.update(s"x$n.$k.warm_walls", walls)
          }
        }
      } catch { case e: Throwable =>
        System.err.println(s"[scale] bucketed pre-build x$n failed: ${e.getMessage}")
      }
      ()
    }

    case class Cell(sec: Double, rows: Long, metrics: Map[String, Long],
                    walls: Seq[Double], legs: Map[String, Double])
    val results = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.LinkedHashMap[Int, Cell]]

    // probe runs default to median-of-3 (r11 VERDICT item 3: the r11
    // in-regime probe showed a ×30 wall ABOVE the ×50 wall for the same
    // query — single-shot cells inherit cross-cell JVM state, and the
    // headline linearity claims can't rest on them). Each repeat gets a
    // full clearPersisted + GC quiesce; the reported cell is the repeat
    // with the MEDIAN wall (its metrics, not a mix), and every wall is
    // kept in the artifact so run-to-run spread is visible. The full
    // (~60-cell) rehearsal stays single-shot — it is an hour already —
    // unless SPARK_GRAFT_REPEATS overrides.
    val repeats = sys.env.get("SPARK_GRAFT_REPEATS").map(_.toInt)
      .getOrElse(if (only.isDefined) 3 else 1)

    var calibbedScale = -1
    for (n <- scales; (name, fn) <- measured) {
      if (n != calibbedScale) {
        // the per-scale wall is itself a MEDIAN-of-3 (r15 finding: the
        // SCALE_r15/SCALE_r15b pair measured a single adjacent wall as
        // the dominant noise source — 1.58 vs 0.47 s at x1 while the
        // cells themselves agreed to ~6% — so one short probe wall must
        // not be the denominator of a whole scale's sec_per_calib
        // column); the individual walls stay published as x<N>-p1..p3
        val ws = Seq.fill(3)(calibOnce())
        ws.zipWithIndex.foreach { case (w, i) =>
          calibWalls += (s"x$n-p${i + 1}" -> w) }
        // qualified: the cell loop below binds a local `med` (median run)
        calibWalls += (s"x$n" -> ScaleBench.med(ws)); calibbedScale = n
      }
      val dir = dirs(n)
      // the bucketed SERVE cells get median-of-3 even in the full
      // rehearsal (r13): they are the cells capacity plans read, their
      // single-shot walls inherited cross-cell JVM state (the r11 ×30>×50
      // inversion, and r12's rehearsal walls reading 2.5× the probe's),
      // and three serve passes cost seconds against the hour — while the
      // corpus-scan-heavy one-shot cells stay single-shot. The `_slim`
      // experiment CONTROLS ride the same statistic (contains, not
      // endsWith): their growth ratios are quoted against the standard
      // cells', and two single-shot runs of one slim cell differed 4×
      // (20.3 vs 81.8 s at ×50) at identical shuffle bytes — all JVM
      // state, no signal.
      val cellRepeats =
        if (repeats > 1 || !name.contains("_bucketed")) repeats else 3
      val runs = (1 to cellRepeats).map { _ =>
        clearPersisted()
        listener.reset()
        graft.ops.Legs.drain() // leftover legs must not blame this cell
        val t0 = System.nanoTime()
        val rows =
          try fn(spark, dir).queryExecution.toRdd.count()
          catch { case e: Throwable =>
            System.err.println(s"[scale] $name x$n FAILED: ${e.getMessage}"); -1L
          }
        val sec = (System.nanoTime() - t0) / 1e9
        drainListenerBus(spark)
        // any leg recorded inside THIS wall (a layout/lifecycle build the
        // reuse contract was supposed to keep out of the timed cell, or a
        // lifecycle query's declared phases) is published with the cell —
        // a rehearsal cell can no longer silently include a build
        (sec, rows, listener.snapshot, graft.ops.Legs.drain())
      }
      val sorted = runs.sortBy(_._1)
      val med = sorted(sorted.length / 2)
      val cell = Cell(med._1, med._2, med._3, runs.map(_._1), med._4)
      results.getOrElseUpdate(name,
        scala.collection.mutable.LinkedHashMap.empty) += n -> cell
      System.err.println(f"[scale] $name%-22s x$n%-3d ${cell.sec}%7.2f s " +
        f"rows=${cell.rows}%9d shufW=${cell.metrics("shuffle_write_bytes")}%12d" +
        (if (repeats > 1) s" walls=${cell.walls.map(w => f"$w%.1f").mkString("/")}" else ""))
    }

    // candidate-pair counts for the band-join claim (not a timed query:
    // counts the band-join candidates BEFORE the Jaccard verify)
    val candCounts = if (only.isDefined) Map.empty[Int, Long] else scales.map { n =>
      clearPersisted()
      val docs = graft.Tables.documents(spark, dirs(n))
      val sets = graft.dedup.Dedup.shingleSets(docs, algo = "xxh64")
      val cands = graft.dedup.Dedup
        .bandCandidates(graft.dedup.Dedup.signaturesFromSets(sets))
      n -> cands.count()
    }.toMap
    val docCounts = if (only.isDefined) Map.empty[Int, Long] else scales.map { n =>
      n -> graft.Tables.documents(spark, dirs(n)).count()
    }.toMap

    // generator honesty: cross-copy pair counts. The scale model promises
    // disjoint shards, so any cross-copy pair in a VERIFIED output is
    // either a generator bug or a false positive of the algorithm (the
    // 32-bit simhash floor shows up here as cross-copy pairs; Jaccard-
    // verified and rotation-decorrelated outputs must be ~0).
    val crossCopy = if (only.isDefined)
      Map.empty[Int, Map[String, (Long, Long)]]
    else scales.filter(_ > 1).map { n =>
      clearPersisted()
      import org.apache.spark.sql.functions.col
      def crossFrac(df: DataFrame, a: String, b: String, stride: Long) = {
        val total = df.count()
        val cross = df
          .filter((col(a) / stride).cast("long") =!=
                  (col(b) / stride).cast("long")).count()
        (cross, total)
      }
      // embeddingDup emits CANDIDATES with flags; the honesty gate is on
      // the verified subset (candidates legitimately cross copies when two
      // copies' clusters share a bucket — that is the capped variant's job)
      val emb = crossFrac(graft.similarity.Ann.embeddingDup(spark, dirs(n))
        .filter(col("is_dup") === 1), "vec_a", "vec_b", ScaleData.VecStride)
      val jac = crossFrac(graft.dedup.Dedup.lshJaccardFast(spark, dirs(n))
        .filter(col("is_dup") === 1), "doc_a", "doc_b", ScaleData.DocStride)
      // the 32-bit FP-floor census is evidence, not a rehearsal: measure
      // it once at the smallest replicated scale (its pair set is
      // FP-quadratic — the ×50 census alone cost more than the timed
      // cell it documents)
      val sh32 =
        if (n == scales.filter(_ > 1).min)
          Some(crossFrac(graft.dedup.Dedup.simhashDup(spark, dirs(n)),
            "doc_a", "doc_b", ScaleData.DocStride))
        else None
      val shW = crossFrac(graft.dedup.Dedup.simhashDupWide(spark, dirs(n)),
        "doc_a", "doc_b", ScaleData.DocStride)
      n -> (Map("d_embedding_dup" -> emb, "d_lsh_dup_pairs" -> jac,
        "d_simhash_wide" -> shW) ++ sh32.map("d_simhash" -> _))
    }.toMap

    // capped-bucket recall: verified dups surviving the maxBucket=256 cap
    // vs the uncapped verified dups (claim: hot buckets hold boilerplate,
    // not dup clusters — recall stays 1.0)
    val cappedRecall = if (only.isDefined)
      Map.empty[Int, (Long, Long)]
    else scales.map { n =>
      clearPersisted()
      import org.apache.spark.sql.functions.col
      val full = graft.dedup.Dedup.lshJaccardFast(spark, dirs(n))
        .filter(col("is_dup") === 1).select("doc_a", "doc_b")
      val capped = graft.dedup.Dedup.lshJaccardCapped(spark, dirs(n), 256)
        .filter(col("is_dup") === 1).select("doc_a", "doc_b")
      val nFull = full.count()
      val nKept = capped.join(full, Seq("doc_a", "doc_b"), "left_semi").count()
      n -> (nKept, nFull)
    }.toMap

    // k-stride convergence evidence (r8): a planted high-diameter chain
    // is the propagation worst case — per-round checking pays ~diameter
    // driver actions, the k-stride loop ~diameter/k; both must reach the
    // identical fixed point. Measured directly (not via a corpus: near-dup
    // corpora are shallow by construction, which is exactly why the
    // adversarial chain has to be planted).
    val chainProp = if (only.isDefined) Map.empty[String, Double] else {
      clearPersisted()
      import spark.implicits._
      val diam = 400
      val edges = (0 until diam).map(i => (i.toLong, i.toLong + 1))
        .toDF("doc_a", "doc_b")
      def run(k: Int): (Long, Int, Double) = {
        val t0 = System.nanoTime()
        val (labels, actions) = graft.dedup.Dedup.propagateLabelsCounted(edges, k)
        val wrong = labels.filter(org.apache.spark.sql.functions.col("lab") =!= 0L).count()
        (wrong, actions, (System.nanoTime() - t0) / 1e9)
      }
      val strided = run(graft.dedup.Dedup.PropagateStrideCap)
      val perRound = run(1)
      Map("diameter" -> diam.toDouble,
        "stride_cap" -> graft.dedup.Dedup.PropagateStrideCap.toDouble,
        "strided_actions" -> strided._2.toDouble,
        "strided_sec" -> strided._3,
        "strided_wrong_labels" -> strided._1.toDouble,
        "per_round_actions" -> perRound._2.toDouble,
        "per_round_sec" -> perRound._3,
        "per_round_wrong_labels" -> perRound._1.toDouble)
    }

    // ---- JSON out ---------------------------------------------------
    calibWalls += ("end" -> calibOnce()) // trailing wall: state decay
    // the x<N>-p* raw walls are excluded: their median is already in the
    // x<N> entry, and counting both would double-weight the per-scale walls
    val calibSec = med(
      calibWalls.filterNot(_._1.contains("-p")).map(_._2).toSeq)
    // each scale's cells normalize by the wall taken ADJACENT to them
    // (the labeled x<N> wall) — SCALE_r14b showed the box recovering
    // MID-RUN, so the up-front median can misread the state a later
    // scale's cells actually ran under; fall back to the run median only
    // if that scale's own probe failed
    val scaleWall: Map[String, Double] = calibWalls.toMap
    def wallFor(n: Int): Double = {
      val w = scaleWall.getOrElse(s"x$n", Double.NaN)
      if (w.isNaN) calibSec else w
    }
    val sb = new StringBuilder
    sb.append("{\n  \"meta\": {\"base\": \"").append(baseDir)
      .append("\", \"cpus\": ").append(cpus)
      .append(", \"calib_sec\": ").append(jnum(calibSec))
      .append(", \"calib_walls\": {")
      .append(calibWalls.map { case (l, w) => s""""$l": ${jnum(w)}""" }
        .mkString(", ")).append("}")
      .append(calibError.fold("")(e => s""", "calib_error": ${jstr(e)}"""))
      // heap decides spill at fixed data: record it so runs are comparable
      .append(", \"heap_gb\": ")
      .append(Runtime.getRuntime.maxMemory / (1024L * 1024 * 1024))
      .append(", \"scales\": [").append(scales.mkString(","))
      .append("], \"note\": \"x10/x50 = sf1/sf5-equivalent row counts; ")
      .append("disjoint-shard scale model (ScaleData scaladoc): true dup ")
      .append("pairs grow exactly linearly, so super-linear growth in any ")
      .append("measured quantity is an algorithmic artifact. Cells flagged ")
      .append("control=true are diagnostic comparisons (_slim pair ")
      .append("experiment, forced distributed clustering) excluded from ")
      .append("the every-growth-ratio-below-ideal claim: their x1 walls ")
      .append("are sub-second, so the ratio divides by noise. ")
      // r16 VERDICT finding 5: the r16/r16b pair's x50 normalized medians
      // sat 1.21x apart while raw agreed at 0.985x — probe walls are the
      // noise source at every scale, not just x1
      .append("Per-scale sec_per_calib columns are DIAGNOSTIC at every ")
      .append("scale; RAW medians-of-pairs are the cross-run comparator ")
      .append("(the r16 rehearsal pair measured x50 normalized medians ")
      .append("1.21x apart at raw 0.985x)\"},\n")
    if (only.isDefined)
      sb.append("  \"probe_only\": [")
        .append(measured.map(q => s""""${q._1}"""").mkString(", "))
        .append("],\n")
    else {
    sb.append("  \"band_join\": {")
    sb.append(scales.map { n =>
      val nd = docCounts(n); val allPairs = nd * (nd - 1) / 2
      val (kept, full) = cappedRecall(n)
      s""""x$n": {"docs": $nd, "candidate_pairs": ${candCounts(n)}, "all_pairs": $allPairs, "fraction_of_all_pairs": ${jnum(candCounts(n).toDouble / allPairs)}, "verified_dups": $full, "capped_verified_kept": $kept, "capped_recall": ${jnum(kept.toDouble / math.max(1L, full))}}"""
    }.mkString(", ")).append("},\n")
    sb.append("  \"cross_copy_pairs\": {")
    sb.append(crossCopy.toSeq.sortBy(_._1).map { case (n, qs) =>
      val inner = qs.toSeq.sortBy(_._1).map { case (q, (cross, total)) =>
        s""""$q": {"cross": $cross, "total": $total, "fraction": ${jnum(cross.toDouble / math.max(1L, total))}}"""
      }.mkString(", ")
      s""""x$n": {$inner}"""
    }.mkString(", ")).append("},\n")
    sb.append("  \"label_propagation_chain\": {")
    sb.append(chainProp.toSeq.sortBy(_._1).map { case (k, v) =>
      s""""$k": ${jnum(v)}""" }.mkString(", "))
    sb.append("},\n")
    }
    if (layoutBuildWalls.nonEmpty) {
      sb.append("  \"layout_build\": {")
      sb.append((layoutBuildWalls.map { case (k, v) =>
        s""""$k": ${jnum(v)}""" } ++
        layoutBuildWallArrays.map { case (k, ws) =>
          s""""$k": [${ws.map(jnum).mkString(", ")}]""" }).mkString(", "))
      sb.append("},\n")
    }
    sb.append("  \"queries\": {\n")
    sb.append(results.map { case (name, cells) =>
      val base = cells(scales.head)
      val perScale = cells.map { case (n, c) =>
        val m = c.metrics.map { case (k, v) => s""""$k": $v""" }.mkString(", ")
        val walls = if (c.walls.length > 1)
          s""", "walls": [${c.walls.map(jnum).mkString(", ")}]""" else ""
        val includesBuild = c.legs.keys.exists(_.endsWith(".build"))
        val legsJson = if (c.legs.isEmpty) "" else
          s""", "legs": {${c.legs.toSeq.sortBy(_._1)
            .map { case (k, v) => s""""$k": ${jnum(v)}""" }.mkString(", ")}}"""
        // sec_per_calib (r14 VERDICT finding 3): the cell pre-divided by
        // its scale-adjacent calibration wall — cross-session rehearsal
        // comparison is a column read, not a manual division against the
        // labeled wall map
        s""""x$n": {"sec": ${jnum(c.sec)}, "sec_per_calib": ${
          jnum(c.sec / wallFor(n))}, "rows": ${c.rows}, "includes_build": $includesBuild, $m$walls$legsJson}"""
      }.mkString(", ")
      val growth = cells.map { case (n, c) =>
        val ideal = n.toDouble / scales.head
        s""""x$n": {"time_ratio": ${jnum(c.sec / base.sec)}, "ideal": ${jnum(ideal)}, "rows_ratio": ${jnum(c.rows.toDouble / base.rows)}, "shuffle_write_ratio": ${jnum(c.metrics("shuffle_write_bytes").toDouble / math.max(1L, base.metrics("shuffle_write_bytes")))}}"""
      }.mkString(", ")
      s"""    "$name": {"control": ${ControlCells(name)}, $perScale, "growth": {$growth}}"""
    }.mkString(",\n"))
    sb.append("\n  }\n}\n")
    // explicit UTF-8 (r15 ADVICE): the default-charset PrintWriter mangles
    // non-ASCII in the note to '?' under a POSIX locale
    val w = new java.io.PrintWriter(outFile, "UTF-8")
    try w.write(sb.toString) finally w.close()
    System.err.println(s"[scale] wrote $outFile")
    spark.stop()
  }
}
