package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY §2.11).
  *
  * The reference is batch-only; this is the additive streaming facade the
  * survey prescribes: the same event-time logic as the batch operators
  * (graft.ops.Events / Aggregates.sessionize), expressed over an append
  * stream with watermarks. Batch/stream parity is asserted in specs — the
  * batch twin is the oracle.
  *
  * At scale: file/Kafka source → watermark bounds state; tumbling windows
  * and session windows are Spark's native stateful aggs; the custom
  * per-user state (flatMapGroupsWithState) is the hook the frame-EPPA
  * kernel would use for live tracking feeds (SURVEY §2.11's
  * "design the kernel to be reusable from flatMapGroupsWithState").
  */
object EventStreams {

  /** File-source stream over an events parquet, normalized to the same
    * µs-timestamp `ts` as graft.Tables.events. readStream needs the schema
    * up front, so probe the existing footers once (batch-side) to learn
    * which physical ts layout this directory carries; an empty directory
    * defaults to the native timestamp layout. */
  def readEvents(spark: SparkSession, path: String): DataFrame = {
    val tsIsLong =
      try graft.Tables.eventsTsIsLong(spark, path)
      catch { case _: org.apache.spark.sql.AnalysisException => false }
    if (tsIsLong)
      spark.readStream
        .schema(graft.Tables.eventsRawSchema)
        .parquet(path)
        .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else
      spark.readStream
        .schema(graft.Tables.eventsTsSchema)
        .parquet(path)
  }

  /** Tumbling 6-hour windows per event type with a 1-hour watermark. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(graft.ops.Num.micros(col("value"))).as("value_micros"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), (col("value_micros") / 1e6).as("total_value"))

  /** Sliding 6-hour windows advancing every 2 hours — the rate-monitoring
    * shape (each event lands in exactly duration/slide = 3 overlapping
    * windows). State is bounded by watermark × slide granularity; the
    * overlap factor multiplies STATE rows, not input rows — Spark expands
    * each event to its windows before the aggregation, so the exchange
    * carries (event × 3) pre-aggregated partials, map-side combined. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours", "2 hours"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(graft.ops.Num.micros(col("value"))).as("value_micros"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), (col("value_micros") / 1e6).as("total_value"))

  /** Session windows (30-minute gap) per user — the streaming twin of
    * graft.ops.Aggregates.sessionize. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           sum(graft.ops.Num.micros(col("value"))).as("value_micros"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("n_events"), (col("value_micros") / 1e6).as("session_value"))

  final case class UserState(nEvents: Long, totalMicros: Long)
  final case class UserUpdate(user_id: Long, n_events: Long, total_value: Double)

  /** Custom keyed state: running per-user totals via
    * flatMapGroupsWithState (§2.12 — the pattern that hosts the EPPA
    * kernel on a live feed). */
  def runningUserTotals(spark: SparkSession, events: DataFrame): Dataset[UserUpdate] = {
    import spark.implicits._
    events
      .select(col("user_id"), graft.ops.Num.micros(col("value")).as("micros"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, Long)], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0L))
          var n = prev.nEvents
          var tot = prev.totalMicros
          rows.foreach { r => n += 1; tot += r._2 }
          state.update(UserState(n, tot))
          Iterator.single(UserUpdate(userId, n, tot / 1e6))
      }
  }

  final case class AsofState(viewTsUs: Long, viewValue: Double)
  final case class AsofMatch(event_id: Long, user_id: Long, ts_us: Long,
                             purchase_value: Double,
                             last_view_ts_us: Option[Long],
                             last_view_value: Option[Double])

  /** Streaming as-of join (the stream twin of
    * graft.ops.TemporalJoins.asofJoin): per user, every purchase event is
    * emitted with the most recent view event at-or-before it. Keyed state
    * is ONE row per user (the latest view seen) — the same O(1)-per-key
    * state the batch union-window form carries, kept in
    * flatMapGroupsWithState instead of a window frame.
    *
    * Ordering: rows are sorted by (ts, side) inside each micro-batch, so
    * within-batch disorder is absorbed; a view arriving in a LATER batch
    * than a purchase it precedes is a late-data miss, bounded by the
    * source's delivery disorder (add a watermark + event-time timeout to
    * evict idle users in production). */
  def streamingAsofLastView(spark: SparkSession, events: DataFrame): Dataset[AsofMatch] = {
    import spark.implicits._
    val typed = events
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        when(col("event_type") === "view", 0).otherwise(1).as("side"),
        col("event_id"), col("value"))
      .as[(Long, Long, Int, Long, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, Long, Int, Long, Double)],
         state: GroupState[AsofState]) =>
          var last = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[AsofMatch]
          // (ts, side) order: views sort before purchases at equal ts,
          // matching ASOF's l.ts >= r.ts tie rule
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach {
            case (_, tsUs, 0, _, value) =>
              // equal-ts views reduce by max(value) — the same dedup the
              // batch operator applies to make ties deterministic
              val v = last match {
                case Some(s) if s.viewTsUs == tsUs => math.max(s.viewValue, value)
                case _ => value
              }
              last = Some(AsofState(tsUs, v))
            case (_, tsUs, _, eventId, value) =>
              out += AsofMatch(eventId, userId, tsUs, value,
                last.map(_.viewTsUs), last.map(_.viewValue))
          }
          last.foreach(state.update)
          out.iterator
      }
  }

  final case class FunnelState(tSignup: Long, tView: Long, tPurchase: Long)
  final case class FunnelRow(user_id: Long, t_signup: Long,
                             t_view: Option[Long], t_purchase: Option[Long],
                             stage: Long)

  /** Streaming funnel: the stream twin of [[graft.ops.Events.funnel]].
    * Per user, keyed state is three timestamps (first signup, first view
    * strictly after it, first purchase strictly after that) — O(1) per
    * user regardless of event volume, exactly the three MIN aggregates
    * the batch form computes. Each micro-batch sorts its rows by
    * (event time, stage) so within-batch disorder is absorbed; emission
    * is OutputMode.Update (the user's current funnel row, re-emitted when
    * it advances). Users with no signup yet hold no state and emit
    * nothing, matching the batch form's inner join on stage 1.
    *
    * Late-data caveat (same as the as-of stream): an earlier-stage event
    * arriving AFTER a later stage was locked in is a miss; production
    * adds a watermark + event-time timeout to bound waiting and evict
    * idle users. */
  def streamingFunnel(spark: SparkSession, events: DataFrame): Dataset[FunnelRow] = {
    import spark.implicits._
    val typed = events
      .filter(col("event_type").isin("signup", "view", "purchase"))
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        when(col("event_type") === "signup", 0)
          .when(col("event_type") === "view", 1).otherwise(2).as("stage"))
      .as[(Long, Long, Int)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, Long, Int)],
         state: GroupState[FunnelState]) =>
          var s = state.getOption.getOrElse(FunnelState(0L, 0L, 0L))
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, ts, stage) =>
            stage match {
              case 0 => if (s.tSignup == 0L) s = s.copy(tSignup = ts)
              case 1 =>
                if (s.tSignup != 0L && s.tView == 0L && ts > s.tSignup)
                  s = s.copy(tView = ts)
              case _ =>
                if (s.tView != 0L && s.tPurchase == 0L && ts > s.tView)
                  s = s.copy(tPurchase = ts)
            }
          }
          if (s.tSignup == 0L) Iterator.empty
          else {
            state.update(s)
            val stageN = 1L + (if (s.tView != 0L) 1L else 0L) +
              (if (s.tPurchase != 0L) 1L else 0L)
            Iterator.single(FunnelRow(userId, s.tSignup,
              Option(s.tView).filter(_ != 0L),
              Option(s.tPurchase).filter(_ != 0L), stageN))
          }
      }
  }

  final case class MGState(counts: Map[String, Long], decr: Long)
  final case class TrendingRow(lang: String, item: String, est: Long, err: Long)

  /** Streaming frequent items (trending tokens per language): the stream
    * twin of the batch Misra–Gries aggregate (graft.functions.FreqItems).
    * Keyed state is the sketch itself — ≤ k counters + one decrement
    * total per language, O(k) regardless of stream length — and each
    * micro-batch folds its tokens in with the same update rule, then
    * re-emits the language's current top items. The MG guarantees
    * (everything above n/(k+1) present; est ≤ true ≤ est + err) hold at
    * every emission because they are invariant under the update/merge
    * rules, not a property of batch boundaries. */
  /** Streaming maintenance of the materialized daily rollup: the
    * medallion sink pattern — each micro-batch lands raw in the bronze
    * event log, then [[graft.pipelines.IncrementalRollup.ingest]]
    * recomputes exactly the days the batch touched from the full bronze
    * set and swaps those partitions. Exactly-once BY IDEMPOTENCE, not by
    * transactions: a replayed batch re-appends to bronze, but the rollup
    * reads bronze through a dropDuplicates(event_id), and the partition
    * swap rewrites the same days to the same bytes — so checkpoint
    * recovery cannot corrupt the table (the spec replays a batch to
    * prove it). At 100 TB the per-batch cost is the touched days'
    * volume, never the table's. */
  def rollupSink(events: DataFrame, bronzePath: String,
                 rollupPath: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    rollupSinkWithHook(events, bronzePath, rollupPath, checkpoint)(() => ())

  /** [[rollupSink]] with a test seam between the bronze append and the
    * rollup swap — the crash window where bronze has a batch's rows but
    * the rollup hasn't absorbed them. Recovery story (pinned by
    * StreamingMultimodalSpec): the restarted query REPLAYS the
    * uncommitted batch, bronze double-appends it, and the rollup
    * recompute reads bronze through dropDuplicates(event_id) — so the
    * swapped days equal the batch twin exactly: no double-count, no
    * hole. */
  private[graft] def rollupSinkWithHook(events: DataFrame, bronzePath: String,
                 rollupPath: String, checkpoint: String)(afterBronze: () => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.persist()
        // bronze is DAY-PARTITIONED so ingest's touched-day join prunes
        // directories — per-batch cost stays ∝ touched days even as the
        // log grows (an unpartitioned append would full-scan history).
        batch.withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
          .write.mode("append").partitionBy("day").parquet(bronzePath)
        afterBronze()
        // dedupKey pushes the replay-dedup below the touched-day filter,
        // so the per-batch cost is the touched days, not all of bronze
        val bronze = batch.sparkSession.read.parquet(bronzePath)
        graft.pipelines.IncrementalRollup.ingest(bronze, batch.toDF(), rollupPath,
          dedupKey = Some("event_id"))
        batch.unpersist()
        ()
      }
      .start()

  /** Streaming crawl admission: each microbatch of documents admits
    * against the persistent band-bucket store exactly like a batch crawl
    * shard ([[graft.dedup.IncrementalDedup.admitBatch]]); flags land
    * under `flagsDir` partitioned by batch id. With id-ordered input
    * files the streamed flags equal the one-shot global dedup rule — the
    * same order-independence argument as the batch form, spec-pinned.
    *
    * Exactly-once BY IDEMPOTENCE, the rollup-sink pattern: admission is
    * a pure function of (store ∪ batch) so a replayed microbatch
    * recomputes identical flags and its store appends are no-ops, and
    * the flags write is a dynamic overwrite of the batch's own
    * `batch_id=` partition — replay rewrites the same bytes, never
    * duplicates rows. */
  def admissionSink(docsStream: DataFrame, storeDir: String,
                    flagsDir: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.dedup.IncrementalDedup
          .admitBatch(batch.select(col("doc_id"), col("text")), storeDir)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id").parquet(flagsDir)
        ()
      }
      .start()

  /** Streaming span-level self-dedup: each id-ordered microbatch of
    * documents runs [[graft.ops.TextOps.selfDedupAdmitBatch]] against the
    * persistent window-owner store, its scrub rows landing under
    * `outDir` partitioned by batch id. This sink EXISTS because of the
    * rule it streams: ExactSubstr's first-occurrence-wins is
    * prefix-stable — an emitted document's scrub decision can never be
    * changed by later data — so the stream's outputs are immutable and
    * equal the one-shot corpus rule ([[graft.ops.TextOps.selfDedupScrub]];
    * spec-pinned). The drop-ALL span rule ([[graft.ops.TextOps]] T17)
    * has no such sink: its first copy becomes scrub-worthy only when the
    * second arrives.
    *
    * Exactly-once by idempotence, the [[admissionSink]] argument: scrub
    * rows are a pure function of (store ∪ batch), replayed store appends
    * are owner-stable no-ops, and the output write dynamically overwrites
    * only the batch's own `batch_id=` partition. */
  def selfDedupSink(docsStream: DataFrame, storeDir: String,
                    outDir: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.ops.TextOps
          .selfDedupAdmitBatch(batch.select(col("doc_id"), col("text")), storeDir)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id").parquet(outDir)
        ()
      }
      .start()

  /** Streaming ANN index maintenance: each microbatch of newly embedded
    * vectors folds into the persisted IVF index via
    * [[graft.similarity.Ann.ivfIndexUpsert]], so the serving index stays
    * fresh at ingest cadence without ever re-reading the corpus — the
    * stream twin of the `s_ivf_upsert` lifecycle step, completing
    * build → (streamed) upsert → serve → takedown.
    *
    * Exactly-once by idempotence, the [[admissionSink]] argument: the
    * cell upsert is a KEY-deduplicated partition rewrite (a replayed
    * row is dropped by the per-key dedup), and the centroid merge is a
    * pure function of the post-upsert cells — so a checkpoint replay of
    * a half-applied microbatch rewrites identical bytes. Empty
    * microbatches are skipped so a quiet stream never touches the
    * centroid table. */
  def indexMaintenanceSink(vecsStream: DataFrame, indexPath: String,
                           checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty)
          graft.similarity.Ann.ivfIndexUpsert(
            batch.select(col("vec_id"), col("label"), col("embedding")),
            indexPath)
        ()
      }
      .start()

  /** The KEYWORD twin of [[indexMaintenanceSink]]: each microbatch of
    * new documents tokenizes and folds into the persisted inverted index
    * ([[graft.similarity.Retrieval.postingIndexUpsert]]) — postings land
    * only in the term-hash buckets the batch touches, doc lengths in the
    * doc-hash buckets, and the BM25 serve path reads the union of all
    * folded batches with global df intact (all postings of a term share
    * one bucket). Exactly-once by the same idempotence argument: both
    * upserts are key-deduplicated partition rewrites, and tokenization
    * is a pure per-row function, so checkpoint replays rewrite identical
    * bytes. */
  def postingMaintenanceSink(docsStream: DataFrame, indexPath: String,
                             checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty)
          graft.similarity.Retrieval.postingIndexUpsert(
            batch.select(col("doc_id"), col("text")), indexPath)
        ()
      }
      .start()

  /** The RARE-GRAM twin of [[postingMaintenanceSink]]: each microbatch
    * of new or CHANGED documents folds into the persisted n-gram dedup
    * index ([[graft.dedup.NgramIndex.upsert]] — a keyed replace, so a
    * changed doc's lost grams leave no stale postings). Exactly-once by
    * idempotence: the replace rewrites identical content on replay, and
    * gram hashing is a pure per-row function. */
  def ngramMaintenanceSink(docsStream: DataFrame, indexPath: String,
                           checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty)
          graft.dedup.NgramIndex.upsert(
            batch.select(col("doc_id"), col("text")), indexPath)
        ()
      }
      .start()

  /** Streaming twin of the DSIR scoring stage (the selection family's
    * missing stream path until round 8): arriving documents are scored
    * against a FROZEN importance model — built batch-side from the
    * oracle-gated `dsirBins` via [[graft.ops.DataSelection.dsirModel]]
    * and broadcast into every microbatch — as a pure stateless stage:
    * no watermark, no keyed state, model B rows. Scores land keyed by
    * doc_id in doc-hash-bucketed parquet through
    * [[graft.sources.Store.replaceKeys]], so a checkpoint replay (or a
    * re-scored changed document) rewrites identical-or-newer content —
    * exactly-once by idempotence, and re-ingesting a doc cannot leave
    * two score rows. The per-doc sorted fold makes the double
    * bit-identical to the batch path (StreamingMultimodalSpec pins
    * stream ≡ batch on weight, n_grams, and the integer core).
    * Selection (top-k / quota) stays a batch step over the scored table
    * — a global rank is not a per-microbatch decision. */
  def dsirScoringSink(docsStream: DataFrame, model: DataFrame,
                      outDir: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          val scored = graft.ops.DataSelection
            .dsirScore(batch.select(col("doc_id"), col("lang"), col("text")), model)
            .withColumn("sp", pmod(col("doc_id"), lit(16L)).cast("int"))
          // replace keyed on the MICROBATCH's doc_ids, not the scored
          // frame: a re-ingested changed doc whose features all filtered
          // out scores ZERO rows, and keying off the output would leave
          // its stale score row standing — the same derived-keys hole the
          // gram index closed (StreamingMultimodalSpec plants the case)
          graft.sources.Store.replaceKeys(scored, outDir,
            keyCols = Seq("doc_id"), partitionCols = Seq("sp"),
            keysOf = Some(batch.select(col("doc_id"))))
        }
        ()
      }
      .start()

  /** The PQ twin of [[indexMaintenanceSink]]: each microbatch encodes its
    * vectors against the index's FROZEN codebooks and upserts only the
    * touched code partitions ([[graft.similarity.Ann.pqIndexAppend]]) —
    * codebooks retrain on a cadence, arrivals between retrains stream in
    * at encode cost. Exactly-once by the same idempotence argument: the
    * code upsert is key-deduplicated, and encoding against frozen
    * codebooks is a pure per-row function, so checkpoint replays rewrite
    * identical bytes. */
  def pqMaintenanceSink(vecsStream: DataFrame, indexPath: String,
                        checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty)
          graft.similarity.Ann.pqIndexAppend(
            batch.select(col("vec_id"), col("embedding")), indexPath)
        ()
      }
      .start()

  final case class Scd2State(state: String, sinceUs: Long, version: Long)
  final case class Scd2Closed(user_id: Long, version: Long, state: String,
                              valid_from_us: Long, valid_to_us: Long)

  /** Streaming SCD2: the stream twin of [[graft.ops.Windows.scd2Intervals]].
    * Keyed state is the OPEN interval (current state, since-when, version
    * counter) — O(1) per user; each arriving state CHANGE closes the open
    * interval and emits it (append mode can't retract, so only CLOSED
    * intervals are emitted — the open one lives in state until the next
    * change, and the batch operator's is_current row is exactly that
    * open interval). Within-batch disorder is absorbed by the same
    * (ts, state) sort the batch window uses; consecutive duplicates
    * collapse identically to the batch lag() change filter.
    *
    * Cross-batch disorder is BOUNDED, not absorbed: an event whose ts
    * precedes — or exactly EQUALS — the open interval's start arrived
    * after a later event was already folded into state; honoring it
    * would emit an interval with valid_to < valid_from (inverted) or
    * valid_to == valid_from under an ordering the batch twin (which
    * sorts globally) may not agree with. Such events are dropped — the
    * documented divergence from scd2Intervals is only that straggler
    * loss; every emitted interval has valid_to > valid_from OR is a
    * same-timestamp zero-length interval that arose WITHIN one batch,
    * where the (ts, state) sort makes it identical to the batch twin. */
  def streamingScd2(spark: SparkSession, events: DataFrame): Dataset[Scd2Closed] = {
    import spark.implicits._
    val typed = events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .as[(Long, Long, String)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, Long, String)],
         state: GroupState[Scd2State]) =>
          var cur = state.getOption
          // while the open interval still comes from a PREVIOUS batch, a
          // ts equal to its start is also a cross-batch straggler (the
          // batch twin's global (ts, state) sort may order it BEFORE the
          // open state) — once this batch has written cur, equality is
          // within-batch and the sort below already totalized it
          var openFromPrevBatch = cur.isDefined
          val out = scala.collection.mutable.ArrayBuffer.empty[Scd2Closed]
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, tsUs, et) =>
            cur match {
              case Some(s) if tsUs < s.sinceUs ||
                  (openFromPrevBatch && tsUs == s.sinceUs) =>
                () // cross-batch straggler: drop (see scaladoc)
              case Some(s) if s.state == et => () // same state: no interval edge
              case Some(s) =>
                out += Scd2Closed(userId, s.version, s.state, s.sinceUs, tsUs)
                cur = Some(Scd2State(et, tsUs, s.version + 1))
                openFromPrevBatch = false
              case None =>
                cur = Some(Scd2State(et, tsUs, 1L))
                openFromPrevBatch = false
            }
          }
          cur.foreach(state.update)
          out.iterator
      }
  }

  def streamingFreqTokens(spark: SparkSession, docs: DataFrame,
                          k: Int): Dataset[TrendingRow] = {
    import spark.implicits._
    docs
      .select(col("lang"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (lang: String, rows: Iterator[(String, String)],
         state: GroupState[MGState]) =>
          var counts = state.getOption.map(_.counts).getOrElse(Map.empty[String, Long])
          var decr = state.getOption.map(_.decr).getOrElse(0L)
          rows.foreach { case (_, tok) =>
            counts.get(tok) match {
              case Some(c) => counts = counts.updated(tok, c + 1L)
              case None if counts.size < k => counts = counts.updated(tok, 1L)
              case None =>
                counts = counts.iterator
                  .map { case (t, c) => t -> (c - 1L) }
                  .filter(_._2 > 0L).toMap
                decr += 1L
            }
          }
          state.update(MGState(counts, decr))
          counts.toSeq.sortBy { case (t, c) => (-c, t) }.iterator
            .map { case (t, c) => TrendingRow(lang, t, c, decr) }
      }
  }

  /** File-source stream over a documents parquet (same schema as
    * graft.Tables.documents). */
  def readDocuments(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(graft.Tables.documentsSchema).parquet(path)

  /** Streaming exact dedup: emit only the first event per
    * (user_id, event_type), with watermark-bounded dedup state — the
    * streaming twin of a batch `dropDuplicates`. Within-watermark
    * semantics: a duplicate arriving later than the watermark delay after
    * its first occurrence MAY re-emit; that's the price of bounded state
    * at 100 TB (unbounded dropDuplicates state is the alternative, and a
    * non-starter on an infinite stream). */
  def firstPerUserType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Streaming near-dup flagging: incoming documents are minhash-banded
    * (stateless column expressions — the same graft_shingle_set /
    * graft_minhash_sig single-pass kernels as batch) and equi-joined
    * against a STATIC corpus band table. Stream-static joins keep no
    * state, so this runs at any corpus size with the corpus side loaded
    * (or broadcast) once per microbatch — the standard "is this new page
    * a dup of anything we already have" admission check. */
  def nearDupFlags(docsStream: DataFrame, corpusBands: DataFrame): DataFrame = {
    import graft.dedup.Dedup
    val s = Dedup.bandRows(Dedup.signaturesFromSets(Dedup.shingleSets(docsStream)))
    val keyCond = (col("band") === col("c_band")) +:
      (0 until Dedup.RowsPerBand).map(r => col(s"k$r") === col(s"c_k$r"))
    val c = corpusBands.select(
      col("doc_id").as("corpus_doc_id") +: col("band").as("c_band") +:
        (0 until Dedup.RowsPerBand).map(r => col(s"k$r").as(s"c_k$r")): _*)
    s.join(c, keyCond.reduce(_ && _) && col("doc_id") =!= col("corpus_doc_id"))
      .select(col("doc_id"), col("corpus_doc_id"), col("band"))
  }

  /** Streaming admission control: the curation pipeline's row-local
    * stages — quality gates, language consistency, eval-overlap probe —
    * as STATELESS column expressions over incoming documents. No keyed
    * state, no watermark, no output-mode constraints: every flag is
    * decidable from the row itself plus broadcast-sized side data, so
    * this runs at ingest line rate at any scale. (The one corpus-global
    * admission stage, near-dup banding, is [[nearDupFlags]]; the
    * corpus-global canonicalization stages are inherently batch.)
    *
    * The language argmax is restated in-row: per-language marker-hit
    * counts via filter() over the token array, argmax with lexicographic
    * tie-break as an ordered when-chain — exactly the semantics of the
    * batch [[graft.functions.TextFunctions.langPredictions]]
    * (StreamingMultimodalSpec pins the parity). The decontamination
    * probe is one array_intersect against the eval-set gram hashes
    * passed as a literal (eval suites are MBs by nature — the same
    * broadcast argument as batch [[graft.dedup.Dedup.decontaminate]]).
    * Thresholds come from [[graft.pipelines.TrainingPipeline]] so batch
    * and stream agree by construction. */
  def curationFlags(docsStream: DataFrame, evalHashes: Array[Long]): DataFrame = {
    import graft.dedup.Dedup
    import graft.pipelines.TrainingPipeline
    graft.functions.ShingleExpressions.register(docsStream.sparkSession)
    val langs = graft.functions.TextFunctions.Markers
    val hitCol = (ws: Seq[String]) => {
      val inList = ws.map(w => s"'$w'").mkString(", ")
      expr(s"size(filter(tks, t -> t IN ($inList)))")
    }
    val withHits = docsStream
      .withColumn("tks", split(trim(lower(col("text"))), "\\s+"))
      .withColumns(langs.map { case (l, ws) => s"hits_$l" -> hitCol(ws) }.toMap)
    val best = greatest(langs.map { case (l, _) => col(s"hits_$l") }: _*)
    // ordered when-chain = lexicographically-smallest argmax (Markers is
    // sorted by language code)
    val pred = langs.foldLeft(when(best === 0, lit("und"))) {
      case (acc, (l, _)) => acc.when(col(s"hits_$l") === best, lit(l))
    }
    val spaceBp = floor((length(col("text")) -
      length(regexp_replace(col("text"), " ", ""))) * lit(10000) /
      length(col("text")).cast("double")).cast("long")
    withHits
      .withColumn("predicted", pred)
      .withColumn("hs", {
        // lockstep with batch decontaminate: eval hashes are built over
        // the NFC→lower canonical text (Dedup.canonText), so the stream
        // probe must shingle the same bytes
        graft.functions.NormalizeExpressions.register(docsStream.sparkSession)
        graft.functions.ShingleExpressions.shingleSet(
          lower(graft.functions.NormalizeExpressions.nfc(col("text"))),
          Dedup.DecontamK, 15, Dedup.P, "md5")
      })
      .withColumn("n_hit",
        size(array_intersect(col("hs"), typedLit(evalHashes))).cast("long"))
      .select(col("doc_id"),
        (length(col("text")) >= TrainingPipeline.MinChars &&
          spaceBp <= TrainingPipeline.MaxSpaceBp).as("q_keep"),
        col("predicted"),
        (col("predicted") === col("lang") || col("predicted") === "und").as("l_keep"),
        col("n_hit"),
        (col("doc_id") % Dedup.DecontamEvalMod =!= 0 &&
          col("n_hit") < Dedup.DecontamMinHits).as("c_keep"))
  }

  /** Stream-stream interval join: attribute each purchase to the same
    * user's views in the preceding hour. Both sides carry watermarks and
    * the join condition bounds event time in BOTH directions, so Spark
    * can expire buffered rows — state is O(events within the interval),
    * not O(stream). This is the canonical two-stream correlation shape
    * (impression↔click, order↔payment); an unbounded-condition
    * stream-stream join would grow state forever and is the thing to
    * never ship at 100 TB/day. */
  def purchaseAttribution(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value").as("p_value"))
      .withWatermark("p_ts", "1 hour")
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", "2 hours")
    purchases.join(views,
        col("p_user") === col("v_user") &&
          col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("v_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("view_id"), col("p_ts"), col("v_ts"), col("p_value"))
  }

  /** Left-outer variant of [[purchaseAttribution]]: every purchase is
    * emitted — matched ones per qualifying view, unattributed ones ONCE
    * with a null view — so downstream revenue accounting never loses a
    * purchase to missing impressions. The null row for an unmatched
    * purchase is emitted only when the watermark passes the end of its
    * match interval (no earlier view can still arrive), which is exactly
    * the state-eviction point — outer results cost no extra state over
    * the inner join, they ride the same bounded buffers. Spark requires
    * the outer (purchase) side watermark + the two-sided time bound for
    * precisely this reason: null emission is a watermark decision, and an
    * unbounded condition would make it undecidable. */
  def purchaseAttributionLeftOuter(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value").as("p_value"))
      .withWatermark("p_ts", "1 hour")
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", "2 hours")
    purchases.join(views,
        col("p_user") === col("v_user") &&
          col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("v_ts") <= col("p_ts"),
        "left_outer")
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("view_id"), col("p_ts"), col("v_ts"), col("p_value"))
  }

  /** Drain a streaming DataFrame through a memory sink synchronously
    * (local verification harness; production would writeStream to a real
    * sink with a trigger). */
  def drainToMemory(df: DataFrame, name: String,
                    mode: OutputMode = OutputMode.Append): DataFrame = {
    val q = df.writeStream
      .format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(name)
  }
}
