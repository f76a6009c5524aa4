package graft.ops

import graft.Tables
import graft.functions.HashExpressions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-selection operators for pretraining curation (SURVEY.md §2.13):
  * DSIR-style importance weighting against a target distribution, and
  * deterministic epoch shuffling into training shards.
  *
  * DSIR (Data Selection via Importance Resampling, Xie et al. 2023,
  * arXiv:2302.03169) fits two hashed-bag-of-ngrams generative models —
  * one over a small trusted "target" corpus, one over the raw pool —
  * and scores every raw document by its log importance ratio
  * `Σ_b c_db · (ln p̂_target[b] − ln p̂_raw[b])`. Documents are then kept
  * top-k (or Gumbel-resampled) by that weight.
  *
  * Scale shape (the whole point of hashing the features): the model is
  * B buckets, not a vocabulary — [[dsirBins]] reduces any corpus to
  * exactly B rows, which then BROADCAST to the scoring join. Per-doc
  * feature extraction is a map-side explode with partial aggregation on
  * (doc_id, bucket); the only full shuffle is keyed on doc_id, which is
  * uniform by construction. Nothing in the pipeline is proportional to
  * vocabulary size, and no all-pairs structure exists anywhere.
  *
  * Cross-engine determinism follows the PSI precedent (Drift.psiBins):
  * the integer core — hashed bucket counts for both models — is
  * oracle-gated exactly; the `ln` step (engine-specific libm) is
  * spec-gated against an independent driver-side reference.
  */
object DataSelection {

  /** Hashed feature buckets. Real DSIR uses 10k; 512 keeps the oracle
    * table readable while exercising the identical plan shape. */
  val DsirBuckets = 512
  /** Hex digits of the md5 prefix used as the bucket hash (60 bits —
    * same convention as the dedup shingle hashes, Dedup.scala). */
  val DsirHashHex = 15
  /** Stand-in target distribution: English documents. */
  val DsirTargetLang = "en"
  /** Laplace smoothing pseudo-count for both models. */
  val DsirAlpha = 1.0
  /** Documents kept by the selection step. */
  val DsirKeep = 100

  /** Hashed unigram+bigram feature stream: one (doc_id, lang, bucket)
    * row per gram occurrence. Guarded `when` keeps Spark's descending
    * `sequence(1, 0)` from manufacturing bigrams for 1-token docs
    * (DuckDB's generate_series is empty there). */
  private def featureBuckets(spark: SparkSession, dir: String): DataFrame =
    featureBucketsOf(Tables.documents(spark, dir))

  /** [[featureBuckets]] over an arbitrary (doc_id, lang, text) frame —
    * pure stateless column expressions, so the SAME definition runs over
    * a batch table or a streaming microbatch (the streaming scoring
    * sink's parity rests on this sharing). */
  private[graft] def featureBucketsOf(docsRaw: DataFrame): DataFrame = {
    HashExpressions.register(docsRaw.sparkSession)
    graft.functions.ShingleExpressions.register(docsRaw.sparkSession)
    val docs = docsRaw
      .select(col("doc_id"), col("lang"),
        split(trim(lower(col("text"))), "\\s+").as("t"))
    // r18: bigrams via the codegen graft_bigrams kernel (empty for
    // 1-token docs by construction — the old guarded-when transform's
    // lambda evaluated interpreted per element; same strings out)
    val bigrams = graft.functions.ShingleExpressions.bigrams(col("t"))
    docs
      .select(col("doc_id"), col("lang"), explode(concat(col("t"), bigrams)).as("g"))
      .select(col("doc_id"), col("lang"),
        (HashExpressions.md5Prefix64(col("g"), DsirHashHex) % DsirBuckets).as("bucket"))
  }

  /** Oracle-gated integer core: per-bucket gram-occurrence counts for
    * the target model (lang = en) and the raw model (everything). */
  def dsirBins(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    featureBuckets(spark, dir)
      .groupBy($"bucket")
      .agg(sum(when($"lang" === DsirTargetLang, 1L).otherwise(0L)).as("target_n"),
           count(lit(1)).as("raw_n"))
      .orderBy($"bucket")
  }

  val dsirBinsSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang,
       |    string_split_regex(trim(lower(text)), '\\s+') AS t
       |  FROM documents),
       |base AS (SELECT doc_id, lang, t, len(t) AS n FROM toks),
       |uni AS (
       |  SELECT doc_id, lang, t[i] AS g
       |  FROM base, UNNEST(generate_series(1, n)) AS s(i)),
       |bi AS (
       |  SELECT doc_id, lang, t[i] || ' ' || t[i+1] AS g
       |  FROM base, UNNEST(generate_series(1, n - 1)) AS s(i)
       |  WHERE n >= 2),
       |grams AS (SELECT * FROM uni UNION ALL SELECT * FROM bi)
       |SELECT
       |  (CAST(('0x' || substring(md5(g), 1, $DsirHashHex)) AS BIGINT)
       |     % $DsirBuckets) AS bucket,
       |  CAST(count(*) FILTER (WHERE lang = '$DsirTargetLang') AS BIGINT) AS target_n,
       |  count(*) AS raw_n
       |FROM grams
       |GROUP BY 1
       |ORDER BY bucket""".stripMargin

  /** Per-document importance log-weights and the top-[[DsirKeep]]
    * selection flag. Rows-only in the oracle (libm ln); the arithmetic
    * is spec-gated against a driver-side scalar reference
    * (DataSelectionSpec).
    *
    * Plan: B-row model → broadcast; per-doc partial agg on
    * (doc_id, bucket); one doc_id-keyed shuffle; rank via a single
    * global sort of n_docs rows (the selection output — small by
    * definition; at 100 TB you'd threshold on the weight quantile
    * instead, same plan minus the window). */
  /** The (bucket, log_ratio) model table from the oracle-gated bins —
    * B rows, broadcast-sized by construction. */
  private[graft] def dsirModel(bins: DataFrame): DataFrame = {
    val b = lit(DsirBuckets.toDouble)
    val a = lit(DsirAlpha)
    // Totals are two scalars; fold them in with a window-free cross of
    // the B-row frame (stays tiny, then broadcasts).
    val totals = bins.agg(sum(col("target_n")).cast("double").as("t_total"),
                          sum(col("raw_n")).cast("double").as("r_total"))
    bins.crossJoin(broadcast(totals))
      .select(col("bucket"),
        (log((col("target_n") + a) / (col("t_total") + a * b)) -
         log((col("raw_n") + a) / (col("r_total") + a * b))).as("log_ratio"))
  }

  /** Stateless per-doc scoring of a feature frame against a FROZEN
    * model: (doc_id, weight, n_grams). Shared by the batch selection and
    * the streaming scoring sink, so the two cannot drift. The sorted
    * fold (not a partition-order `sum`) makes the double bit-identical
    * across batch/stream/shuffle postures — float + is not associative
    * (the BM25 lesson); buckets per doc are bounded by distinct grams. */
  private[graft] def scoreFeatures(fb: DataFrame, model: DataFrame): DataFrame =
    fb.groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("c"))
      .join(broadcast(model), "bucket")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("bucket"),
             (col("c") * col("log_ratio")).as("w")))).as("ws"),
           sum(col("c")).as("n_grams"))
      .withColumn("weight",
        expr("aggregate(ws, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.w)"))

  /** [[scoreFeatures]] over raw (doc_id, lang, text) rows — the form a
    * streaming microbatch scores through. */
  def dsirScore(docs: DataFrame, model: DataFrame): DataFrame =
    scoreFeatures(featureBucketsOf(docs), model)
      .select(col("doc_id"), col("weight"), col("n_grams"))

  def dsirWeights(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // tokenize/hash ONCE: the model aggregate and the per-doc counts
    // both read this frame, and without the persist each would rerun
    // the corpus-dominant explode scan (the Dedup gram-frame pattern;
    // Bench/ScaleBench clear persisted frames between queries)
    val fb = featureBuckets(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bins = fb
      .groupBy($"bucket")
      .agg(sum(when($"lang" === DsirTargetLang, 1L).otherwise(0L)).as("target_n"),
           count(lit(1)).as("raw_n"))
    val scored = scoreFeatures(fb, dsirModel(bins))
    // top-K selection WITHOUT a global window (an unpartitioned
    // row_number would sort the whole corpus in one task): limit-K is a
    // TakeOrderedAndProject — per-partition top-K, K rows to the driver
    // side of the plan — and the K winners broadcast back as a semi probe
    val winners = scored
      .orderBy($"weight".desc, $"doc_id")
      .limit(DsirKeep)
      .select($"doc_id".as("sel_id"))
    scored
      .join(broadcast(winners), $"doc_id" === $"sel_id", "left_outer")
      .select($"doc_id", $"weight", $"n_grams",
              $"sel_id".isNotNull.as("selected"))
      .orderBy($"doc_id")
  }

  /** Sampling budget for the temperature mix. */
  val MixBudget = 200L

  /** Temperature-scaled source mixing (`t_temperature_mix`): sampling
    * quotas ∝ n_source^α with α = 0.5 — the Gopher/LLaMA device that
    * flattens a source distribution so big crawls don't drown curated
    * sources. quota_s = floor(B · √n_s / Σ√n).
    *
    * Cross-engine exactness for a FLOAT formula, without integerizing:
    * IEEE-754 sqrt, ×, and ÷ are correctly rounded, so identical inputs
    * give bit-identical doubles in the JVM and DuckDB; the one
    * order-sensitive step (Σ√n) folds a source-name-sorted list with a
    * 0.0 seed on both sides — same association, same bits, same floor.
    *
    * Scale: per-source counts are one combine-friendly aggregate; the
    * source table is tiny and broadcasts; per-doc selection is the
    * salted-hash rank the stratified sampler already uses. */
  def temperatureMix(spark: SparkSession, dir: String): DataFrame = {
    HashExpressions.register(spark)
    import spark.implicits._
    val counts = Tables.documents(spark, dir)
      .groupBy($"source").agg(count(lit(1)).as("n"))
    val denom = counts
      .agg(sort_array(collect_list(struct($"source", sqrt($"n").as("w"))))
        .as("ws"))
      .select(expr("aggregate(ws, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.w)")
        .as("denom"))
    val quotas = counts.crossJoin(broadcast(denom))
      .select($"source", $"n",
        floor(lit(MixBudget.toDouble) * sqrt($"n") / $"denom")
          .cast("long").as("quota"))
    val h = HashExpressions.md5Prefix64(
      concat(lit("tmix:"), $"doc_id".cast("string")), DsirHashHex)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"h", $"doc_id")
    val picked = Tables.documents(spark, dir)
      .select($"doc_id", $"source", $"n_chars", h.as("h"))
      .withColumn("rk", row_number().over(w))
      .join(broadcast(quotas), "source")
      .filter($"rk" <= $"quota")
    val sel = picked.groupBy($"source")
      .agg(count(lit(1)).as("n_selected"), sum($"n_chars").as("sel_chars"))
    // LEFT join from quotas: a zero-quota source still reports its row
    // (n_selected 0, null chars), mirrored exactly by the oracle SQL
    quotas.join(sel, Seq("source"), "left_outer")
      .select($"source", $"n", $"quota",
        coalesce($"n_selected", lit(0L)).as("n_selected"), $"sel_chars")
      .orderBy($"source")
  }

  val temperatureMixSql: String =
    s"""WITH counts AS (
       |  SELECT source, count(*) AS n FROM documents GROUP BY 1),
       |denom AS (
       |  SELECT list_reduce(
       |    list_prepend(CAST(0.0 AS DOUBLE),
       |      list(sqrt(n) ORDER BY source)), (acc, x) -> acc + x) AS denom
       |  FROM counts),
       |quotas AS (
       |  SELECT source, n,
       |    CAST(floor($MixBudget.0 * sqrt(n) / denom) AS BIGINT) AS quota
       |  FROM counts, denom),
       |ranked AS (
       |  SELECT doc_id, source, n_chars,
       |    row_number() OVER (PARTITION BY source ORDER BY
       |      CAST(('0x' || substring(md5('tmix:' || CAST(doc_id AS VARCHAR)),
       |        1, $DsirHashHex)) AS BIGINT), doc_id) AS rk
       |  FROM documents),
       |picked AS (
       |  SELECT ranked.* FROM ranked JOIN quotas USING (source)
       |  WHERE rk <= quota)
       |SELECT quotas.source AS source, n, quota,
       |  count(picked.doc_id) AS n_selected,
       |  CAST(sum(picked.n_chars) AS BIGINT) AS sel_chars
       |FROM quotas LEFT JOIN picked USING (source)
       |GROUP BY 1, 2, 3
       |ORDER BY 1""".stripMargin

  /** Curriculum phases for [[curriculumOrder]]. */
  val CurriculumPhases = 4

  /** Curriculum training order (`t_curriculum_order`): bucket the corpus
    * into [[CurriculumPhases]] quality phases — cleanest prose first, the
    * clean-first annealing schedule curriculum/data-mix papers use — and
    * give each phase a deterministic within-phase shuffle. The quality
    * signal is the integer heuristic the quality family already gates
    * (space ratio minus digit ratio, basis points — prose ranks high,
    * numeric dumps low); phases come from ntile over the total order
    * (quality DESC, doc_id), so both engines bucket identically; the
    * within-phase order is the seeded-md5 rank, folded into a per-phase
    * `order_md5` digest so the ORDER itself is oracle-checkable (the
    * [[shardShuffle]] device).
    *
    * Scale: the text scan feeds one map-only score projection; the
    * global ntile sorts only the NARROW (quality, id) rank table — at
    * corpus scale you swap it for broadcast quantile thresholds (same
    * plan minus the global sort; phases then come from a map-side
    * comparison) — and the digest collect exists only for verification:
    * the production layout is `repartitionByRange(phase)` +
    * `sortWithinPartitions(h)`, never a driver-side list. */
  /** The shared (doc_id, n_chars, q, h) scoring frame — ONE definition
    * feeds [[curriculumOrder]] and [[curriculumOrderScaled]], so the two
    * phase-assignment strategies cannot drift on the quality signal or
    * the shuffle hash (the shared-tokenizer device). */
  private def curriculumScored(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val txt = $"text"
    val denom = greatest(length(txt), lit(1))
    val nDigits = length(txt) - length(regexp_replace(txt, "[0-9]", ""))
    val nSpaces = length(txt) - length(regexp_replace(txt, " ", ""))
    val quality = (floor(nSpaces * lit(10000) / denom) -
      floor(nDigits * lit(10000) / denom)).cast("long")
    val h = md5(concat(lit("curr:"), $"doc_id".cast("string")).cast("binary"))
    Tables.documents(spark, dir)
      .select($"doc_id", $"n_chars", quality.as("q"), h.as("h"))
  }

  /** The shared per-phase census + order-digest aggregation. */
  private def curriculumDigest(withPhase: DataFrame): DataFrame =
    withPhase
      .groupBy(col("phase"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_chars")).as("total_chars"),
           min(col("q")).as("min_q"),
           max(col("q")).as("max_q"),
           md5(concat_ws(",",
             expr("transform(array_sort(collect_list(struct(h, doc_id))), x -> CAST(x.doc_id AS STRING))"))
             .cast("binary")).as("order_md5"))
      .orderBy(col("phase"))

  def curriculumOrder(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("q").desc, $"doc_id")
    curriculumDigest(curriculumScored(spark, dir)
      .withColumn("phase", ntile(CurriculumPhases).over(w)))
  }

  /** `t_curriculum_scaled`: the corpus-scale phase assignment the
    * [[curriculumOrder]] docstring promised — broadcast cut-points
    * instead of a global ntile sort, EXACTLY ntile-equal, so the gate is
    * the UNMODIFIED [[curriculumOrderSql]] (the `s_ivf_upsert` device:
    * the hash proves plan-equivalence, not just arithmetic).
    *
    * The global sort disappears because the quality score is BOUNDED BY
    * CONSTRUCTION (basis-point space-minus-digit ratio ∈ [−10000,
    * 10000]), so its exact histogram is ≤ 20,001 rows — model-sized at
    * any corpus size — and one combine-friendly `groupBy(q).count`
    * yields the exact rank of every phase boundary driver-side. A
    * boundary falling INSIDE one q-value's run needs that group's
    * s-th-smallest doc_id: one window ranks ONLY the ≤ P−1 boundary
    * groups (partitioned by q — no global sort; cost bounded by the
    * largest single-q group, the one documented degenerate-distribution
    * caveat). Phases then come from a map-side comparison against the
    * ≤ P−1 broadcast (q, doc_id) cut-points, and the digest machinery is
    * shared verbatim. DataSelectionSpec pins the census (phases
    * partition the corpus, sizes == ntile's, monotone quality floors);
    * PlanSpec pins the no-global-ntile plan shape. */
  def curriculumOrderScaled(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scored = curriculumScored(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // exact bounded histogram of the quality score, driver-side in
    // (q DESC) rank order — ≤ 20,001 rows by construction, not O(corpus)
    val hist = scored.groupBy($"q").agg(count(lit(1)).as("c"))
      .orderBy($"q".desc).as[(Long, Long)].collect()
    val n = hist.map(_._2).sum
    require(n >= CurriculumPhases, s"need at least $CurriculumPhases docs, got $n")
    // ntile sizing: the first (n mod P) tiles carry one extra row
    val base = n / CurriculumPhases
    val rem = n % CurriculumPhases
    val endRanks = (1 until CurriculumPhases).map(k =>
      (1L to k).map(i => base + (if (i <= rem) 1L else 0L)).sum)
    // walk the histogram: each boundary rank lands at a q value, either
    // exactly on a group end (pure-q cut) or s rows into a group (needs
    // that group's s-th-smallest doc_id)
    case class Cut(q: Long, intraRank: Long, wholeGroup: Boolean)
    val cuts = endRanks.map { r =>
      var cum = 0L
      val (q, c) = hist.find { case (_, c) => { cum += c; cum >= r } }.get
      Cut(q, r - (cum - c), r == cum)
    }
    val splits = cuts.filterNot(_.wholeGroup)
    // rank ONLY the boundary groups, window-partitioned by q: the s-th
    // smallest doc_id inside each — one tiny job, no global sort. Keyed
    // (q, intraRank): a heavily skewed quality distribution can land TWO
    // phase boundaries inside one q group
    val splitCutDoc: Map[(Long, Long), Long] =
      if (splits.isEmpty) Map.empty
      else {
        val wq = org.apache.spark.sql.expressions.Window
          .partitionBy($"q").orderBy($"doc_id")
        val want = splits.map(s => (s.q, s.intraRank)).toDF("q", "rk")
        scored.filter($"q".isin(splits.map(_.q): _*))
          .select($"q", $"doc_id")
          .withColumn("rk", row_number().over(wq).cast("long"))
          .join(broadcast(want), Seq("q", "rk"))
          .as[(Long, Long, Long)].collect()
          .map { case (q, rk, d) => (q, rk) -> d }.toMap
      }
    // a doc is AFTER cut k iff it sorts past (q_k, cut_doc_k) in the
    // (q DESC, doc_id ASC) total order; phase = 1 + #cuts it is after
    val phase = cuts.map { cut =>
      val cutDoc = if (cut.wholeGroup) Long.MaxValue
        else splitCutDoc((cut.q, cut.intraRank))
      when($"q" < cut.q || ($"q" === cut.q && $"doc_id" > cutDoc), 1)
        .otherwise(0)
    }.reduce(_ + _) + lit(1)
    // both driver collects (histogram, boundary-group ranks) are done —
    // release the corpus-cardinality cache NOW rather than leaking it
    // into the session (r9 finding: bench/verify are saved by the
    // runner's clearCache, a long-lived production session is not). The
    // returned digest recomputes the scored frame once, map-side over
    // the documents scan — strictly cheaper than keeping an O(corpus)
    // cache entry pinned for the session's lifetime.
    scored.unpersist(blocking = false)
    curriculumDigest(scored.withColumn("phase", phase))
  }

  val curriculumOrderSql: String =
    s"""WITH q AS (
       |  SELECT doc_id, n_chars,
       |    CAST(floor((len(text) - len(replace(text, ' ', ''))) * 10000.0
       |         / greatest(len(text), 1)) AS BIGINT)
       |    - CAST(floor(len(regexp_replace(text, '[^0-9]', '', 'g')) * 10000.0
       |           / greatest(len(text), 1)) AS BIGINT) AS q
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, n_chars, q,
       |    ntile($CurriculumPhases) OVER (ORDER BY q DESC, doc_id) AS phase,
       |    md5('curr:' || CAST(doc_id AS VARCHAR)) AS h
       |  FROM q)
       |SELECT phase, count(*) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |  min(q) AS min_q, max(q) AS max_q,
       |  md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY h, doc_id))
       |    AS order_md5
       |FROM r
       |GROUP BY 1
       |ORDER BY phase""".stripMargin

  /** Shards for the deterministic epoch shuffle. */
  val ShuffleShards = 8
  /** Seed prefix — vary per epoch for a fresh order. */
  val ShuffleSeed = "epoch0"

  private def shuffleKey(docId: Column): Column =
    md5(concat(lit(ShuffleSeed + ":"), docId.cast("string")).cast("binary"))

  /** Deterministic epoch shuffle: every document gets a pseudorandom
    * rank `md5(seed:doc_id)` and a shard `hash % S`; training readers
    * stream each shard in rank order. The per-shard `order_md5` chain
    * makes the ORDER itself oracle-checkable, not just membership.
    *
    * Scale: shard assignment is map-only; the production write is
    * `repartition(S, shard).sortWithinPartitions(h)` (see
    * DataSelectionSpec's layout test) — no global sort, no driver
    * state, rerunnable for any epoch by changing the seed. The
    * collect_list here exists only to fold the order into one digest
    * per shard for verification; it never ships document text. */
  def shardShuffle(spark: SparkSession, dir: String): DataFrame = {
    HashExpressions.register(spark)
    import spark.implicits._
    val keyed = Tables.documents(spark, dir)
      .select($"doc_id", $"n_chars",
        shuffleKey($"doc_id").as("h"),
        (HashExpressions.md5Prefix64(
          concat(lit(ShuffleSeed + ":"), $"doc_id".cast("string")),
          DsirHashHex) % ShuffleShards).as("shard"))
    keyed
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"),
           sum($"n_chars").as("total_chars"),
           md5(concat_ws(",",
             expr("transform(array_sort(collect_list(struct(h, doc_id))), x -> CAST(x.doc_id AS STRING))"))
             .cast("binary")).as("order_md5"))
      .orderBy($"shard")
  }

  val shardShuffleSql: String =
    s"""WITH k AS (
       |  SELECT doc_id, n_chars,
       |    md5('$ShuffleSeed:' || CAST(doc_id AS VARCHAR)) AS h,
       |    (CAST(('0x' || substring(
       |       md5('$ShuffleSeed:' || CAST(doc_id AS VARCHAR)), 1, $DsirHashHex))
       |       AS BIGINT) % $ShuffleShards) AS shard
       |  FROM documents)
       |SELECT shard, count(*) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |  md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY h, doc_id))
       |    AS order_md5
       |FROM k
       |GROUP BY 1
       |ORDER BY shard""".stripMargin

  /** Split-fraction boundaries in percent: [0,90) train, [90,95) val,
    * [95,100) test. */
  val SplitTrainPct = 90L
  val SplitValPct = 95L
  /** Salt for the split hash — a different salt re-deals the corpus. */
  val SplitSeed = "split-v1"

  /** Leakage-safe train/val/test split (`t_leakage_split`): the naive
    * per-document hash split ([[graft.ops.TextOps]] T6 device) leaks —
    * two byte-identical copies of one document can land in train AND
    * test, and the eval score then "tests" memorized training text. Here
    * the split decision hashes the GROUP, not the member: exact-dup
    * groups (md5 of the text) take their canonical id (min doc_id), the
    * canonical id hashes to a percent bucket, and every member inherits
    * the group's split. By construction no exact-dup pair ever crosses a
    * split boundary; [[leakageSplitClustered]] lifts the same rule to
    * NEAR-dup clusters (connected components of the LSH dup graph),
    * which SQL can't replay — that variant ships rows-only with the
    * cohesion law spec-gated.
    *
    * Scale shape: one map-side-combinable aggregate on the text hash
    * (min — no text ever shuffles, just (hash, id) pairs) and one
    * equi-join of the same narrow keys back to the corpus; the split
    * itself is a map-only expression. A pathological single text
    * duplicated 10⁹ times makes one hot hash key — the agg absorbs it
    * map-side, the join-back is the standard AQE skew-join case. */
  def leakageSplit(spark: SparkSession, dir: String): DataFrame = {
    HashExpressions.register(spark)
    import spark.implicits._
    val keyed = Tables.documents(spark, dir)
      .select($"doc_id", md5($"text".cast("binary")).as("k"))
    val canon = keyed.groupBy($"k").agg(min($"doc_id").as("canon_id"))
    val bucket = HashExpressions.md5Prefix64(
      concat(lit(SplitSeed + ":"), $"canon_id".cast("string")), DsirHashHex) % 100
    keyed.join(canon, "k")
      .select($"doc_id", $"canon_id",
        when(bucket < SplitTrainPct, "train")
          .when(bucket < SplitValPct, "val")
          .otherwise("test").as("split"))
      .orderBy($"doc_id")
  }

  val leakageSplitSql: String =
    s"""WITH keyed AS (
       |  SELECT doc_id, md5(text) AS k FROM documents),
       |canon AS (SELECT k, min(doc_id) AS canon_id FROM keyed GROUP BY k),
       |b AS (
       |  SELECT doc_id, canon_id,
       |    CAST(('0x' || substring(
       |      md5('$SplitSeed:' || CAST(canon_id AS VARCHAR)), 1, $DsirHashHex))
       |      AS BIGINT) % 100 AS pct
       |  FROM keyed JOIN canon USING (k))
       |SELECT doc_id, canon_id,
       |  CASE WHEN pct < $SplitTrainPct THEN 'train'
       |       WHEN pct < $SplitValPct THEN 'val'
       |       ELSE 'test' END AS split
       |FROM b
       |ORDER BY doc_id""".stripMargin

  /** Per-source cap size. */
  val DomainCapK = 25

  /** Per-source document cap (`t_domain_cap`) — the RefinedWeb/CCNet
    * domain-diversity stage: no source (site, domain, feed) may
    * contribute more than [[DomainCapK]] documents, and the survivors are
    * the most prose-like ones (space-ratio basis points — the
    * qualityScore heuristic — descending, doc_id tie-break). Without a
    * cap, one boilerplate-heavy megasite dominates the mixture and the
    * model learns its template.
    *
    * Scale shape: sources are LOW-cardinality relative to the corpus, so
    * the textbook row_number window is the worst skew case — every row of
    * the hottest source lands on one reducer. The rank order is therefore
    * folded into ONE ascending BIGINT ((10000 − prose_bp)·2⁴³ + doc_id —
    * exact while doc_id < 2⁴³) so the RewriteWindowTopK rule fires: a
    * k-element heap per source per map task, shuffle bounded at
    * k·partitions rows per source, nothing fully sorted. PlanSpec pins
    * the rewritten plan (no Window node); the oracle replays the
    * equivalent two-key ORDER BY. */
  def domainCap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val txt = $"text"
    val nChars = greatest(length(txt), lit(1)).cast("double")
    // long math BEFORE the multiply: length() is IntegerType and a web
    // document with > ~214k spaces overflows int at ×10000 — wrapping
    // prose_bp negative, corrupting the folded rank key, and diverging
    // from the oracle's double arithmetic
    val nSpaces = (length(txt) - length(regexp_replace(txt, " ", ""))).cast("long")
    val scored = Tables.documents(spark, dir)
      .select($"doc_id", $"source",
        floor(nSpaces * lit(10000L) / nChars).cast("long").as("prose_bp"))
      .withColumn("ck", (lit(10000L) - $"prose_bp") * lit(1L << 43) + $"doc_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"ck")
    scored
      .withColumn("src_rank", row_number().over(w))
      .filter($"src_rank" <= DomainCapK)
      .select($"doc_id", $"source", $"src_rank".cast("long").as("src_rank"),
        $"prose_bp")
      .orderBy($"source", $"src_rank")
  }

  val domainCapSql: String =
    s"""WITH scored AS (
       |  SELECT doc_id, source,
       |    CAST(floor((len(text) - len(replace(text, ' ', ''))) * 10000.0
       |         / greatest(len(text), 1)) AS BIGINT) AS prose_bp
       |  FROM documents),
       |ranked AS (
       |  SELECT doc_id, source, prose_bp,
       |    CAST(row_number() OVER (PARTITION BY source
       |      ORDER BY prose_bp DESC, doc_id) AS BIGINT) AS src_rank
       |  FROM scored)
       |SELECT doc_id, source, src_rank, prose_bp
       |FROM ranked WHERE src_rank <= $DomainCapK
       |ORDER BY source, src_rank""".stripMargin

  /** [[leakageSplit]] at NEAR-dup granularity (`t_leakage_split_near`,
    * rows-only): the group key is the LSH dup-graph connected component
    * ([[graft.dedup.Dedup.dupClustersFast]]'s cluster_id = component min
    * doc_id), so near-duplicates — truncations, boilerplate rewraps,
    * whitespace variants — also stay split-cohesive. Connected
    * components aren't SQL-replayable, so the oracle is the spec: no
    * cluster spans two splits, and the fractions track 90/5/5. */
  def leakageSplitClustered(spark: SparkSession, dir: String): DataFrame = {
    HashExpressions.register(spark)
    import spark.implicits._
    val clusters = graft.dedup.Dedup.dupClustersFast(spark, dir)
      .select($"doc_id", $"cluster_id")
    val bucket = HashExpressions.md5Prefix64(
      concat(lit(SplitSeed + ":"), $"cluster_id".cast("string")), DsirHashHex) % 100
    clusters
      .select($"doc_id", $"cluster_id",
        when(bucket < SplitTrainPct, "train")
          .when(bucket < SplitValPct, "val")
          .otherwise("test").as("split"))
      .orderBy($"doc_id")
  }

  /** Oracle-adjacent gate for the near-dup split (`t_leakage_split_gate`):
    * [[leakageSplitClustered]] itself ships rows-only because its
    * cluster ids come from the xxhash64 production path — but the
    * GROUP-COHESION invariant it exists for IS SQL-replayable over the
    * md5 twin: DuckDB replays the LSH dup graph (the recursive-CTE
    * connected components of `d_dup_clusters`), assigns each CLUSTER a
    * split by the same salted hash, and verifies with its own
    * independent edge join that ZERO verified-dup pairs cross a split
    * boundary. The Spark side computes the same census with a genuine
    * edge join (not by construction-from-clusters), so both engines
    * hash-agree on (per-split docs, clusters, and the cross-split pair
    * count = 0) — the leakage property itself is now a gated answer,
    * not just a spec assertion.
    *
    * Cost shape: the verified edge list and the cluster labels share ONE
    * lshJaccard pass (pairs persisted); everything downstream is
    * narrow-key joins over (doc, cluster, split) rows. */
  def leakageSplitGate(spark: SparkSession, dir: String): DataFrame = {
    HashExpressions.register(spark)
    import spark.implicits._
    val pairs = graft.dedup.Dedup.lshJaccard(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val clusters = graft.dedup.Dedup
      .dupClustersOver(spark, dir, pairs, graft.dedup.Dedup.DriverUnionFindMaxEdges)
      .select($"doc_id", $"cluster_id")
    val bucket = HashExpressions.md5Prefix64(
      concat(lit(SplitSeed + ":"), $"cluster_id".cast("string")), DsirHashHex) % 100
    val assigned = clusters
      .select($"doc_id", $"cluster_id",
        when(bucket < SplitTrainPct, "train")
          .when(bucket < SplitValPct, "val")
          .otherwise("test").as("split"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val edges = pairs.filter($"is_dup" === 1).select($"doc_a", $"doc_b")
    val cross = edges
      .join(assigned.select($"doc_id".as("doc_a"), $"split".as("split_a")), "doc_a")
      .join(assigned.select($"doc_id".as("doc_b"), $"split".as("split_b")), "doc_b")
      .agg(sum(when($"split_a" =!= $"split_b", 1L).otherwise(0L)).as("n_cross_pairs"))
      .select(coalesce($"n_cross_pairs", lit(0L)).as("n_cross_pairs"))
    assigned.groupBy($"split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"cluster_id").as("n_clusters"))
      .crossJoin(cross)
      .orderBy($"split")
  }

  val leakageSplitGateSql: String =
    s"""WITH clusters AS (${graft.dedup.Dedup.dupClustersSql}),
       |assigned AS (
       |  SELECT doc_id, cluster_id,
       |    CASE WHEN pct < $SplitTrainPct THEN 'train'
       |         WHEN pct < $SplitValPct THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM (
       |    SELECT doc_id, cluster_id,
       |      CAST(('0x' || substring(
       |        md5('$SplitSeed:' || CAST(cluster_id AS VARCHAR)), 1, $DsirHashHex))
       |        AS BIGINT) % 100 AS pct
       |    FROM clusters)),
       |pairs AS (${graft.dedup.Dedup.lshJaccardSql}),
       |cross_e AS (
       |  SELECT count(*) AS n_cross FROM pairs p
       |  JOIN assigned a ON a.doc_id = p.doc_a
       |  JOIN assigned b ON b.doc_id = p.doc_b
       |  WHERE p.is_dup = 1 AND a.split <> b.split)
       |SELECT a.split, count(*) AS n_docs,
       |  count(DISTINCT cluster_id) AS n_clusters,
       |  (SELECT CAST(n_cross AS BIGINT) FROM cross_e) AS n_cross_pairs
       |FROM assigned a
       |GROUP BY 1
       |ORDER BY split""".stripMargin
}
