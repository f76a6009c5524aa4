package graft

import org.apache.spark.sql.functions._

/** Smoke + semantic specs for the batch-1 operators at sf0.001. */
class OpsSpec extends SparkTestBase {

  test("every declared query runs and returns rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("every query has an oracle (except declared rows-only fast paths)") {
    // xxhash64 production variants have no DuckDB twin by design — the
    // driver records a rows-only check for them; their md5-parity twins
    // carry the hash gate
    // a_approx_ndv is an HLL sketch: estimates are engine-specific
    // t_freq_tokens is a Misra-Gries sketch: contents depend on merge
    // order and are not an engine-portable artifact (FreqItemsSpec pins
    // its guarantees against exact counts instead)
    // d_*_capped / d_simhash_wide are production scale knobs from the
    // round-5 rehearsal: xxhash64- or wide-hash-based, so rows-only like
    // the other fast twins (DedupSpec pins capped recall; SCALE_r5.json
    // measures them per scale)
    // d_semantic_scaled swaps the oracle-gated k-means cells for
    // corpus-scaled LSH cells (a production scale knob, like
    // d_embedding_scaled) — rows-only; DedupSpec pins its twin census
    // t_dsir_weights / s_bm25_topk(_indexed): libm-ln scoring over
    // oracle-gated integer cores (t_dsir_bins / s_bm25_core), the PSI
    // device; scalar-reference parity in DataSelectionSpec /
    // RetrievalSpec, indexed ≡ inline in PostingIndexSpec
    val rowsOnly = Set("d_minhash_lsh_fast", "d_lsh_jaccard_fast",
      "d_minhash_capped", "d_lsh_jaccard_capped", "d_simhash_wide",
      "d_embedding_capped", "d_embedding_scaled", "d_semantic_scaled",
      "d_incremental_admit_fast",
      // xxhash64 gram twin: DuckDB has no xxhash64; DedupSpec pins
      // bit-equality with the md5 path at spec scale
      "d_ngram_jaccard_fast",
      // near-dup split granularity rides LSH connected components,
      // which SQL can't replay; cohesion law gated in DataSelectionSpec
      "t_leakage_split_near",
      "a_quantiles_approx", "a_approx_ndv", "a_kmv_overlap", "t_perplexity",
      "t_freq_tokens",
      "t_dsir_weights", "s_bm25_topk", "s_bm25_topk_indexed",
      // NFC-invariant retrieval recipe: same libm-ln BM25 scores; the
      // invariance LAW (composed ≡ decomposed ranked lists, raw control
      // splits) is gated in RetrievalSpec
      "s_bm25_nfc",
      // eigensolver floats have no cross-engine identity; PcaSpec gates
      // the math against first principles
      "s_pca_project")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
    assert((rowsOnly -- SparkEntry.queries.keySet).isEmpty)
  }

  test("approx quantiles track the exact quantiles closely") {
    val exact = SparkEntry.queries("a_quantiles")(spark, sfDir)
      .select("c_mktsegment", "p50").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val approx = SparkEntry.queries("a_quantiles_approx")(spark, sfDir)
      .select("c_mktsegment", "p50").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (seg, v) =>
      assert(math.abs(approx(seg) - v) <= math.max(50.0, math.abs(v) * 0.05),
        s"$seg: approx ${approx(seg)} vs exact $v")
    }
  }

  test("fast-path dedup finds the same duplicate pairs as the md5 form") {
    // different hash family, same banding: the confirmed-dup set (high
    // Jaccard) must agree even though candidate sets may differ slightly
    val slow = SparkEntry.queries("d_lsh_jaccard")(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("is_dup") === 1)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fast = SparkEntry.queries("d_lsh_jaccard_fast")(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("is_dup") === 1)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(slow == fast, s"only-md5=${slow -- fast} only-fast=${fast -- slow}")
  }

  test("q1 aggregates are consistent") {
    val r = SparkEntry.queries("q1_pricing_summary")(spark, sfDir).collect()
    r.foreach { row =>
      val sumBase = row.getAs[Double]("sum_base_price")
      val sumDisc = row.getAs[Double]("sum_disc_price")
      val n = row.getAs[Long]("count_order")
      assert(sumDisc <= sumBase, "discounted <= base")
      assert(n > 0)
      val avgPrice = row.getAs[Double]("avg_price")
      assert(math.abs(avgPrice - sumBase / n) < 0.01)
    }
  }

  test("topk per group emits at most 3 per nation, descending") {
    val rows = SparkEntry.queries("w_topk_per_group")(spark, sfDir)
      .collect().groupBy(_.getAs[Int]("c_nationkey"))
    rows.foreach { case (_, rs) =>
      assert(rs.length <= 3)
      val bals = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("c_acctbal"))
      assert(bals.zip(bals.tail).forall { case (a, b) => a >= b })
    }
  }

  test("dedup keeps one row per distinct text") {
    val docs = Tables.documents(spark, sfDir)
    val distinctTexts = docs.select("text").distinct().count()
    val dedup = SparkEntry.queries("t_dedup_exact")(spark, sfDir)
    assert(dedup.count() == distinctTexts)
    assert(dedup.agg(sum("n_copies")).head.getLong(0) == docs.count())
  }

  test("rolling mean window is bounded by min/max of value") {
    val ev = Tables.events(spark, sfDir)
    val mn = ev.agg(min("value")).head.getDouble(0)
    val mx = ev.agg(max("value")).head.getDouble(0)
    val bad = SparkEntry.queries("w_rolling_mean")(spark, sfDir)
      .filter(col("rolling_avg") < mn - 1e-6 || col("rolling_avg") > mx + 1e-6)
    assert(bad.count() == 0)
  }

  test("interpolation gap fill: observed rows exact, fills bounded by neighbors") {
    import graft.ops.Windows
    val locf = Windows.resampleLocf(spark, sfDir)
      .withColumnRenamed("value", "locf").cache()
    val interp = Windows.resampleInterpolate(spark, sfDir).cache()
    // identical grid: same (user, day) rows, same is_observed flags
    assert(interp.count() == locf.count())
    assert(interp.join(locf, Seq("user_id", "day", "is_observed")).count()
      == locf.count(), "grid or observation flags diverge from LOCF")
    // observed rows carry the exact observation (== the LOCF value there)
    val locfVals = locf.drop("is_observed")
    val obsDiff = interp.filter(col("is_observed") === 1)
      .join(locfVals, Seq("user_id", "day"))
      .filter(col("value") =!= col("locf"))
    assert(obsDiff.count() == 0)
    // a filled row lies within [min, max] of its bracketing observations;
    // LOCF equals the left bracket, so |interp - locf| <= |v_n - v_p| and
    // interp must be weakly between the LOCF value and the next observed.
    // Verify directly against recomputed neighbours:
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("day")
    val withNext = interp.join(locfVals, Seq("user_id", "day"))
      .withColumn("next_obs", first(when(col("is_observed") === 1, col("value")),
        ignoreNulls = true).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.currentRow,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)))
    val outOfBand = withNext.filter(col("is_observed") === 0 &&
      (col("value") < least(col("locf"), col("next_obs")) - lit(1e-6) ||
        col("value") > greatest(col("locf"), col("next_obs")) + lit(1e-6)))
    assert(outOfBand.count() == 0, "an interpolated value escaped its bracket")
    // non-vacuity: the events stream actually has interior gaps
    assert(interp.filter(col("is_observed") === 0).count() > 0)
    locf.unpersist(); interp.unpersist()
  }
}
