package graft

/** Partition-count invariance: the property that makes a result trustworthy
  * on a 1000-executor cluster is that it does not depend on HOW the data
  * was split. Every class of nondeterminism that creeps into distributed
  * plans — float summation order, first()/collect_list order, limits
  * without a total order, per-partition state in iterative loops — shows
  * up as a diff when the same query runs under a different shuffle
  * partitioning. This spec pins a representative slice of the surface:
  * window/sessionization state, dedup band joins, iterative label
  * propagation, k-means training, as-of joins, and packing.
  *
  * Rows are compared as sorted multisets so legitimate tie reordering in
  * the output `orderBy` doesn't mask a real value diff.
  */
class InvarianceSpec extends SparkTestBase {

  private val queries = Seq(
    "a_sessionize", "d_minhash_lsh", "d_lsh_jaccard", "d_dup_clusters",
    "w_topk_per_group", "j_asof_last_view", "t_pack_sequences",
    "e_retention", "s_kmeans_ivf", "q1_pricing_summary", "j_salted_type",
    // exact-integer boundary predicates (min/max/fraction thresholds) and
    // multi-stage trained artifacts must also survive repartitioning
    "q2_min_cost_supplier", "q11_important_parts", "q15_top_supplier",
    "q16_supplier_counts", "s_pq_topk", "t_pipeline_audit",
    "d_ngram_jaccard", "w_resample_locf", "j_fuzzy_names", "t_dq_audit",
    // round-5 additions: interval building, chunk fan-out, df/tf ranking,
    // frozen-classifier integer logit, Morton keys, KMV sketches
    "w_scd2_intervals", "t_chunk_docs", "t_doc_keywords",
    "t_quality_classifier", "s_zorder_key", "a_kmv_overlap",
    "j_train_examples",
    // round-7 retrieval/selection family: both float scorers fold their
    // term/bucket contributions in sorted order, so even the libm paths
    // must be bit-identical under any partitioning
    "s_bm25_topk", "t_dsir_weights", "s_hybrid_rrf", "s_retrieval_metrics",
    "t_shard_shuffle", "j_target_encode", "e_sliding_actives",
    // round-8: the persisted rare-gram lifecycle (build+upsert+serve must
    // land identical content under any partitioning), the perplexity
    // integer core, and snapshot-pinned PQ serving
    "d_ngram_incremental", "t_perplexity_core", "s_pq_topk_versioned",
    "t_curriculum_order")

  private def runAt(q: String, parts: Int): Seq[String] =
    withSessionConf("spark.sql.shuffle.partitions" -> parts.toString) {
      SparkEntry.queries(q)(spark, sfDir).collect()
        .map(_.toString).toSeq.sorted
    }

  for (q <- queries)
    test(s"$q: identical results at 3 and 17 shuffle partitions") {
      val a = runAt(q, 3)
      val b = runAt(q, 17)
      assert(a.size == b.size, s"$q row count varies with partitioning")
      a.zip(b).zipWithIndex.find { case ((x, y), _) => x != y }.foreach {
        case ((x, y), i) => fail(s"$q row $i differs:\n  p3 : $x\n  p17: $y")
      }
    }
}
