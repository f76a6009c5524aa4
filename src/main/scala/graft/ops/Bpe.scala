package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding TRAINING (Sennrich et al., "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016) —
  * the tokenizer-building step of an LLM data pipeline, which the
  * regex-BPE scorer (`f_bpe_tokens`) only consumes.
  *
  * Shape: the corpus collapses ONCE into a (word, freq) dictionary —
  * orders of magnitude smaller than the corpus, and the only thing the
  * loop touches. Each merge round is ONE aggregation (adjacent-pair
  * counts weighted by word freq; top pair to the driver with a count
  * DESC / pair ASC total order) plus a column-level fold that applies
  * the merge to every word's symbol array in place — no UDF, no
  * collect of the dictionary. `localCheckpoint` every few rounds keeps
  * the plan from deepening linearly with merges (the same guard the
  * dup-clustering loop uses).
  *
  * At 100 TB the corpus pass is the cost; the loop runs on the
  * dictionary (vocabulary-sized, millions of rows at web scale — still
  * cluster-trivial). */
object Bpe {

  final case class Merge(a: String, b: String)

  /** Initial symbol split: one single-character symbol per position. */
  private def charSyms(word: Column): Column =
    transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1)))

  /** Left-to-right non-overlapping application of one merge to a symbol
    * array — the standard BPE apply rule, as a codegen fold. */
  private def applyMerge(syms: Column, m: Merge): Column = {
    val merged = m.a + m.b
    aggregate(syms, array().cast("array<string>"), (acc, s) =>
      when(size(acc) > 0 && element_at(acc, -1) === m.a && s === m.b,
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
        .otherwise(concat(acc, array(s))))
  }

  /** Learn up to `nMerges` merge rules from `textCol` of `docs`. Stops
    * early when no adjacent pair repeats. Returns the ordered rules. */
  def train(docs: DataFrame, textCol: String, nMerges: Int): Seq[Merge] = {
    var dict = docs
      .select(explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(charSyms(col("word")).as("syms"), col("freq"))
      .localCheckpoint()

    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val top = dict
        // single-symbol words have no pairs — and sequence(1, 0) would
        // count DOWN ([1, 0]) rather than produce an empty list
        .filter(size(col("syms")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))"))
          .as("p"), col("freq"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("n"))
        .filter(col("n") >= 2)
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val m = Merge(top(0).getString(0), top(0).getString(1))
        merges += m
        dict = dict.select(applyMerge(col("syms"), m).as("syms"), col("freq"))
        if ((round + 1) % 8 == 0) dict = dict.localCheckpoint()
        round += 1
      }
    }
    merges.toSeq
  }

  /** Tokens-per-word of the dictionary after applying `merges` — the
    * compression measure a tokenizer build reports. */
  def avgTokensPerWord(docs: DataFrame, textCol: String, merges: Seq[Merge]): Double = {
    val syms = merges.foldLeft(charSyms(col("word")))((c, m) => applyMerge(c, m))
    docs.select(explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .select(size(syms).cast("double").as("n"))
      .agg(avg(col("n"))).head().getDouble(0)
  }
}
