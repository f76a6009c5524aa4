package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Num._

/** MERGE INTO semantics as a composable DataFrame operator.
  *
  * The reference's checkpointed jobs overwrite whole outputs
  * (play_eppa_cpu.py's per-play result trees); a warehouse-shaped engine
  * also needs the row-level form — MERGE with ordered WHEN MATCHED
  * [AND cond] THEN UPDATE/DELETE and WHEN NOT MATCHED THEN INSERT
  * clauses, the statement Delta/Iceberg users run for upserts.
  *
  * Plan shape: ONE full-outer equi-join on the merge key plus a per-row
  * action decision — no second pass, no driver loop. First-true-wins
  * clause order is compiled into a single `when` chain (standard MERGE
  * clause semantics), so the whole decision stays inside whole-stage
  * codegen. At 100 TB the join is the usual story: broadcast when the
  * source is batch-sized, sort-merge on co-bucketed tables otherwise —
  * Catalyst picks per stats, nothing here forces a shape. Partition-
  * selective physical application of the same semantics (rewrite only
  * touched files) is [[graft.sources.Store.upsertPartitions]] /
  * [[graft.sources.VersionedStore]]'s job; this operator is the LOGICAL
  * result those sinks must agree with.
  */
object Merge {

  /** One WHEN MATCHED clause: first clause (in sequence order) whose
    * `cond` holds wins. `delete` drops the row; otherwise `set` overrides
    * the named target columns (unnamed columns keep the target value). */
  case class Matched(cond: Column, delete: Boolean = false,
                     set: Map[String, Column] = Map.empty)

  /** MERGE `source` into `target` on `target(keyT) == source(keyS)`.
    *
    * - matched rows: first true [[Matched]] clause applies (update or
    *   delete); none true → row unchanged.
    * - source-only rows: `insert` projection, or dropped if None.
    * - target-only rows: unchanged.
    *
    * Returns the post-merge table with exactly the target's columns.
    * Column references inside `set`/`insert` must use the join-side
    * prefixes `t.`/`s.` (the DataFrames are aliased). */
  def mergeInto(target: DataFrame, source: DataFrame,
                keyT: String, keyS: String,
                matched: Seq[Matched],
                insert: Option[Map[String, Column]]): DataFrame = {
    require(!(target.columns ++ source.columns).exists(Set("__t", "__s", "__action")),
      "mergeInto reserves the __t/__s/__action column names")
    val t = target.withColumn("__t", lit(true)).alias("t")
    val s = source.withColumn("__s", lit(true)).alias("s")
    val joined = t.join(s, col(s"t.$keyT") === col(s"s.$keyS"), "full_outer")
    val isMatched = col("t.__t").isNotNull && col("s.__s").isNotNull
    val srcOnly = col("t.__t").isNull
    // action index: -2 insert, -1 keep, i = matched clause i
    val action = matched.zipWithIndex.foldLeft(
      when(srcOnly, lit(-2))) { case (acc, (m, i)) =>
        acc.when(isMatched && m.cond, lit(i))
      }.otherwise(lit(-1))
    val dropped = matched.zipWithIndex.collect { case (m, i) if m.delete => i }
    val acted = joined.withColumn("__action", action)
    val afterDelete =
      if (dropped.isEmpty) acted
      else acted.filter(!col("__action").isin(dropped: _*))
    val kept =
      if (insert.isEmpty) afterDelete.filter(col("__action") =!= -2)
      else afterDelete
    val outCols = target.columns.map { c =>
      val base = when(col("__action") === -2,
          insert.map(_.getOrElse(c, lit(null))).getOrElse(lit(null)))
      matched.zipWithIndex.foldLeft(base) { case (acc, (m, i)) =>
        if (m.delete) acc
        else acc.when(col("__action") === i, m.set.getOrElse(c, col(s"t.$c")))
      }.otherwise(col(s"t.$c")).as(c)
    }
    kept.select(outCols: _*)
  }

  /** Planted not-matched source keys: real custkeys shifted far past the
    * table's id range, so INSERT rows exist deterministically on both
    * engines (the planting device `d_semantic_dedup` uses). */
  val MergeNewBase = 10000000L
  val MergePlantLimit = 100L

  /** Matched rows with at most this many orders are deleted — low enough
    * to be a plausible dormancy rule, high enough that the clause FIRES
    * at every test SF (34 deletes at sf0.001, 331 at sf0.01). */
  val MergeDeleteMaxOrders = 7L

  /** `s_merge_upsert`: MERGE per-customer order stats into `customer` —
    * low-activity customers (≤ [[MergeDeleteMaxOrders]] orders) are
    * deleted, the rest get an exact-integer balance credit, planted
    * unseen keys insert as new rows, order-less customers pass through
    * untouched. All arithmetic is integer micros with a single trailing
    * double division, so the oracle hash gate is exact ([[Num]]'s
    * device). Exercises every clause class of [[mergeInto]]
    * end-to-end. */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src0 = Tables.orders(spark, dir)
      .groupBy($"o_custkey".as("k"))
      .agg(count(lit(1)).as("n_orders"),
           sum(micros($"o_totalprice")).as("tm"))
    val planted = src0.filter($"k" < MergePlantLimit)
      .select(($"k" + MergeNewBase).as("k"), $"n_orders", $"tm")
    val source = src0.unionAll(planted)
    val credit = expr("s.tm DIV 100")
    mergeInto(Tables.customer(spark, dir), source, "c_custkey", "k",
      Seq(
        Matched(col("s.n_orders") <= MergeDeleteMaxOrders, delete = true),
        Matched(lit(true), set = Map(
          "c_acctbal" ->
            ((micros(col("t.c_acctbal")) + credit) / lit(1000000.0))))),
      insert = Some(Map(
        "c_custkey" -> col("s.k"),
        "c_name" -> concat(lit("NEW#"), col("s.k").cast("string")),
        "c_nationkey" -> (col("s.k") % 25).cast("int"),
        "c_acctbal" -> (credit / lit(1000000.0)),
        "c_mktsegment" -> lit("MERGED"))))
      .orderBy("c_custkey")
  }

  val mergeUpsertSql: String =
    s"""WITH src0 AS (
       |  SELECT o_custkey AS k, count(*) AS n_orders,
       |         sum(${sqlMicros("o_totalprice")}) AS tm
       |  FROM orders GROUP BY 1),
       |src AS (
       |  SELECT * FROM src0
       |  UNION ALL
       |  SELECT k + $MergeNewBase, n_orders, tm FROM src0
       |  WHERE k < $MergePlantLimit),
       |m AS (
       |  SELECT c.*, s.k, s.n_orders, s.tm,
       |    CASE WHEN c.c_custkey IS NULL THEN 'insert'
       |         WHEN s.k IS NULL THEN 'keep'
       |         WHEN s.n_orders <= $MergeDeleteMaxOrders THEN 'delete'
       |         ELSE 'update' END AS action
       |  FROM customer c FULL OUTER JOIN src s ON c.c_custkey = s.k)
       |SELECT
       |  CASE WHEN action = 'insert' THEN k ELSE c_custkey END AS c_custkey,
       |  CASE WHEN action = 'insert' THEN 'NEW#' || CAST(k AS VARCHAR)
       |       ELSE c_name END AS c_name,
       |  CAST(CASE WHEN action = 'insert' THEN k % 25
       |            ELSE c_nationkey END AS INTEGER) AS c_nationkey,
       |  CASE WHEN action = 'insert' THEN (tm // 100) / 1000000.0
       |       WHEN action = 'update'
       |         THEN (${sqlMicros("c_acctbal")} + tm // 100) / 1000000.0
       |       ELSE c_acctbal END AS c_acctbal,
       |  CASE WHEN action = 'insert' THEN 'MERGED'
       |       ELSE c_mktsegment END AS c_mktsegment
       |FROM m WHERE action <> 'delete'
       |ORDER BY c_custkey""".stripMargin
}
