package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.GraftCollectTopK
import org.apache.spark.sql.functions._

/** Bounded top-k per group as an ALGEBRAIC AGGREGATE instead of a window.
  *
  * The window form (`row_number().over(W) <= k`) shuffles EVERY row to its
  * group's reducer and sorts the whole group — at 100 TB that is the full
  * dataset through the wire for a k-row answer. The aggregate form keeps a
  * k-element bounded heap per group per map task (Spark's CollectTopK,
  * the TypedImperativeAggregate behind the pandas-API nlargest), so the
  * shuffle carries at most k rows per group per partition and no sort of
  * the full group ever happens. Same rows out (modulo ties, exactly as
  * nondeterministic as row_number's own tie order).
  *
  * graft.plans.RewriteWindowTopK applies this transformation automatically
  * to matching window plans; this object is the explicit API.
  */
object TopK {

  private def intLit(e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"expected int literal, got $other")
  }
  private def boolLit(e: Expression): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(s"expected bool literal, got $other")
  }

  def register(spark: SparkSession): Unit =
    graft.functions.Registration.registerOnce(spark, "graft_collect_top_k",
      (exprs: Seq[Expression]) => GraftCollectTopK(exprs(0),
        intLit(exprs(1)), boolLit(exprs(2))))

  /** CollectTopK's `reverse=false` keeps the k LARGEST items (it reverses
    * the heap ordering, matching pandas nlargest); `reverse=true` keeps
    * the k smallest — pinned empirically by TopKSpec. */
  def collectTopK(item: Column, k: Int, reverse: Boolean): Column =
    call_function("graft_collect_top_k", item, lit(k), lit(reverse))

  /** Top-k rows per group by `orderCol` (desc=largest-first), emitting all
    * original columns plus a 1-based `rank`. One map-side-combined
    * aggregation; ties break arbitrarily (like row_number). */
  def perGroup(df: DataFrame, groupCols: Seq[String], orderCol: String,
               k: Int, desc: Boolean = true): DataFrame = {
    register(df.sparkSession)
    val payload = struct(df.columns.map(col): _*).as("payload")
    val item = struct(col(orderCol).as("k0"), payload)
    df.groupBy(groupCols.map(col): _*)
      .agg(collectTopK(item, k, reverse = !desc).as("__topk"))
      .select(posexplode(sort_array(col("__topk"), asc = !desc))
        .as(Seq("__pos", "__item")))
      .select(col("__item.payload.*") +: Seq((col("__pos") + 1).as("rank")): _*)
  }
}
