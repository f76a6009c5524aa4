package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The bounded-heap top-k aggregate must return exactly the window form's
  * rows (the inputs below have no order-key ties, so both are fully
  * deterministic).
  */
class TopKSpec extends SparkTestBase {
  import graft.ops.TopK

  test("perGroup desc equals the row_number window form") {
    val df = Tables.customer(spark, sfDir)
    val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc)
    val expected = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("c_mktsegment", "rank", "c_custkey").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val got = TopK.perGroup(df, Seq("c_mktsegment"), "c_acctbal", 3, desc = true)
      .select("c_mktsegment", "rank", "c_custkey").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("perGroup asc equals the ascending window form") {
    val df = Tables.customer(spark, sfDir)
    val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").asc)
    val expected = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 2)
      .select("c_mktsegment", "rank", "c_custkey").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val got = TopK.perGroup(df, Seq("c_mktsegment"), "c_acctbal", 2, desc = false)
      .select("c_mktsegment", "rank", "c_custkey").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("topk aggregate plan is partial+final, no Window, no full sort") {
    val df = TopK.perGroup(Tables.customer(spark, sfDir),
      Seq("c_mktsegment"), "c_acctbal", 3)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("Window"), "must not fall back to a window")
    val objAggs = p.linesIterator.count(l =>
      l.contains("ObjectHashAggregate") || l.contains("SortAggregate"))
    assert(objAggs >= 2, s"expected partial+final typed aggregate:\n$p")
  }
}
