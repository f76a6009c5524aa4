package graft

import org.apache.spark.sql.functions._

/** The salted forms must return exactly the rows/values of the plain
  * forms they replace — correctness first, skew-spreading is a plan
  * property. The synthetic input has a genuinely hot key (90% of rows).
  */
class SkewSpec extends SparkTestBase {
  import graft.ops.Skew

  private def skewed() = {
    import spark.implicits._
    // key 0 holds 9000 rows; keys 1..9 hold 100 each
    spark.range(10000).select(
      when(col("id") < 9000, 0L).otherwise((col("id") % 9) + 1).as("k"),
      (col("id") % 977).as("v"),
      col("id").as("row_id"))
  }

  test("salted distinct-count equals plain countDistinct") {
    val df = skewed()
    val plain = df.groupBy("k").agg(count_distinct(col("v")).as("n_distinct"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCountDistinct(df, col("k"), col("v"), salts = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    // and the hot key's state really did split across buckets
    val buckets = df.filter(col("k") === 0)
      .select(pmod(xxhash64(col("v")), lit(8)).as("s")).distinct().count()
    assert(buckets > 1)
  }

  test("salted join equals the plain inner join") {
    import spark.implicits._
    val probe = skewed()
    val build = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (5L, "c"))
      .toDF("k", "label")
    val plain = probe.join(build, "k")
      .select("row_id", "label").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Skew.saltedJoin(probe, build, "k", col("row_id"), salts = 8)
      .select("row_id", "label").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted == plain)
    assert(salted.size > 9000, "hot key rows must survive the salting")
  }
}
