package graft

import org.apache.spark.sql.functions._

/** The salted forms must return exactly the rows/values of the plain
  * forms they replace — correctness first, skew-spreading is a plan
  * property. The synthetic input has a genuinely hot key (90% of rows).
  */
class SkewSpec extends SparkTestBase {
  import graft.ops.Skew
  import scala.jdk.CollectionConverters._

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

  test("AQE splits the skewed partition at runtime (skew=true in the SMJ)") {
    // The runtime complement of manual salting: with thresholds scaled to
    // test-sized data, AQE detects that key 0's partition dwarfs the
    // median and splits it into multiple tasks — the mechanism that at
    // 100 TB absorbs moderate skew with no query rewrite at all (manual
    // salting stays for the extreme tail).
    import spark.implicits._
    withSessionConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      val probe = spark.range(200000).select(
        when(col("id") < 180000, 0L).otherwise(col("id") % 97).as("k"),
        col("id").as("row_id"))
      val build = spark.range(100).select(col("id").as("k"),
        (col("id") * 7).as("label"))
      val joined = probe.join(build, "k")
      // execute THIS dataframe (count() would plan its own execution and
      // leave joined's adaptive plan unfinalized)
      val n = joined.toLocalIterator().asScala.length
      assert(n == 200000) // every key (hot 0, tail 0..96) matches
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE must mark the skewed join side:\n${plan.take(1500)}")
    }
  }
}
