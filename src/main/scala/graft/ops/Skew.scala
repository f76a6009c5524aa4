package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Num._

/** Skew mitigation utilities — the two patterns that keep a 100 TB job
  * alive when one key holds a disproportionate share of the rows (a viral
  * user, an empty-string key, a default value):
  *
  *  - Aggregations with algebraic combiners (count/sum/min/max) don't
  *    need salting: partial aggregation already collapses each partition
  *    before the shuffle. The aggregation that DOES die on a hot key is
  *    distinct-count, because every distinct value of the hot key lands
  *    on one reducer. [[saltedCountDistinct]] splits it.
  *  - Joins against a hot key send every probe row to one task.
  *    [[saltedJoin]] spreads them by replicating the build side.
  *
  * AQE's skew-join splitting handles sort-merge cases adaptively at
  * runtime; these explicit forms are for when the skew is known and the
  * plan must be deterministic (or the join is hash-based).
  */
object Skew {

  /** Distinct-count per key that survives a hot key: stage 1 groups by
    * (key, salt) where salt = hash(value) mod `salts` — each distinct
    * value maps to exactly ONE salt bucket, so per-bucket distinct counts
    * sum to the exact global distinct count, while the hot key's state
    * splits across `salts` reducers. Both stages map-side combine. */
  def saltedCountDistinct(df: DataFrame, key: Column, value: Column,
                          salts: Int, out: String = "n_distinct"): DataFrame =
    df.groupBy(key.as("__key"), pmod(xxhash64(value), lit(salts)).as("__salt"))
      .agg(count_distinct(value).as("__nd"))
      .groupBy(col("__key"))
      .agg(sum("__nd").as(out))

  /** Broadcast-averse salted equi-join: every build-side (right) row is
    * replicated `salts` times with salt 0..salts-1; each probe-side row
    * picks ONE deterministic pseudo-random salt, so the hot key's probe
    * rows spread across `salts` tasks instead of one. Exact same rows as
    * the plain join (inner, single-key).
    *
    * `probeSaltSource` must vary within a key (any per-row column works;
    * a row id is ideal) — constant values would re-concentrate the key. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 probeSaltSource: Column, salts: Int): DataFrame = {
    val salted = probe.withColumn("__salt", pmod(xxhash64(probeSaltSource), lit(salts)))
    val replicated = build
      .withColumn("__salt", explode(expr(s"sequence(0, ${salts - 1})")))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Oracle-gated end-to-end use of [[saltedJoin]]: events joined to a
    * per-type dimension on `event_type` — a key with a handful of distinct
    * values, i.e. the textbook case where a shuffle join concentrates the
    * whole table on as many reducers as there are types and salting is the
    * fix. The shuffle_hash hint keeps the demonstration honest at test
    * scale (the replicated 40-row dim would otherwise broadcast, which is
    * the right call in production when the build side is small enough).
    * The oracle is the PLAIN join: salting must be invisible in the
    * result. */
  def saltedTypeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("value"), col("event_id"))
    val dim = ev.select(col("event_type")).distinct()
      .withColumn("type_len", length(col("event_type")).cast("long"))
    saltedJoin(ev, dim.hint("shuffle_hash"), "event_type", col("event_id"), 8)
      .groupBy(col("event_type"), col("type_len"))
      .agg(count(lit(1)).as("n"), exactSum(col("value")).as("total_value_micros"))
      .orderBy(col("event_type"))
  }

  val saltedTypeJoinSql: String =
    s"""WITH dim AS (
       |  SELECT DISTINCT event_type,
       |    CAST(len(event_type) AS BIGINT) AS type_len
       |  FROM events)
       |SELECT e.event_type, d.type_len, count(*) AS n,
       |  ${sqlExactSum("e.value")} AS total_value_micros
       |FROM events e JOIN dim d ON e.event_type = d.event_type
       |GROUP BY 1, 2
       |ORDER BY e.event_type""".stripMargin
}
