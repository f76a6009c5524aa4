package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Num._

/** Window-function operators (SURVEY.md §2.5).
  *
  * Reference shapes: top-1/top-k per group (W4-W6: `nlargest`,
  * `sort+tail(1)` in eppa_analysis.ipynb cells 5,12; movement_stats cell
  * 19), lag-difference derivatives (W1: normalize.py:67-81), rolling means
  * (W2: movement_stats cell 2), grouped transforms (A2).
  *
  * Scale: each window shuffles once on its partition keys; consecutive
  * windows over the same keys reuse the exchange (Catalyst
  * EnsureRequirements), so we keep one canonical key order per query.
  */
object Windows {

  /** W4/W6: top-3 customers per nation by account balance. */
  def topkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // (value DESC, id ASC) — the canonical deterministic ranking; in
    // extension-installed sessions plans.RewriteWindowTopK turns this
    // window into the mixed-direction bounded-heap aggregate
    // (functions.TopKOrdered), so the oracle hash also gates that path
    val w = Window.partitionBy($"c_nationkey")
      .orderBy($"c_acctbal".desc, $"c_custkey")
    Tables.customer(spark, dir)
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"c_nationkey", $"rank", $"c_custkey", $"c_acctbal")
      .orderBy($"c_nationkey", $"rank")
  }

  val topkSql: String =
    """SELECT c_nationkey, rank, c_custkey, c_acctbal FROM (
      |  SELECT c_nationkey, c_custkey, c_acctbal,
      |    row_number() OVER (PARTITION BY c_nationkey
      |                       ORDER BY c_acctbal DESC, c_custkey) AS rank
      |  FROM customer) t
      |WHERE rank <= 3
      |ORDER BY c_nationkey, rank""".stripMargin

  /** W1: lag-difference derivative — per-user inter-event gap in seconds
    * (the discrete-derivative pattern of normalize.py:67-81, where
    * velocity = diff(x)/deltaT over W(gameId,playId,nflId; frameId)). */
  def lagDiff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag($"ts", 1).over(w))
      .withColumn("gap_sec",
        ($"ts".cast("double") - $"prev_ts".cast("double")).cast("long"))
      .filter($"prev_ts".isNotNull)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_gaps"),
           sum($"gap_sec").as("total_gap_sec"),
           max($"gap_sec").as("max_gap_sec"))
      .orderBy($"user_id")
  }

  // epoch_ns preserves full nanosecond precision in DuckDB; Spark truncates
  // parquet ns → micros, so both sides floor the *difference* at whole
  // seconds via the same subtraction-then-truncate order.
  val lagDiffSql: String =
    """SELECT user_id, count(*) AS n_gaps,
      |  CAST(sum(gap_sec) AS BIGINT) AS total_gap_sec, max(gap_sec) AS max_gap_sec
      |FROM (
      |  SELECT user_id,
      |    CAST(FLOOR(epoch_us(ts) / 1000000.0
      |         - epoch_us(lag(ts, 1) OVER w) / 1000000.0) AS BIGINT) AS gap_sec,
      |    lag(ts, 1) OVER w AS prev_ts
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) t
      |WHERE prev_ts IS NOT NULL
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** W2: rolling mean over a row frame — 5-event trailing average of
    * `value` per user (movement_stats cell 2's rolling(20).mean()). */
  def rollingMean(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(-4, 0)
    Tables.events(spark, dir)
      .withColumn("rolling_sum_micros", sum(micros($"value")).over(w))
      .withColumn("n_in_frame", count(lit(1)).over(w))
      .select($"event_id", $"user_id",
        ($"rolling_sum_micros" / 1e6 / $"n_in_frame").as("rolling_avg"))
      .orderBy($"event_id")
  }

  val rollingMeanSql: String =
    s"""SELECT event_id, user_id,
       |  (sum(${sqlMicros("value")}) OVER w / 1000000.0)
       |    / (count(*) OVER w) AS rolling_avg
       |FROM events
       |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
       |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
       |ORDER BY event_id""".stripMargin

  /** W5 + A2: last event per user with that user's lifetime spend attached
    * (grouped transform = aggregate over a whole-partition window). */
  def lastPerGroup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byRecency = Window.partitionBy($"user_id")
      .orderBy($"ts".desc, $"event_id".desc)
    val whole = Window.partitionBy($"user_id")
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(byRecency))
      .withColumn("lifetime_micros", sum(micros($"value")).over(whole))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id".as("last_event_id"),
        $"event_type".as("last_type"),
        ($"lifetime_micros" / 1e6).as("lifetime_value"))
      .orderBy($"user_id")
  }

  val lastPerGroupSql: String =
    s"""SELECT user_id, last_event_id, last_type, lifetime_value FROM (
       |  SELECT user_id, event_id AS last_event_id, event_type AS last_type,
       |    row_number() OVER (PARTITION BY user_id
       |                       ORDER BY ts DESC, event_id DESC) AS rn,
       |    (sum(${sqlMicros("value")}) OVER (PARTITION BY user_id))
       |      / 1000000.0 AS lifetime_value
       |  FROM events) t
       |WHERE rn = 1
       |ORDER BY user_id""".stripMargin
}
