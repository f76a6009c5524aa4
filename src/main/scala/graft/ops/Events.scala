package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Num._

/** Event-stream rollups (SURVEY.md §2.4 A3/A6/A7, §2.8 date functions).
  *
  * Batch form of the event-time aggregations the streaming surface
  * (graft.streaming) re-expresses with watermarks; identical grouping
  * logic so batch and stream share semantics.
  */
object Events {

  /** Daily per-type rollup: counts, exact value sums, distinct users.
    * At scale the distinct-count is the expensive part (extra shuffle);
    * partial aggregation still applies to count/sum. */
  def dailyRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(date_format($"ts", "yyyy-MM-dd").as("day"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
           exactSum($"value").as("total_value"),
           countDistinct($"user_id").as("n_users"))
      .orderBy($"day", $"event_type")
  }

  val dailyRollupSql: String =
    s"""SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
       |  count(*) AS n_events,
       |  ${sqlExactSum("value")} AS total_value,
       |  count(DISTINCT user_id) AS n_users
       |FROM events
       |GROUP BY 1, 2
       |ORDER BY day, event_type""".stripMargin

  /** A7: histogram — bucketized `value` distribution per event type.
    * Bucket arithmetic (floor((x-lo)/w)) instead of pd.cut
    * (historical-L-T.ipynb cells 13,22). */
  def valueHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .withColumn("bucket", floor($"value" / 50.0).cast("long"))
      .groupBy($"event_type", $"bucket")
      .agg(count(lit(1)).as("n"))
      .orderBy($"event_type", $"bucket")
  }

  val valueHistogramSql: String =
    """SELECT event_type, CAST(floor(value / 50.0) AS BIGINT) AS bucket,
      |  count(*) AS n
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY event_type, bucket""".stripMargin

  /** Approximate distinct users per event type (HyperLogLog++, 2% rsd)
    * alongside the exact count. At 100 TB the exact countDistinct is the
    * expensive aggregation in [[dailyRollup]] (it shuffles every distinct
    * (key, user) pair); the HLL sketch is map-side combinable and shuffles
    * one fixed-size buffer per key. Rows-only checked: sketch estimates
    * are engine-specific by nature. */
  def approxNdv(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(approx_count_distinct($"user_id", rsd = 0.02).as("approx_users"),
           countDistinct($"user_id").as("exact_users"),
           count(lit(1)).as("n_events"))
      .orderBy($"event_type")
  }

  /** Set ops U1 + A11 (HAVING): high-activity users = union of two
    * event-type slices, grouped with a post-aggregation filter. */
  def activeUsers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter($"event_type" === "purchase")
    val views = ev.filter($"event_type" === "view")
    purchases.unionByName(views)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
           exactSum($"value").as("total_value"))
      .filter($"n_events" >= 10)
      .orderBy($"user_id")
  }

  /** §2.8 JSON scalar path: extract props.k, aggregate per event type.
    * (The reference has no JSON columns; this covers the semi-structured
    * side a real event pipeline needs.) */
  def propsExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
           sum($"k").as("sum_k"),
           countDistinct($"k").as("n_distinct_k"))
      .orderBy($"event_type")
  }

  val propsExtractSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_distinct_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  val activeUsersSql: String =
    s"""SELECT user_id, count(*) AS n_events,
       |  ${sqlExactSum("value")} AS total_value
       |FROM (
       |  SELECT * FROM events WHERE event_type = 'purchase'
       |  UNION ALL
       |  SELECT * FROM events WHERE event_type = 'view') t
       |GROUP BY user_id
       |HAVING count(*) >= 10
       |ORDER BY user_id""".stripMargin
}
