package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Funnel analysis: signup → first view AFTER signup → first purchase
    * AFTER that view, per user, with the stage reached. Each step is a
    * filtered min-aggregate joined back on user_id (the step predicate
    * depends on the previous step's timestamp, so it cannot fold into one
    * aggregation pass). Scale: three aggregates + joins all keyed on
    * user_id — one partitioning reused across every stage, and each step's
    * input shrinks monotonically (only converting users survive). */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_type", unix_micros($"ts").as("ts_us"))
    val s1 = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ts_us").as("t_signup"))
    val s2 = ev.filter($"event_type" === "view").join(s1, "user_id")
      .filter($"ts_us" > $"t_signup")
      .groupBy($"user_id").agg(min($"ts_us").as("t_view"))
    val s3 = ev.filter($"event_type" === "purchase").join(s2, "user_id")
      .filter($"ts_us" > $"t_view")
      .groupBy($"user_id").agg(min($"ts_us").as("t_purchase"))
    s1.join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .select($"user_id", $"t_signup", $"t_view", $"t_purchase",
        (lit(1L) + when($"t_view".isNotNull, 1L).otherwise(0L)
                 + when($"t_purchase".isNotNull, 1L).otherwise(0L)).as("stage"))
      .orderBy($"user_id")
  }

  val funnelSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
      |s1 AS (SELECT user_id, min(ts_us) AS t_signup FROM ev
      |       WHERE event_type = 'signup' GROUP BY user_id),
      |s2 AS (SELECT ev.user_id, min(ts_us) AS t_view
      |       FROM ev JOIN s1 ON ev.user_id = s1.user_id
      |       WHERE event_type = 'view' AND ts_us > t_signup
      |       GROUP BY ev.user_id),
      |s3 AS (SELECT ev.user_id, min(ts_us) AS t_purchase
      |       FROM ev JOIN s2 ON ev.user_id = s2.user_id
      |       WHERE event_type = 'purchase' AND ts_us > t_view
      |       GROUP BY ev.user_id)
      |SELECT s1.user_id, t_signup, t_view, t_purchase,
      |  CAST(1 + CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END
      |         + CASE WHEN t_purchase IS NOT NULL THEN 1 ELSE 0 END
      |       AS BIGINT) AS stage
      |FROM s1
      |LEFT JOIN s2 ON s1.user_id = s2.user_id
      |LEFT JOIN s3 ON s1.user_id = s3.user_id
      |ORDER BY s1.user_id""".stripMargin

  /** Conversion attribution: every purchase credited to the user's most
    * recent prior view/click (last-touch) and their earliest one
    * (first-touch), rolled up per conversion day × touch pair — the
    * standard marketing-attribution query, and the batch twin of what a
    * real pipeline runs continuously.
    *
    * Shape: ONE window pass per user carries both touches as
    * ignore-nulls last/first over an unbounded-preceding row frame (no
    * self-join, no as-of join — the LOCF device [[Windows]] uses for
    * resampling). The purchase filter then shrinks the stream before the
    * day-level aggregate; the only exchanges are the user_id hash and the
    * final small rollup. Ties inside a timestamp are totalized by
    * event_id, so the credited touch is deterministic on both engines. */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val touch = when($"event_type".isin("view", "click"), $"event_type")
    Tables.events(spark, dir)
      .withColumn("last_touch", last(touch, ignoreNulls = true).over(w))
      .withColumn("first_touch", first(touch, ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase" && $"last_touch".isNotNull)
      .groupBy(date_format($"ts", "yyyy-MM-dd").as("day"),
        $"last_touch", $"first_touch")
      .agg(count(lit(1)).as("n_conversions"),
           exactSum($"value").as("attributed_value"))
      .orderBy($"day", $"last_touch", $"first_touch")
  }

  val attributionSql: String =
    s"""WITH t AS (
       |  SELECT *,
       |    last_value(CASE WHEN event_type IN ('view','click')
       |                    THEN event_type END IGNORE NULLS)
       |      OVER w AS last_touch,
       |    first_value(CASE WHEN event_type IN ('view','click')
       |                     THEN event_type END IGNORE NULLS)
       |      OVER w AS first_touch
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT strftime(ts, '%Y-%m-%d') AS day, last_touch, first_touch,
       |  count(*) AS n_conversions,
       |  ${sqlExactSum("value")} AS attributed_value
       |FROM t
       |WHERE event_type = 'purchase' AND last_touch IS NOT NULL
       |GROUP BY 1, 2, 3
       |ORDER BY day, last_touch, first_touch""".stripMargin

  /** Path mining: the most common 3-step event sequences across users —
    * the "what do people actually do" query next to [[funnel]]'s "do they
    * do THIS". One lag window per user builds consecutive triples
    * in-row (no self-joins — the naive form is two self-joins on
    * adjacent ranks), then a plain count + top-k. Ties totalized by
    * (count DESC, path ASC) so the limit is deterministic on both
    * engines. Scale: one user_id exchange + one path-keyed aggregate;
    * paths are a small domain (|event_types|³), so the final agg is
    * map-side combined down to almost nothing. */
  def topPaths(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, dir)
      .withColumn("e2", lag($"event_type", 2).over(w))
      .withColumn("e1", lag($"event_type", 1).over(w))
      .filter($"e2".isNotNull)
      .select(concat_ws(">", $"e2", $"e1", $"event_type").as("path"))
      .groupBy($"path").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"path")
      .limit(25)
  }

  val topPathsSql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |    lag(event_type, 2) OVER w AS e2,
      |    lag(event_type, 1) OVER w AS e1
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT e2 || '>' || e1 || '>' || event_type AS path, count(*) AS n
      |FROM seq WHERE e2 IS NOT NULL
      |GROUP BY 1 ORDER BY n DESC, path LIMIT 25""".stripMargin

  /** Cohort retention matrix: users bucketed by the ISO week of their
    * first event (the cohort), counted in each subsequent week they were
    * active — the standard product-analytics retention triangle.
    *
    * Shape: one window over user_id computes each user's first day (no
    * self-join), then a distinct on (cohort, offset, user) feeds the cell
    * counts. Two shuffles total — user_id, then the cohort/offset pair —
    * both on keys that stay uniform at any corpus size. date_trunc('week')
    * is Monday-anchored in both Spark and DuckDB; the offset divides a
    * day difference, so no engine-specific week-of-year rules are
    * involved. */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byUser = Window.partitionBy($"user_id")
    Tables.events(spark, dir)
      .select($"user_id", to_date($"ts").as("d"))
      .withColumn("first_d", min($"d").over(byUser))
      .select($"user_id",
        date_format(date_trunc("week", $"first_d"), "yyyy-MM-dd").as("cohort_week"),
        floor(datediff($"d", $"first_d") / 7).cast("long").as("week_offset"))
      .distinct()
      .groupBy($"cohort_week", $"week_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy($"cohort_week", $"week_offset")
  }

  val retentionSql: String =
    """WITH ev AS (
      |  SELECT user_id, CAST(ts AS DATE) AS d FROM events),
      |fst AS (SELECT user_id, min(d) AS first_d FROM ev GROUP BY 1),
      |cells AS (
      |  SELECT DISTINCT ev.user_id,
      |    strftime(date_trunc('week', first_d), '%Y-%m-%d') AS cohort_week,
      |    CAST(floor(date_diff('day', first_d, d) / 7) AS BIGINT) AS week_offset
      |  FROM ev JOIN fst ON ev.user_id = fst.user_id)
      |SELECT cohort_week, week_offset, count(*) AS n_users
      |FROM cells
      |GROUP BY 1, 2
      |ORDER BY cohort_week, week_offset""".stripMargin

  /** Additive seasonal decomposition of the daily event count: per-day
    * volume split into a day-of-week seasonal component (the mean count
    * for that weekday) and a residual — the classical seasonal-mean
    * decomposition dashboards run before anomaly thresholds.
    *
    * Determinism: the weekday index is pure integer arithmetic
    * (`epoch_day % 7`, 0 = Thursday) — no engine-specific DOW
    * convention — and the seasonal mean is integer basis points
    * (`(sum·10000) div count`, all positive), so residuals are exact
    * integers in both engines.
    *
    * Scale: the event scan reduces to one row per day first (the only
    * large shuffle, keyed on day), after which the weekday window runs
    * over a frame whose size is the calendar, not the corpus. */
  def seasonalDecompose(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy(to_date($"ts").as("d"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("dow", pmod(datediff($"d", lit("1970-01-01").cast("date")), lit(7)).cast("long"))
    daily
      .withColumn("seasonal_bp",
        expr("(sum(n_events) OVER (PARTITION BY dow) * 10000) DIV count(*) OVER (PARTITION BY dow)"))
      .select(date_format($"d", "yyyy-MM-dd").as("day"), $"dow",
        $"n_events",
        $"seasonal_bp",
        ($"n_events" * 10000 - $"seasonal_bp").as("resid_bp"))
      .orderBy($"day")
  }

  /** Body shared with [[anomalyDaysSql]] (legal as a nested WITH). */
  private[graft] val seasonalDecomposeSqlBody: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d, count(*) AS n_events
      |  FROM events GROUP BY 1),
      |dowed AS (
      |  SELECT d, n_events,
      |    CAST(date_diff('day', DATE '1970-01-01', d) % 7 AS BIGINT) AS dow
      |  FROM daily)
      |SELECT strftime(d, '%Y-%m-%d') AS day, dow, n_events,
      |  CAST((sum(n_events) OVER (PARTITION BY dow) * 10000)
      |    // count(*) OVER (PARTITION BY dow) AS BIGINT) AS seasonal_bp,
      |  CAST(n_events * 10000 -
      |    (sum(n_events) OVER (PARTITION BY dow) * 10000)
      |      // count(*) OVER (PARTITION BY dow) AS BIGINT) AS resid_bp
      |FROM dowed""".stripMargin

  val seasonalDecomposeSql: String =
    seasonalDecomposeSqlBody + "\nORDER BY day"

  /** Exact 7-day rolling OLS slope of the daily count per event type
    * (`w_rolling_slope`) — the trend detector behind "is this metric
    * drifting": least squares over the trailing week, unrolled to
    * SEVEN LAGS (the EWMA device) so the whole regression is integer
    * arithmetic. With relative x = 0..6 the normal equations collapse
    * to constants (Σx = 21, Σx² = 91, denom = 7·91 − 21² = 196):
    * slope = (7·Σ(i·yᵢ) − 21·Σyᵢ) / 196, emitted in floor-micros —
    * exact integers in both engines, no float regression. Rows with an
    * incomplete frame — the first 6 days of a type, OR any frame whose
    * 7 observed rows span more than 6 calendar days (row-offset lags
    * would otherwise stretch silently across a data gap while x still
    * assumes consecutive days) — emit NULL rather than a slope fitted
    * on missing data.
    *
    * Scale: the corpus reduces to one row per (type, day) first; the
    * lag window then runs over calendar-sized data, one exchange. */
  def rollingSlope(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).as("y"))
    val w = Window.partitionBy($"event_type").orderBy($"d")
    val lags = (0 to 6).map(i => lag($"y", 6 - i).over(w).as(s"y$i"))
    val num = (0 to 6).map(i => s"${i}L * y$i").mkString(" + ")
    val sumY = (0 to 6).map(i => s"y$i").mkString(" + ")
    daily
      .select(($"event_type" +: $"d" +: lag($"d", 6).over(w).as("d6") +: lags): _*)
      .withColumn("slope_micros",
        // full frame AND contiguous calendar days: row-offset lags
        // would silently stretch the window across a gap while x still
        // assumes consecutive days — a "7-day" slope spanning 19 days
        when((0 to 6).map(i => col(s"y$i").isNotNull).reduce(_ && _) &&
             datediff($"d", $"d6") === 6,
          // DIV truncates toward zero in BOTH engines (DuckDB `//` is
          // truncation too, verified) — negative slopes stay exact
          expr(s"CAST((7 * ($num) - 21 * ($sumY)) * 1000000 DIV 196 AS BIGINT)")))
      .select($"event_type", date_format($"d", "yyyy-MM-dd").as("day"),
        $"slope_micros")
      .orderBy($"event_type", $"day")
  }

  val rollingSlopeSql: String = {
    val iy = (0 to 6).map(i => s"$i * y$i").mkString(" + ")
    val sy = (0 to 6).map(i => s"y$i").mkString(" + ")
    val lags = (0 to 6).map(i =>
      s"lag(y, ${6 - i}) OVER (PARTITION BY event_type ORDER BY d) AS y$i")
      .mkString(",\n    ")
    s"""WITH daily AS (
       |  SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS y
       |  FROM events GROUP BY 1, 2),
       |lagged AS (
       |  SELECT event_type, d, strftime(d, '%Y-%m-%d') AS day,
       |    lag(d, 6) OVER (PARTITION BY event_type ORDER BY d) AS d6,
       |    $lags
       |  FROM daily)
       |SELECT event_type, day,
       |  CASE WHEN ${(0 to 6).map(i => s"y$i IS NOT NULL").mkString(" AND ")}
       |    AND date_diff('day', d6, d) = 6
       |    THEN CAST((7 * ($iy) - 21 * ($sy)) * 1000000 // 196 AS BIGINT)
       |  END AS slope_micros
       |FROM lagged
       |ORDER BY event_type, day""".stripMargin
  }

  /** Trailing 7-day distinct actives per day (the DAU→WAU rollup):
    * every (user, day) pair replicates into the ≤7 window-end days it
    * belongs to, then one distinct count per window end.
    *
    * Scale: the fan-out is a FIXED ×7 map-side explode over the already
    * per-(user, day)-deduplicated stream — no range self-join (which
    * would be |days|× the data) and no giant window state; the distinct
    * aggregate is keyed on (window_day, user), uniform at any corpus
    * size. Window ends with no events never appear; leading days count
    * partial windows — both conventions mirrored in the oracle. */
  def slidingActives(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"user_id", to_date($"ts").as("d")).distinct()
      .select($"user_id", explode(expr("sequence(d, date_add(d, 6))")).as("wd"))
      .groupBy($"wd")
      .agg(countDistinct($"user_id").as("actives_7d"))
      .select(date_format($"wd", "yyyy-MM-dd").as("window_day"), $"actives_7d")
      .orderBy($"window_day")
  }

  /** Anomalous days by seasonal residual: flag days whose residual sits
    * more than 2σ from the mean residual — the alert rule that runs on
    * top of [[seasonalDecompose]]. The z-test is stated as an integer
    * cross-multiplication (the TPC-H Q11/Q17 device):
    * `(n·r − Σr)² > 4·(n·Σr² − (Σr)²)` ⇔ `|r − r̄| > 2σ`, so the flags
    * are exact integers in both engines — no sqrt, no float variance.
    *
    * Scale: residuals are calendar-sized (one row per day after the
    * corpus-keyed daily count), so the two-scalar aggregate and the
    * flagging pass cost nothing at any corpus size. */
  def anomalyDays(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // the squares overflow BIGINT at realistic volumes (resid_bp is
    // events×10⁴; a year of 10⁶-event days puts (n·r − Σr)² past 2⁶³,
    // where Spark would wrap silently and DuckDB would error) — so
    // every product runs in decimal(38,0), the exact-integer twin of
    // the oracle's HUGEINT; comparisons stay exact, nothing wraps
    val wide = "decimal(38,0)"
    val dec = seasonalDecompose(spark, dir)
      .select($"day", $"n_events", $"resid_bp")
    val stats = dec.agg(count(lit(1)).cast(wide).as("n"),
                        sum($"resid_bp").cast(wide).as("sr"),
                        sum($"resid_bp".cast(wide) * $"resid_bp".cast(wide))
                          .cast(wide).as("srr"))
    val dx = $"n" * $"resid_bp".cast(wide) - $"sr"
    dec.crossJoin(broadcast(stats))
      .select($"day", $"n_events", $"resid_bp",
        (dx * dx > lit(4).cast(wide) * ($"n" * $"srr" - $"sr" * $"sr"))
          .as("is_anomaly"))
      .orderBy($"day")
  }

  val anomalyDaysSql: String = {
    val inner = seasonalDecomposeSqlBody
    // HUGEINT (128-bit) mirrors the Spark side's decimal(38,0): the
    // squares would overflow BIGINT on large corpora
    s"""WITH dec AS ($inner),
       |stats AS (
       |  SELECT CAST(count(*) AS HUGEINT) AS n,
       |    CAST(sum(resid_bp) AS HUGEINT) AS sr,
       |    CAST(sum(CAST(resid_bp AS HUGEINT) * resid_bp) AS HUGEINT) AS srr
       |  FROM dec)
       |SELECT day, n_events, resid_bp,
       |  (n * resid_bp - sr) * (n * resid_bp - sr)
       |    > 4 * (n * srr - sr * sr) AS is_anomaly
       |FROM dec, stats
       |ORDER BY day""".stripMargin
  }

  val slidingActivesSql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |fan AS (
      |  SELECT user_id, d + CAST(i AS INTEGER) AS wd
      |  FROM ud, UNNEST(generate_series(0, 6)) AS s(i))
      |SELECT strftime(wd, '%Y-%m-%d') AS window_day,
      |  count(DISTINCT user_id) AS actives_7d
      |FROM fan
      |GROUP BY 1
      |ORDER BY window_day""".stripMargin
}
