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

  /** RANGE frame over event time — trailing-1-hour activity per user at
    * every event (count + exact spend). A rows-frame can't express this
    * (events are irregularly spaced); the frame bound is a VALUE offset on
    * the ordering key. Ordering by epoch micros (bigint) keeps the frame
    * arithmetic integer-exact in both engines, and rows tied on the same
    * microsecond fall into each other's frame identically regardless of
    * shuffle order — so the result is deterministic without a tiebreaker.
    * Scale: one exchange on user_id, sliding-frame state is O(window). */
  def rangeWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_us")
      .rangeBetween(-3600L * 1000000L, 0L)
    Tables.events(spark, dir)
      .withColumn("ts_us", unix_micros($"ts"))
      .withColumn("n_last_hour", count(lit(1)).over(w))
      .withColumn("hr_micros", sum(micros($"value")).over(w))
      .select($"event_id", $"user_id", $"n_last_hour",
        ($"hr_micros" / 1e6).as("hour_value"))
      .orderBy($"event_id")
  }

  val rangeWindowSql: String =
    s"""SELECT event_id, user_id,
       |  count(*) OVER w AS n_last_hour,
       |  (sum(${sqlMicros("value")}) OVER w / 1000000.0) AS hour_value
       |FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events)
       |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
       |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
       |ORDER BY event_id""".stripMargin

  /** Distribution ranks per group: quartile (ntile), percent_rank and
    * cume_dist of every customer's balance within their market segment.
    * The ordering (acctbal, custkey) is unique, so rank-derived doubles
    * are exact rationals — (rank-1)/(n-1) and rank/n are single IEEE
    * divisions, bit-identical across engines. */
  def rankStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"c_mktsegment").orderBy($"c_acctbal", $"c_custkey")
    Tables.customer(spark, dir)
      .select($"c_custkey", $"c_mktsegment", $"c_acctbal",
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy($"c_custkey")
  }

  val rankStatsSql: String =
    """SELECT c_custkey, c_mktsegment, c_acctbal,
      |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Time-series resampling to a regular daily grid with
    * last-observation-carried-forward — the gap-filling operator every
    * irregular event stream needs before joining against calendar-keyed
    * data. Three steps, each with a fixed distributed shape:
    *
    *   1. per (user, day) closing value: argmax by (ts, event_id) — one
    *      exchange on user_id via the row_number window;
    *   2. grid densification: sequence(min_day, max_day) exploded per
    *      user — generated rows, no join against a calendar table;
    *   3. LOCF: last(value, ignoreNulls) over an unbounded-preceding
    *      window — reuses the user_id partitioning from step 1.
    *
    * Values ride as exact micros BIGINTs; days start at each user's first
    * observation, so no nulls can survive the fill. Output is one row per
    * (user, grid day) with the filled value and an is_observed flag. */
  def resampleLocf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", to_date($"ts").as("day"), $"ts", $"event_id",
        micros($"value").as("v_u"))
    // r17 (optimization): the per-day close is a map-side-combinable
    // max_by aggregation instead of a (user, day) row_number window
    // (Exchange + Sort → one partial-agg exchange, guide §2.3), and the
    // grid + LOCF collapse into ONE lead() window over the OBSERVATION
    // rows followed by an in-row date explode: an observation owns every
    // grid day up to (not incl.) the next observation, which IS the
    // last-observation-carried-forward rule — grid edges are observations
    // by construction, so the generated days cover [min, max] exactly.
    // The old shape built the grid from a second corpus aggregate, joined
    // it back on (user, day), and ran the fill window over GRID-sized
    // rows; 4 exchanges → 2, and the window now sorts observations, not
    // grid days.
    val perDay = ev.groupBy($"user_id", $"day")
      .agg(max_by($"v_u", struct($"ts", $"event_id")).as("v_u"))
    val w = Window.partitionBy($"user_id").orderBy($"day")
    perDay
      .withColumn("next_day", lead($"day", 1).over(w))
      .withColumn("gday", explode(sequence(
        $"day", coalesce(date_sub($"next_day", 1), $"day"),
        expr("interval 1 day"))))
      .select($"user_id", date_format($"gday", "yyyy-MM-dd").as("day"),
        ($"v_u" / lit(1e6)).as("value"),
        ($"gday" === $"day").cast("int").as("is_observed"))
      .orderBy($"user_id", $"day")
  }

  val resampleLocfSql: String =
    s"""WITH ev AS (
       |  SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id,
       |    ${Num.sqlMicros("value")} AS v_u
       |  FROM events),
       |perday AS (
       |  SELECT user_id, day, v_u FROM (
       |    SELECT user_id, day, v_u,
       |      row_number() OVER (PARTITION BY user_id, day
       |                         ORDER BY ts DESC, event_id DESC) AS rn
       |    FROM ev) t
       |  WHERE rn = 1),
       |grid AS (
       |  SELECT user_id, UNNEST(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
       |  FROM (SELECT user_id, min(day) AS d0, max(day) AS d1
       |        FROM ev GROUP BY 1) b)
       |SELECT g.user_id, strftime(g.day, '%Y-%m-%d') AS day,
       |  (last_value(p.v_u IGNORE NULLS) OVER (
       |     PARTITION BY g.user_id ORDER BY g.day
       |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 1000000.0)
       |    AS value,
       |  CAST(p.v_u IS NOT NULL AS INT) AS is_observed
       |FROM grid g
       |LEFT JOIN perday p ON g.user_id = p.user_id AND g.day = p.day
       |ORDER BY g.user_id, day""".stripMargin

  /** Daily-grid resampling with LINEAR interpolation (`w_interpolate`) —
    * the [[resampleLocf]] sibling for signals where carrying the last
    * value forward biases the fill (sensor drift, balances, prices).
    * Steps 1–2 are shared shape-for-shape (per-day argmax close, then a
    * generated grid — no calendar join); the fill then needs BOTH
    * neighbors, so one window pass computes the last observation at-or-
    * before and the first at-or-after each grid day (four framed window
    * functions over the SAME user_id exchange — Spark plans one sort).
    *
    * The interpolation arithmetic is exact-integer: values ride as
    * micros, and the interior fill is
    * `v_p + floor((v_n − v_p)·(day − day_p) / (day_n − day_p))` — the
    * numerator stays far inside 2⁵³ so the double floor is bit-stable
    * cross-engine (an exactly-integer quotient is returned exactly by
    * IEEE division; a fractional one sits ≥ 1/365 from the boundary,
    * orders of magnitude above the ulp). Grid edges are observations by
    * construction (the grid spans each user's [first, last] day), so
    * every gap is interior and no edge policy is needed. */
  def resampleInterpolate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", to_date($"ts").as("day"), $"ts", $"event_id",
        micros($"value").as("v_u"))
    // r17 (optimization): same restructure as [[resampleLocf]] — max_by
    // per-day close, then ONE lead() window over observations carrying
    // BOTH neighbors (next day + next value), then the in-row date
    // explode. Each generated gap day d in [day, next_day) interpolates
    // against (day, v_u) → (d_n, v_n): exactly the old v_p/d_p/v_n/d_n
    // frame values, because the prior observation at-or-before a gap day
    // is this block's start and the next observation after it is d_n.
    // The grid join and the two-direction window over grid-sized rows
    // are gone; the arithmetic is unchanged (exact-integer micros, the
    // long·int product stays far inside 2⁵³).
    val perDay = ev.groupBy($"user_id", $"day")
      .agg(max_by($"v_u", struct($"ts", $"event_id")).as("v_u"))
    val w = Window.partitionBy($"user_id").orderBy($"day")
    perDay
      .withColumn("d_n", lead($"day", 1).over(w))
      .withColumn("v_n", lead($"v_u", 1).over(w))
      .withColumn("gday", explode(sequence(
        $"day", coalesce(date_sub($"d_n", 1), $"day"),
        expr("interval 1 day"))))
      .withColumn("filled_u",
        when($"gday" === $"day", $"v_u")
          .otherwise($"v_u" + floor(
            (($"v_n" - $"v_u") * datediff($"gday", $"day")) /
              datediff($"d_n", $"day"))))
      .select($"user_id", date_format($"gday", "yyyy-MM-dd").as("day"),
        ($"filled_u" / lit(1e6)).as("value"),
        ($"gday" === $"day").cast("int").as("is_observed"))
      .orderBy($"user_id", $"day")
  }

  val resampleInterpolateSql: String =
    s"""WITH ev AS (
       |  SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id,
       |    ${Num.sqlMicros("value")} AS v_u
       |  FROM events),
       |perday AS (
       |  SELECT user_id, day, v_u FROM (
       |    SELECT user_id, day, v_u,
       |      row_number() OVER (PARTITION BY user_id, day
       |                         ORDER BY ts DESC, event_id DESC) AS rn
       |    FROM ev) t
       |  WHERE rn = 1),
       |grid AS (
       |  SELECT user_id, UNNEST(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
       |  FROM (SELECT user_id, min(day) AS d0, max(day) AS d1
       |        FROM ev GROUP BY 1) b),
       |framed AS (
       |  SELECT g.user_id, g.day, p.v_u,
       |    last_value(p.v_u IGNORE NULLS) OVER wb AS v_p,
       |    last_value(CASE WHEN p.v_u IS NOT NULL THEN g.day END IGNORE NULLS)
       |      OVER wb AS d_p,
       |    first_value(p.v_u IGNORE NULLS) OVER wf AS v_n,
       |    first_value(CASE WHEN p.v_u IS NOT NULL THEN g.day END IGNORE NULLS)
       |      OVER wf AS d_n
       |  FROM grid g
       |  LEFT JOIN perday p ON g.user_id = p.user_id AND g.day = p.day
       |  WINDOW
       |    wb AS (PARTITION BY g.user_id ORDER BY g.day
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |    wf AS (PARTITION BY g.user_id ORDER BY g.day
       |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
       |SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
       |  (CASE WHEN v_u IS NOT NULL THEN v_u
       |        ELSE v_p + floor(((v_n - v_p) * (day - d_p)) * 1.0 / (d_n - d_p))
       |   END / 1000000.0) AS value,
       |  CAST(v_u IS NOT NULL AS INT) AS is_observed
       |FROM framed
       |ORDER BY user_id, day""".stripMargin

  /** SCD type-2 dimension build from an event stream: collapse each
    * user's event-type sequence into validity intervals — one row per
    * STATE CHANGE with [valid_from, valid_to) and an is_current flag.
    * The warehouse dimension-history pattern (Kimball SCD2), expressed
    * as two window passes over the change key: a lag() change filter,
    * then lead()/row_number() over the survivors. Both windows share the
    * same (user_id × time) partitioning, so the second pass reuses the
    * first's exchange; ties at one timestamp are totalized by the state
    * string. At 100 TB this is one shuffle on user_id regardless of
    * history depth. */
  /** W2 sibling: EXACT rolling median over the same 5-event trailing
    * frame as [[rollingMean]] — the robust smoother (one outlier moves a
    * mean by x/n, a median not at all). No built-in windowed median
    * exists; the frame is collected in-row (bounded: K values), sorted,
    * and indexed — O(K log K) per row inside codegen'd expressions, one
    * user_id exchange. Exactness device: median over integer MICROS —
    * odd frames index exactly, even frames average two exact integers
    * ((a+b)/2 is an exact dyadic at these magnitudes in every
    * formulation), so both engines' interpolation agree bit-for-bit
    * before the single /1e6. */
  def rollingMedian(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(-4, 0)
    Tables.events(spark, dir)
      .withColumn("xs", array_sort(collect_list(micros($"value")).over(w)))
      .select($"event_id", $"user_id",
        (when(size($"xs") % 2 === 1,
            element_at($"xs", ((size($"xs") + 1) / 2).cast("int")).cast("double"))
          .otherwise((element_at($"xs", (size($"xs") / 2).cast("int")) +
            element_at($"xs", (size($"xs") / 2).cast("int") + 1)).cast("double") / 2.0)
          / 1000000.0).as("rolling_median"))
      .orderBy("event_id")
  }

  val rollingMedianSql: String =
    s"""SELECT event_id, user_id,
       |  median(${Num.sqlMicros("value")})
       |    OVER (PARTITION BY user_id ORDER BY ts, event_id
       |          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
       |    / 1000000.0 AS rolling_median
       |FROM events ORDER BY event_id""".stripMargin

  /** EWMA frame depth: weights below 2^-8 contribute < 0.4% and a bounded
    * frame keeps the window a single streaming pass. */
  val EwmaDepth = 8

  /** W2 variant: exponentially weighted moving average of `value` per
    * user — the time-series smoother pandas spells `.ewm(alpha=.5).mean()`
    * (the adjusted form: weights renormalized over the rows actually
    * present). The reference smooths tracking series with flat rolling
    * means (movement_stats cell 2); EWMA is the recency-weighted twin
    * every monitoring/feature pipeline also wants, and the interesting
    * part is making a RECURSIVE definition exact and order-stable on two
    * engines at once.
    *
    * Shape: the recursion is unrolled into a bounded trailing frame of
    * [[EwmaDepth]] lags (α = 1/2 ⇒ weights below the frame are < 2^-8 —
    * truncation pandas itself allows via `.ewm(... ).mean()` on a rolling
    * slice). Each term is integer micros × a power-of-two weight, so
    * numerator and denominator are exact BIGINTs in both engines
    * (order-independent, AQE/partitioning-proof like [[Num.exactSum]]),
    * and the single double division at the end is the same IEEE-754 op on
    * both sides. One window pass, [[EwmaDepth]] lag expressions, all
    * inside whole-stage codegen; the only exchange is the user_id hash —
    * the 100-TB plan shape. */
  def ewma(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val xm = Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"ts", micros($"value").as("xm"))
    val terms = (0 until EwmaDepth).map { j =>
      val wt = 1L << (EwmaDepth - 1 - j) // newest lag gets the top weight
      (coalesce(lag($"xm", j).over(w), lit(0L)) * wt,
        when(lag($"xm", j).over(w).isNull, 0L).otherwise(wt))
    }
    xm.withColumn("num", terms.map(_._1).reduce(_ + _))
      .withColumn("den", terms.map(_._2).reduce(_ + _))
      .select($"event_id", $"user_id",
        ($"num".cast("double") / ($"den" * lit(1000000.0))).as("ewma_value"))
      .orderBy($"event_id")
  }

  val ewmaSql: String = {
    val terms = (0 until EwmaDepth).map { j =>
      val wt = 1L << (EwmaDepth - 1 - j)
      (s"COALESCE(lag(xm, $j) OVER w, 0) * $wt",
        s"CASE WHEN lag(xm, $j) OVER w IS NULL THEN 0 ELSE $wt END")
    }
    s"""SELECT event_id, user_id,
       |  CAST(num AS DOUBLE) / (den * 1000000.0) AS ewma_value
       |FROM (
       |  SELECT event_id, user_id,
       |    ${terms.map(_._1).mkString(" + ")} AS num,
       |    ${terms.map(_._2).mkString(" + ")} AS den
       |  FROM (SELECT event_id, user_id, ts, ${Num.sqlMicros("value")} AS xm
       |        FROM events)
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) t
       |ORDER BY event_id""".stripMargin
  }

  def scd2Intervals(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", unix_micros($"ts").as("ts_us"), $"event_type")
      .distinct()
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_type")
    val changes = ev
      .withColumn("prev_state", lag($"event_type", 1).over(w))
      .filter($"prev_state".isNull || $"prev_state" =!= $"event_type")
    changes
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to_us", lead($"ts_us", 1).over(w))
      .select($"user_id", $"version", $"event_type".as("state"),
        $"ts_us".as("valid_from_us"), $"valid_to_us",
        $"valid_to_us".isNull.cast("long").as("is_current"))
      .orderBy($"user_id", $"version")
  }

  val scd2IntervalsSql: String =
    """WITH ev AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) AS ts_us, event_type FROM events),
      |chg AS (
      |  SELECT user_id, ts_us, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id
      |                          ORDER BY ts_us, event_type) AS prev_state
      |  FROM ev),
      |scd AS (
      |  SELECT user_id, ts_us, event_type FROM chg
      |  WHERE prev_state IS NULL OR prev_state <> event_type)
      |SELECT user_id,
      |  CAST(row_number() OVER w AS BIGINT) AS version,
      |  event_type AS state,
      |  ts_us AS valid_from_us,
      |  lead(ts_us) OVER w AS valid_to_us,
      |  CAST(CASE WHEN lead(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS BIGINT)
      |    AS is_current
      |FROM scd
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_type)
      |ORDER BY user_id, version""".stripMargin
}
