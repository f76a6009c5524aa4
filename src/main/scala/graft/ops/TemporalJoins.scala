package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series join operators: as-of join and bounded range join.
  *
  * Neither exists as a Spark built-in; both have naive forms (a theta
  * join) that explode at scale. These are the composed scale shapes:
  *
  *  - As-of = union both sides, one window pass per key. ONE shuffle on
  *    the join key, zero row blow-up, regardless of how many right rows
  *    precede each left row. The per-key state is one running value — the
  *    same shape Structured Streaming keeps for stream-stream as-of.
  *  - Range join = bucketize the time axis at the window width, duplicate
  *    the left side into (bin, bin+1), equi-join on (key, bin), then
  *    filter the exact bound. Candidate pairs are bounded by per-bucket
  *    occupancy — never |L|·|R| — and the join stays a hash equi-join
  *    (AQE-skew-splittable) instead of a broadcast-nested-loop.
  */
object TemporalJoins {

  /** Generic as-of left join: for every left row, attach the latest right
    * row whose `ts` is at-or-before the left row's `ts`, per `keys`
    * (DuckDB `ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >= r.ts`
    * semantics; ties match the right row). The right side must be unique
    * per (keys, ts) — pre-aggregate it if not, or the match is undefined.
    *
    * Output: every left column, plus each right value column as
    * `asof_<name>` and the matched timestamp as `asof_<ts>` (nulls when no
    * right row precedes).
    *
    * Shape: union both sides, ONE window pass per key — right rows sort
    * before left rows at equal ts (side 0 < 1) so a running
    * `last(_, ignoreNulls)` is exactly the as-of match. One shuffle on
    * `keys`, zero row blow-up, any number of value columns.
    *
    * Null-key caveat: window partitioning groups nulls together, so
    * null-key left rows WOULD match null-key right rows — unlike SQL
    * join semantics (and [[graft.plans.AsOfJoinPlan]], which drops
    * them). Filter null keys first if the input can contain them. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               ts: String, strict: Boolean = false): DataFrame = {
    val rightVals = right.columns.toSeq.filterNot(c => keys.contains(c) || c == ts)
    val leftVals = left.columns.toSeq.filterNot(c => keys.contains(c) || c == ts)
    // `strict` = match only rows STRICTLY before (l.ts > r.ts) — the
    // no-label-leakage mode for point-in-time training assembly: a right
    // row at the label's own instant must not become a feature. Encoded
    // purely in the tie order: right rows at equal ts sort AFTER left
    // rows, so the running last() can't see them.
    val rightSide = if (strict) 2 else 0
    val l2 = left.select(
      (keys :+ ts).map(col) ++ Seq(lit(1).as("__side")) ++ leftVals.map(col) ++
        rightVals.map(c =>
          lit(null).cast(right.schema(c).dataType).as(s"asof_$c")): _*)
    val r2 = right.select(
      (keys :+ ts).map(col) ++ Seq(lit(rightSide).as("__side")) ++
        leftVals.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightVals.map(c => col(c).as(s"asof_$c")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val merged = l2.unionByName(r2)
      .withColumn(s"asof_$ts",
        last(when(col("__side") =!= 1, col(ts)), ignoreNulls = true).over(w))
    rightVals.foldLeft(merged) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }.filter(col("__side") === 1).drop("__side")
  }

  /** As-of query over events: attach to each purchase event the user's
    * most recent view event at-or-before it. The right side is first
    * reduced to one row per (user, ts) so the match is deterministic under
    * duplicate timestamps. */
  def asofLastView(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).withColumn("ts_us", unix_micros(col("ts")))
    val right = ev.filter(col("event_type") === "view")
      .groupBy("user_id", "ts_us").agg(max("value").as("view_value"))
    val left = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("value").as("purchase_value"))
    asofJoin(left, right, Seq("user_id"), "ts_us")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("purchase_value"), col("asof_ts_us").as("last_view_ts_us"),
        col("asof_view_value").as("last_view_value"))
      .orderBy("event_id")
  }

  /** `j_asof_native`: the same as-of query through the CUSTOM PHYSICAL
    * OPERATOR ([[graft.plans.AsOfJoinPlan]] — logical node + strategy +
    * sort-merge SparkPlan) instead of the union-window composition. Both
    * run against the identical DuckDB ASOF JOIN oracle, so the hash gate
    * proves the custom executor end to end; AsOfJoinSpec additionally
    * pins row-parity between the two forms on adversarial fixtures. */
  def asofLastViewNative(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).withColumn("ts_us", unix_micros(col("ts")))
    val right = ev.filter(col("event_type") === "view")
      .groupBy("user_id", "ts_us").agg(max("value").as("last_view_value"))
      .select(col("user_id").as("r_user_id"),
        col("ts_us").as("last_view_ts_us"), col("last_view_value"))
    val left = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("value").as("purchase_value"))
    graft.plans.AsOfJoinPlan.asofJoinNative(left, right,
        Seq("user_id"), Seq("r_user_id"), "ts_us", "last_view_ts_us")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("purchase_value"), col("last_view_ts_us"), col("last_view_value"))
      .orderBy("event_id")
  }

  val asofLastViewSql: String =
    """WITH r AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us, max(value) AS view_value
      |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
      |l AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value AS purchase_value
      |  FROM events WHERE event_type = 'purchase')
      |SELECT l.event_id, l.user_id, l.ts_us, l.purchase_value,
      |  r.ts_us AS last_view_ts_us, r.view_value AS last_view_value
      |FROM l ASOF LEFT JOIN r
      |  ON l.user_id = r.user_id AND l.ts_us >= r.ts_us
      |ORDER BY event_id""".stripMargin

  /** Staleness horizon for [[asofTolerance]]: 3 days in microseconds. */
  val AsofMaxAgeUs = 259200000000L

  /** As-of join WITH TOLERANCE (`j_asof_tolerance`): the stale-feature
    * guard — a matched right row older than [[AsofMaxAgeUs]] is treated
    * as no match (nulled, `is_fresh = false`) rather than silently
    * serving a weeks-old feature value. Semantics = as-of then age
    * filter (NOT "nearest within window": the match is still the latest
    * ≤ t row; it is only accepted or rejected), which is exactly what a
    * feature store's TTL does. Plan: identical to the as-of (one
    * exchange per side), plus a row-local age predicate. */
  def asofTolerance(spark: SparkSession, dir: String): DataFrame = {
    val joined = asofLastView(spark, dir)
    val fresh = col("last_view_ts_us").isNotNull &&
      (col("ts_us") - col("last_view_ts_us") <= AsofMaxAgeUs)
    joined.select(col("event_id"), col("user_id"), col("ts_us"),
        col("purchase_value"),
        when(fresh, col("last_view_ts_us")).as("last_view_ts_us"),
        when(fresh, col("last_view_value")).as("last_view_value"),
        fresh.as("is_fresh"))
      .orderBy("event_id")
  }

  val asofToleranceSql: String =
    s"""WITH r AS (
       |  SELECT user_id, epoch_us(ts) AS ts_us, max(value) AS view_value
       |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
       |l AS (
       |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value AS purchase_value
       |  FROM events WHERE event_type = 'purchase'),
       |j AS (
       |  SELECT l.event_id, l.user_id, l.ts_us, l.purchase_value,
       |    r.ts_us AS m_ts, r.view_value AS m_val
       |  FROM l ASOF LEFT JOIN r
       |    ON l.user_id = r.user_id AND l.ts_us >= r.ts_us)
       |SELECT event_id, user_id, ts_us, purchase_value,
       |  CASE WHEN m_ts IS NOT NULL AND ts_us - m_ts <= $AsofMaxAgeUs
       |       THEN m_ts END AS last_view_ts_us,
       |  CASE WHEN m_ts IS NOT NULL AND ts_us - m_ts <= $AsofMaxAgeUs
       |       THEN m_val END AS last_view_value,
       |  COALESCE(m_ts IS NOT NULL AND ts_us - m_ts <= $AsofMaxAgeUs, FALSE)
       |    AS is_fresh
       |FROM j
       |ORDER BY event_id""".stripMargin

  /** Point-in-time training-set assembly (the feature-store pattern):
    * label rows (purchases) pick up per-user features as they stood
    * STRICTLY BEFORE the label instant — the no-leakage discipline that
    * separates a valid training set from a subtly broken one. Two
    * feature streams attach through two strict as-of passes (each = one
    * exchange on user_id, zero row blow-up):
    *   - last view value before the label;
    *   - cumulative click count before the label (running count as the
    *     feature table, so the as-of lookup IS the prefix count).
    * A feature event at the label's own timestamp is excluded by both
    * engines (`strict` here, `l.ts > r.ts` in DuckDB's ASOF). */
  def trainExamples(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).withColumn("ts_us", unix_micros(col("ts")))
    val labels = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        graft.ops.Num.micros(col("value")).as("label_micros"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id", "ts_us")
      .agg(graft.ops.Num.micros(max("value")).as("view_micros"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("user_id", "ts_us").agg(count(lit(1)).as("n"))
      .withColumn("clicks_so_far", sum(col("n")).over(
        Window.partitionBy("user_id").orderBy("ts_us")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .select("user_id", "ts_us", "clicks_so_far")
    val withView = asofJoin(labels, views, Seq("user_id"), "ts_us", strict = true)
      .select(col("event_id"), col("user_id"), col("ts_us"), col("label_micros"),
        col("asof_view_micros").as("f_last_view_micros"))
    asofJoin(withView, clicks, Seq("user_id"), "ts_us", strict = true)
      .select(col("event_id"), col("user_id"), col("ts_us"), col("label_micros"),
        col("f_last_view_micros"),
        coalesce(col("asof_clicks_so_far"), lit(0L)).as("f_clicks_before"))
      .orderBy("event_id")
  }

  val trainExamplesSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, value
      |  FROM events),
      |labels AS (
      |  SELECT event_id, user_id, ts_us,
      |    CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS label_micros
      |  FROM ev WHERE event_type = 'purchase'),
      |views AS (
      |  SELECT user_id, ts_us,
      |    CAST(floor(max(value) * 1000000.0 + 0.5) AS BIGINT) AS view_micros
      |  FROM ev WHERE event_type = 'view' GROUP BY 1, 2),
      |clicks AS (
      |  SELECT user_id, ts_us,
      |    CAST(sum(count(*)) OVER (PARTITION BY user_id ORDER BY ts_us
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS clicks_so_far
      |  FROM ev WHERE event_type = 'click' GROUP BY user_id, ts_us),
      |withview AS (
      |  SELECT l.event_id, l.user_id, l.ts_us, l.label_micros,
      |    v.view_micros AS f_last_view_micros
      |  FROM labels l ASOF LEFT JOIN views v
      |    ON l.user_id = v.user_id AND l.ts_us > v.ts_us)
      |SELECT w.event_id, w.user_id, w.ts_us, w.label_micros,
      |  w.f_last_view_micros,
      |  coalesce(c.clicks_so_far, 0) AS f_clicks_before
      |FROM withview w ASOF LEFT JOIN clicks c
      |  ON w.user_id = c.user_id AND w.ts_us > c.ts_us
      |ORDER BY event_id""".stripMargin

  /** Range-join window width: 2 hours, in microseconds. */
  val RangeWindowUs = 7200L * 1000000L

  /** Bounded range self-join: ordered pairs of events by the same user
    * within [[RangeWindowUs]] of each other (strictly later second event).
    * The left side duplicates into its own and the next time bucket; a
    * matching pair lands in exactly one of the two, so no post-join dedup
    * is needed. */
  def rangePairs(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
    val a = e.select(col("user_id"), col("event_id").as("event_a"),
        col("ts_us").as("ts_a"))
      .withColumn("bkey", explode(array(
        expr(s"ts_a DIV $RangeWindowUs"), expr(s"ts_a DIV $RangeWindowUs + 1"))))
    val b = e.select(col("user_id").as("user_b"), col("event_id").as("event_b"),
        col("ts_us").as("ts_b"))
      .withColumn("bin_b", expr(s"ts_b DIV $RangeWindowUs"))
    a.join(b, col("user_id") === col("user_b") && col("bkey") === col("bin_b") &&
        col("ts_b") > col("ts_a") && col("ts_b") - col("ts_a") <= RangeWindowUs)
      .select(col("user_id"), col("event_a"), col("event_b"),
        (col("ts_b") - col("ts_a")).as("dt_us"))
      .orderBy("event_a", "event_b")
  }

  val rangePairsSql: String =
    s"""SELECT a.user_id, a.event_id AS event_a, b.event_id AS event_b,
       |  epoch_us(b.ts) - epoch_us(a.ts) AS dt_us
       |FROM events a JOIN events b
       |  ON a.user_id = b.user_id
       | AND epoch_us(b.ts) > epoch_us(a.ts)
       | AND epoch_us(b.ts) - epoch_us(a.ts) <= $RangeWindowUs
       |ORDER BY event_a, event_b""".stripMargin
}
