package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Num._

/** Aggregation coverage beyond the basics (SURVEY.md §2.4): exact
  * quantiles (A4), correlation (A15), sorted list-collect (A10),
  * cumulative windows (W9), and event-time sessionization (the batch twin
  * of the Structured Streaming surface, §2.11).
  */
object Aggregates {

  /** A4: exact quantiles of account balance per market segment.
    * `percentile` (exact, interpolating) — the approx variant
    * (percentile_approx / t-digest) is the 100 TB path but is not
    * oracle-stable, so the gate uses the exact one. */
  def quantiles(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir)
      .groupBy("c_mktsegment")
      .agg(
        percentile(col("c_acctbal"), lit(0.25)).as("p25"),
        percentile(col("c_acctbal"), lit(0.5)).as("p50"),
        percentile(col("c_acctbal"), lit(0.9)).as("p90"),
        count(lit(1)).as("n"))
      .orderBy("c_mktsegment")
  }

  /** A4 production path: approximate quantiles (t-digest style sketch —
    * mergeable, single pass, bounded memory at any scale). Not
    * oracle-stable (sketch internals differ across engines), so this
    * ships rows-only-checked; the exact form above carries the hash
    * gate. */
  def quantilesApprox(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir)
      .groupBy("c_mktsegment")
      .agg(
        percentile_approx(col("c_acctbal"), lit(0.5), lit(10000)).as("p50"),
        percentile_approx(col("c_acctbal"), lit(0.9), lit(10000)).as("p90"),
        count(lit(1)).as("n"))
      .orderBy("c_mktsegment")
  }

  val quantilesSql: String =
    """SELECT c_mktsegment,
      |  quantile_cont(c_acctbal, 0.25) AS p25,
      |  quantile_cont(c_acctbal, 0.5) AS p50,
      |  quantile_cont(c_acctbal, 0.9) AS p90,
      |  count(*) AS n
      |FROM customer
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** A15: correlation of quantity vs discounted price per return flag,
    * rounded to 6dp to absorb engine-order epsilon in the co-moments. */
  def correlation(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
           count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  val correlationSql: String =
    """SELECT l_returnflag,
      |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** A8 (oracle-gated form): per-group gamma fit by method of moments —
    * α̂ = mean²/var, θ̂ = var/mean over positive prices. The kernel path
    * keeps the Newton-MLE `Aggregator` (Priors.gammaFit, tighter fit);
    * this variant is expressible in ANSI SQL so prior fitting has a
    * CORRECTNESS row. Rounded to 6dp to absorb engine-order epsilon in
    * the co-moments (same rule as `correlation`). */
  def gammaMoments(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        round(pow(avg(col("l_extendedprice")), 2) / var_samp(col("l_extendedprice")), 6)
          .as("alpha_hat"),
        round(var_samp(col("l_extendedprice")) / avg(col("l_extendedprice")), 6)
          .as("theta_hat"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  val gammaMomentsSql: String =
    """SELECT l_returnflag,
      |  round(pow(avg(l_extendedprice), 2) / var_samp(l_extendedprice), 6) AS alpha_hat,
      |  round(var_samp(l_extendedprice) / avg(l_extendedprice), 6) AS theta_hat,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** A10: per-user sorted distinct event-type list, serialized to a string
    * so the hash compare is scalar (movement_stats cell 24's
    * agg(events=list(...)) → collect_list/array_sort). */
  def collectTypes(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(array_join(array_sort(collect_set(col("event_type"))), ",").as("types"),
           count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  val collectTypesSql: String =
    """SELECT user_id,
      |  array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
      |  count(*) AS n_events
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** W9: cumulative (running) spend per user over event time — exact
    * micros so the running double is identical at every row. */
  def cumulativeSpend(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.events(spark, dir)
      .withColumn("cum_micros", sum(micros(col("value"))).over(w))
      .select(col("event_id"), col("user_id"),
        (col("cum_micros") / 1e6).as("cum_value"))
      .orderBy("event_id")
  }

  val cumulativeSpendSql: String =
    s"""SELECT event_id, user_id,
       |  (sum(${sqlMicros("value")}) OVER (
       |     PARTITION BY user_id ORDER BY ts, event_id
       |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 1000000.0)
       |    AS cum_value
       |FROM events
       |ORDER BY event_id""".stripMargin

  /** Event-time sessionization (30-minute gap), batch form of the
    * streaming session_window. Session identity = µs-exact gaps-and-
    * islands; emits per-session start, size, and exact spend. The same
    * grouping runs under Structured Streaming via
    * `session_window($"ts", "30 minutes")` (graft.streaming). */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byTime = Window.partitionBy("user_id").orderBy(col("ts_us"))
    val ev = Tables.events(spark, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
    ev.withColumn("prev_us", lag(col("ts_us"), 1).over(byTime))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
             col("ts_us") - col("prev_us") >= 30L * 60 * 1000000, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(byTime.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(min(col("ts_us")).as("session_start_us"),
           count(lit(1)).as("n_events"),
           exactSum(col("value")).as("session_value"))
      .orderBy("user_id", "session_id")
  }

  val sessionizeSql: String =
    s"""WITH ev AS (
       |  SELECT user_id, epoch_us(ts) AS ts_us, value FROM events),
       |flagged AS (
       |  SELECT user_id, ts_us, value,
       |    CASE WHEN lag(ts_us, 1) OVER w IS NULL
       |           OR ts_us - lag(ts_us, 1) OVER w >= 1800000000
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM ev
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
       |sessions AS (
       |  SELECT user_id, ts_us, value,
       |    CAST(sum(new_session) OVER (
       |      PARTITION BY user_id ORDER BY ts_us
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |  FROM flagged)
       |SELECT user_id, session_id,
       |  min(ts_us) AS session_start_us,
       |  count(*) AS n_events,
       |  ${sqlExactSum("value")} AS session_value
       |FROM sessions
       |GROUP BY 1, 2
       |ORDER BY user_id, session_id""".stripMargin

  /** ROLLUP: per-(returnflag, linestatus) totals plus per-returnflag and
    * grand-total subtotal rows in ONE aggregation pass (Spark expands the
    * grouping sets before the exchange, so it still map-side combines).
    * Subtotal NULL keys are coalesced to a sentinel so row ordering is
    * engine-independent (neither key column is nullable in the data). */
  def rollupSummary(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(exactSum(col("l_quantity")).as("sum_qty"),
           count(lit(1)).as("n_rows"))
      .select(coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
              coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
              col("sum_qty"), col("n_rows"))
      .orderBy("returnflag", "linestatus")
  }

  val rollupSummarySql: String =
    s"""SELECT coalesce(l_returnflag, '(all)') AS returnflag,
       |  coalesce(l_linestatus, '(all)') AS linestatus,
       |  ${sqlExactSum("l_quantity")} AS sum_qty,
       |  count(*) AS n_rows
       |FROM lineitem
       |GROUP BY ROLLUP(l_returnflag, l_linestatus)
       |ORDER BY returnflag, linestatus""".stripMargin

  /** GROUPING SETS beyond ROLLUP: ((flag,status), (status), ()) — a set
    * list no rollup/cube can express (the middle set keeps only the
    * SECOND key). Spark expands the sets before the exchange, so the
    * whole thing is still one map-side-combined aggregation pass, not
    * three scans. Sentinel-coalesced like [[rollupSummary]] (neither key
    * is nullable in the data, so NULL means "aggregated over"). */
  def groupingSetsSummary(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Column
    val li = Tables.lineitem(spark, dir)
    li.groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_linestatus")),
            Seq.empty[Column]),
        col("l_returnflag"), col("l_linestatus"))
      .agg(exactSum(col("l_quantity")).as("sum_qty"),
           exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
             .as("sum_revenue"),
           count(lit(1)).as("n_rows"))
      .select(coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
              coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
              col("sum_qty"), col("sum_revenue"), col("n_rows"))
      .orderBy("returnflag", "linestatus")
  }

  val groupingSetsSummarySql: String =
    s"""SELECT coalesce(l_returnflag, '(all)') AS returnflag,
       |  coalesce(l_linestatus, '(all)') AS linestatus,
       |  ${sqlExactSum("l_quantity")} AS sum_qty,
       |  ${sqlExactSum("l_extendedprice * (1.0 - l_discount)")} AS sum_revenue,
       |  count(*) AS n_rows
       |FROM lineitem
       |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
       |ORDER BY returnflag, linestatus""".stripMargin

  /** CUBE: all four (flag × status) grouping combinations in one pass —
    * the full-lattice member of the rollup/grouping-sets family. Same
    * expand-then-aggregate plan as ROLLUP (one exchange, partial aggs);
    * GROUPING() masks disambiguate a real NULL key from a subtotal row,
    * which is what makes the result joinable downstream. */
  def cubeSummary(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .cube("l_returnflag", "l_linestatus")
      .agg(exactSum(col("l_quantity")).as("sum_qty"),
           count(lit(1)).as("n_rows"),
           grouping(col("l_returnflag")).cast("long").as("is_flag_total"),
           grouping(col("l_linestatus")).cast("long").as("is_status_total"))
      .select(coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
              coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
              col("is_flag_total"), col("is_status_total"),
              col("sum_qty"), col("n_rows"))
      .orderBy("returnflag", "linestatus")
  }

  val cubeSummarySql: String =
    s"""SELECT coalesce(l_returnflag, '(all)') AS returnflag,
       |  coalesce(l_linestatus, '(all)') AS linestatus,
       |  CAST(grouping(l_returnflag) AS BIGINT) AS is_flag_total,
       |  CAST(grouping(l_linestatus) AS BIGINT) AS is_status_total,
       |  ${sqlExactSum("l_quantity")} AS sum_qty,
       |  count(*) AS n_rows
       |FROM lineitem
       |GROUP BY CUBE(l_returnflag, l_linestatus)
       |ORDER BY returnflag, linestatus""".stripMargin

  /** PIVOT: per-user spend by event type as columns, written as static
    * conditional aggregates. Spark's `.pivot(col, values)` plans TWO
    * aggregation exchanges (pre-agg by (key, pivot) then PivotFirst);
    * the `sum(when(...))` form is the single-pass plan — one exchange,
    * map-side combined, and exactly what the oracle SQL spells. */
  /** DYNAMIC pivot: `.pivot(col)` with no value list — Spark runs its own
    * distinct-values job first (capped by spark.sql.pivotMaxValues), then
    * plans the same conditional aggregation as the static form. The
    * two-phase shape is the honest way to pivot a column whose domain
    * ships with the data, at the cost of that extra pass; when the domain
    * is known, [[pivotSpend]]'s static single-pass form wins. Daily event
    * counts by type: output schema is data-dependent, which the oracle
    * accommodates because the distinct job is deterministic. */
  def pivotDynamic(spark: SparkSession, dir: String): DataFrame = {
    val pivoted = Tables.events(spark, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .pivot("event_type")
      .agg(count(lit(1)))
    // .pivot() leaves NULL in a (day, type) cell with no rows, where the
    // oracle's `count(*) FILTER` emits 0 — coalesce every pivoted column
    // so the match doesn't depend on the corpus populating every cell.
    val counts = pivoted.columns.filterNot(_ == "day")
      .map(c => coalesce(col(c), lit(0L)).as(c))
    pivoted.select(col("day") +: counts.toSeq: _*).orderBy("day")
  }

  /** The oracle's column list hardcodes the generator's five event types;
    * a type absent from the data would be a missing column on the Spark
    * side (pivot derives columns from the data) and a hash mismatch —
    * that narrowing is deliberate and documented here, not silent. */
  val pivotDynamicSql: String = {
    val cols = Seq("click", "error", "purchase", "signup", "view").map { t =>
      s"  count(*) FILTER (WHERE event_type = '$t') AS $t"
    }.mkString(",\n")
    s"""SELECT strftime(ts, '%Y-%m-%d') AS day,
       |$cols
       |FROM events
       |GROUP BY 1
       |ORDER BY day""".stripMargin
  }

  def pivotSpend(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "view", "purchase", "signup", "error")
    val aggs = types.map { t =>
      coalesce(exactSum(when(col("event_type") === t, col("value"))), lit(0.0)).as(t)
    }
    Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(aggs.head, aggs.tail: _*)
      .orderBy("user_id")
  }

  val pivotSpendSql: String = {
    val cols = Seq("click", "view", "purchase", "signup", "error").map { t =>
      s"  coalesce(${sqlExactSum(s"CASE WHEN event_type = '$t' THEN value END")}, 0.0) AS $t"
    }.mkString(",\n")
    s"""SELECT user_id,
       |$cols
       |FROM events
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin
  }

  /** INTERSECT / EXCEPT: customers segmented by two derived key sets —
    * open-order customers vs high-balance customers — tagged by which
    * side they fall on. Spark plans both as hash joins (left-semi /
    * left-anti after dedup), shuffling only distinct keys. */
  def setOpsCustomers(spark: SparkSession, dir: String): DataFrame = {
    val withOrders = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("c_custkey"))
    val highBal = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 5000.0)
      .select(col("c_custkey"))
    withOrders.intersect(highBal)
      .select(lit("both").as("tag"), col("c_custkey"))
      .unionByName(withOrders.except(highBal)
        .select(lit("orders_only").as("tag"), col("c_custkey")))
      .orderBy("tag", "c_custkey")
  }

  val setOpsCustomersSql: String =
    """WITH with_orders AS (
      |  SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'),
      |high_bal AS (
      |  SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
      |SELECT 'both' AS tag, c_custkey
      |FROM (SELECT c_custkey FROM with_orders INTERSECT SELECT c_custkey FROM high_bal)
      |UNION ALL
      |SELECT 'orders_only' AS tag, c_custkey
      |FROM (SELECT c_custkey FROM with_orders EXCEPT SELECT c_custkey FROM high_bal)
      |ORDER BY tag, c_custkey""".stripMargin

  /** Exact per-group mode (heavy hitter): each user's most frequent event
    * type, ties broken alphabetically. Two-level shape — count per
    * (user, type), then argmax within user. The row_number()<=1 window is
    * exactly what `plans.RewriteWindowTopK` rewrites into the bounded-heap
    * top-k aggregate, so the argmax shuffles one row per (user, partition)
    * rather than sorting every user's type counts. At sketch scale the
    * same query runs over a count-min candidate set; exact is right
    * whenever the group key fits a shuffle (it's (user × type) — bounded). */
  def modePerUser(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counts = Tables.events(spark, dir)
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("rk", row_number().over(
        Window.partitionBy($"user_id").orderBy($"n".desc, $"event_type")))
      .filter($"rk" === 1)
      .select($"user_id", $"event_type".as("top_type"), $"n")
      .orderBy($"user_id")
  }

  val modePerUserSql: String =
    """SELECT user_id, event_type AS top_type, n FROM (
      |  SELECT user_id, event_type, n,
      |    row_number() OVER (PARTITION BY user_id
      |                       ORDER BY n DESC, event_type) AS rk
      |  FROM (SELECT user_id, event_type, count(*) AS n
      |        FROM events GROUP BY 1, 2) c) t
      |WHERE rk = 1
      |ORDER BY user_id""".stripMargin

  /** Group-wise outlier detection by Tukey IQR fences: per event type,
    * values beyond Q3 + 1.5·IQR / Q1 − 1.5·IQR are flagged; output is
    * per-type counts + the flagged mass (quantized micros). Two passes —
    * one exact-percentile aggregation (a broadcast-sized fence table)
    * and one fenced scan — the anomaly-triage shape that stays two jobs
    * regardless of corpus size. Fence arithmetic is the literally same
    * IEEE expression in both engines, so the comparison is hash-exact. */
  def outlierStats(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val fences = ev.groupBy("event_type")
      .agg(percentile(col("value"), lit(0.25)).as("q1"),
           percentile(col("value"), lit(0.75)).as("q3"))
    val flagged = ev.join(broadcast(fences), "event_type")
      .withColumn("iqr", col("q3") - col("q1"))
      .withColumn("is_out",
        (col("value") > col("q3") + lit(1.5) * col("iqr")) ||
        (col("value") < col("q1") - lit(1.5) * col("iqr")))
    flagged.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
           sum(col("is_out").cast("long")).as("n_outliers"),
           sum(when(col("is_out"), Num.micros(col("value")))
             .otherwise(lit(0L))).as("outlier_mass_micros"))
      .orderBy("event_type")
  }

  val outlierStatsSql: String =
    """WITH f AS (
      |  SELECT event_type,
      |    quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3
      |  FROM events GROUP BY 1),
      |flagged AS (
      |  SELECT e.event_type, e.value,
      |    (e.value > f.q3 + 1.5 * (f.q3 - f.q1)
      |     OR e.value < f.q1 - 1.5 * (f.q3 - f.q1)) AS is_out
      |  FROM events e JOIN f USING (event_type))
      |SELECT event_type,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(is_out AS BIGINT)) AS BIGINT) AS n_outliers,
      |  CAST(sum(CASE WHEN is_out
      |    THEN CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)
      |    ELSE 0 END) AS BIGINT) AS outlier_mass_micros
      |FROM flagged
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Pearson chi-square contingency cells for lang x source association —
    * the categorical-independence screen a corpus-mix audit runs (are
    * sources language-skewed?). Emits one row per observed cell with its
    * expected count and chi2 contribution; summing `chi2_cell` gives the
    * test statistic, but the PER-CELL form is the actionable output (it
    * names the skewed cells) and keeps the oracle hash exact: every value
    * is integer arithmetic until one shared-shape double expression
    * ((o*n - rn*cn)^2 / (rn*cn*n), computed identically in both
    * engines). Scale: three aggregates over the same small cell table +
    * broadcast-sized joins - the heavy lifting is the first groupBy,
    * map-side combinable on (lang, source). */
  def chi2Cells(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = Tables.documents(spark, dir)
      .groupBy($"lang", $"source").agg(count(lit(1)).as("o"))
    val tot = cells.agg(sum($"o").as("n"))
    val rt = cells.groupBy($"lang").agg(sum($"o").as("row_n"))
    val ct = cells.groupBy($"source").agg(sum($"o").as("col_n"))
    val num = ($"o" * $"n" - $"row_n" * $"col_n").cast("double")
    cells.join(rt, "lang").join(ct, "source").crossJoin(tot)
      .select($"lang", $"source", $"o".as("observed"),
        (($"row_n" * $"col_n").cast("double") / $"n").as("expected"),
        (num * num / (($"row_n" * $"col_n").cast("double") * $"n"))
          .as("chi2_cell"))
      .orderBy("lang", "source")
  }

  val chi2CellsSql: String =
    """WITH cells AS (
      |  SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
      |tot AS (SELECT sum(o) AS n FROM cells),
      |rt AS (SELECT lang, sum(o) AS row_n FROM cells GROUP BY 1),
      |ct AS (SELECT source, sum(o) AS col_n FROM cells GROUP BY 1)
      |SELECT c.lang, c.source, CAST(c.o AS BIGINT) AS observed,
      |  CAST(rt.row_n * ct.col_n AS DOUBLE) / n AS expected,
      |  CAST(c.o * n - rt.row_n * ct.col_n AS DOUBLE)
      |    * CAST(c.o * n - rt.row_n * ct.col_n AS DOUBLE)
      |    / (CAST(rt.row_n * ct.col_n AS DOUBLE) * n) AS chi2_cell
      |FROM cells c, tot, rt, ct
      |WHERE c.lang = rt.lang AND c.source = ct.source
      |ORDER BY c.lang, c.source""".stripMargin
}
