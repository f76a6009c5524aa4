package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Num._

/** Scalar-function coverage (SURVEY §2.8): math, string, date,
  * conditional-update families, plus weighted means (A12) and centered
  * rolling windows (W3).
  *
  * Math functions are per-row quantized to micros BEFORE aggregation:
  * JVM and libm transcendentals agree to ~2 ulp, so quantizing at 1e-6
  * granularity then summing exact integers makes cross-engine hashes
  * stable (direct float sums of sin/exp would not be).
  */
object Scalars {

  /** Math family: sin/cos/atan2/sqrt/exp/pow/log1p/mod arithmetic over
    * lineitem, exact-aggregated per return flag. */
  def mathFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        exactSum(sin($"l_quantity") + cos($"l_discount")).as("sum_trig"),
        exactSum(sqrt($"l_extendedprice")).as("sum_sqrt_price"),
        exactSum(exp(-$"l_discount")).as("sum_exp_disc"),
        exactSum(atan2($"l_quantity", lit(10.0) + $"l_tax")).as("sum_atan2"),
        exactSum(pow(lit(1.0) + $"l_tax", 2.0)).as("sum_pow_tax"),
        exactSum(log1p($"l_quantity")).as("sum_log1p_qty"),
        // positive modulus: ((x % m) + m) % m, same formula both engines
        sum(((($"l_orderkey" % 7) + 7) % 7)).as("sum_mod7"),
        exactSum(greatest($"l_discount", $"l_tax") - least($"l_discount", $"l_tax"))
          .as("sum_spread"),
        exactSum(radians($"l_quantity")).as("sum_radians"))
      .orderBy("l_returnflag")
  }

  val mathFuncsSql: String =
    s"""SELECT l_returnflag,
       |  ${sqlExactSum("sin(l_quantity) + cos(l_discount)")} AS sum_trig,
       |  ${sqlExactSum("sqrt(l_extendedprice)")} AS sum_sqrt_price,
       |  ${sqlExactSum("exp(-l_discount)")} AS sum_exp_disc,
       |  ${sqlExactSum("atan2(l_quantity, 10.0 + l_tax)")} AS sum_atan2,
       |  ${sqlExactSum("pow(1.0 + l_tax, 2.0)")} AS sum_pow_tax,
       |  ${sqlExactSum("ln(1 + l_quantity)")} AS sum_log1p_qty,
       |  CAST(sum(((l_orderkey % 7) + 7) % 7) AS BIGINT) AS sum_mod7,
       |  ${sqlExactSum("greatest(l_discount, l_tax) - least(l_discount, l_tax)")} AS sum_spread,
       |  ${sqlExactSum("radians(l_quantity)")} AS sum_radians
       |FROM lineitem
       |GROUP BY l_returnflag
       |ORDER BY l_returnflag""".stripMargin

  /** String family: concat/split/substring/pad/case/trim/replace/locate
    * over customer names (`'_'.join` and `split()[-1]` patterns —
    * completion_probability_torch.py:43, visualize.py:366). */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .select(
        $"c_custkey",
        concat_ws("_", $"c_mktsegment", $"c_custkey").as("unique_id"),
        element_at(split($"c_name", "#"), -1).cast("long").as("name_num"),
        upper(substring($"c_mktsegment", 1, 3)).as("seg3"),
        lpad($"c_custkey".cast("string"), 8, "0").as("padded"),
        length(regexp_replace($"c_name", "[0-9]", "")).cast("long").as("alpha_len"),
        instr($"c_name", "#").cast("long").as("hash_pos"))
      .orderBy("c_custkey")
  }

  val stringFuncsSql: String =
    """SELECT c_custkey,
      |  concat_ws('_', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS unique_id,
      |  CAST(string_split(c_name, '#')[-1] AS BIGINT) AS name_num,
      |  upper(substring(c_mktsegment, 1, 3)) AS seg3,
      |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
      |  CAST(len(regexp_replace(c_name, '[0-9]', '', 'g')) AS BIGINT) AS alpha_len,
      |  CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  /** Date family: year/quarter/month extraction and day arithmetic over
    * orders (§2.8 date/time; timestamps already µs-identical). */
  def dateFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy(year($"o_orderdate").as("yr"), quarter($"o_orderdate").as("qtr"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(month($"o_orderdate")).as("n_months"),
        min(date_format($"o_orderdate", "yyyy-MM-dd")).as("first_day"),
        max(date_format(date_add($"o_orderdate", 30), "yyyy-MM-dd")).as("last_day_plus30"),
        sum(dayofmonth($"o_orderdate")).cast("long").as("sum_dom"))
      .orderBy("yr", "qtr")
  }

  val dateFuncsSql: String =
    """SELECT year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr,
      |  count(*) AS n_orders,
      |  count(DISTINCT month(o_orderdate)) AS n_months,
      |  min(strftime(o_orderdate, '%Y-%m-%d')) AS first_day,
      |  max(strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d')) AS last_day_plus30,
      |  CAST(sum(day(o_orderdate)) AS BIGINT) AS sum_dom
      |FROM orders
      |GROUP BY 1, 2
      |ORDER BY yr, qtr""".stripMargin

  /** P6/P7 conditional column update + row invalidation: normalize
    * priority codes in place, null out cancelled orders' totals, count
    * both (normalize.py:44's masked in-place update pattern). */
  def conditionalUpdate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .withColumn("priority_class",
        when($"o_orderpriority".startsWith("1"), "URGENT")
          .when($"o_orderpriority".startsWith("2"), "HIGH")
          .otherwise("NORMAL"))
      .withColumn("effective_total",
        when($"o_orderstatus" === "F", $"o_totalprice").otherwise(lit(null)))
      .groupBy("priority_class")
      .agg(count(lit(1)).as("n_orders"),
        count($"effective_total").as("n_final"),
        exactSum(coalesce($"effective_total", lit(0.0))).as("final_total"))
      .orderBy("priority_class")
  }

  val conditionalUpdateSql: String =
    s"""SELECT
       |  CASE WHEN o_orderpriority LIKE '1%' THEN 'URGENT'
       |       WHEN o_orderpriority LIKE '2%' THEN 'HIGH'
       |       ELSE 'NORMAL' END AS priority_class,
       |  count(*) AS n_orders,
       |  count(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END) AS n_final,
       |  ${sqlExactSum("coalesce(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END, 0.0)")} AS final_total
       |FROM orders
       |GROUP BY 1
       |ORDER BY priority_class""".stripMargin

  /** A12 weighted mean: quantity-weighted average price per part brand
    * (broadcast dim join), exact integer arithmetic end-to-end. */
  def weightedMean(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val part = Tables.part(spark, dir).select($"p_partkey", $"p_brand")
    Tables.lineitem(spark, dir)
      .join(broadcast(part), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(
        (sum(micros($"l_extendedprice" * $"l_quantity")) /
          sum($"l_quantity").cast("long") / 1e6).as("wavg_price"),
        sum($"l_quantity").cast("long").as("total_qty"))
      .orderBy("p_brand")
  }

  val weightedMeanSql: String =
    s"""SELECT p_brand,
       |  sum(${sqlMicros("l_extendedprice * l_quantity")})
       |    / CAST(sum(l_quantity) AS BIGINT) / 1000000.0 AS wavg_price,
       |  CAST(sum(l_quantity) AS BIGINT) AS total_qty
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_brand
       |ORDER BY p_brand""".stripMargin

  /** W3 centered rolling window: ±2-event centered sum per user. */
  def centeredRolling(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(-2, 2)
    Tables.events(spark, dir)
      .withColumn("centered_micros", sum(micros($"value")).over(w))
      .withColumn("n_in_frame", count(lit(1)).over(w))
      .select($"event_id", $"user_id",
        ($"centered_micros" / 1e6).as("centered_sum"), $"n_in_frame")
      .orderBy("event_id")
  }

  val centeredRollingSql: String =
    s"""SELECT event_id, user_id,
       |  (sum(${sqlMicros("value")}) OVER w / 1000000.0) AS centered_sum,
       |  count(*) OVER w AS n_in_frame
       |FROM events
       |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
       |             ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
       |ORDER BY event_id""".stripMargin
}
