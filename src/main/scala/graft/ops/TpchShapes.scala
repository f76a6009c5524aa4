package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Num._

/** The remaining TPC-H query shapes (Q2, Q9, Q10, Q11, Q12, Q14, Q15,
  * Q16, Q19, Q20), re-expressed onto the driver test schema.
  *
  * The test tables carry no `partsupp`, `p_container`, or `l_shipmode`,
  * so the partsupp-centric queries are restated over the part↔supplier
  * relationship implied by lineitem — preserving each query's *plan
  * shape* (what the judge of an engine cares about), not its exact
  * business text:
  *
  *   - Q2's correlated-min subquery            → min-agg + equality re-join
  *   - Q11's group-vs-global-fraction HAVING   → broadcast scalar + integer
  *                                               cross-multiplied threshold
  *   - Q15's scalar-max view                   → max over an agg, re-joined
  *   - Q16's NOT IN supplier exclusion         → broadcast anti join
  *   - Q19's OR-of-ANDs join predicate         → single join, disjunctive
  *                                               residual condition
  *   - Q20's nested IN over an agg threshold   → two-level semi-join chain
  *
  * Float determinism follows the repo-wide rule ([[Num]]): every summed
  * money expression is quantized per-row to integer micros and aggregated
  * as BIGINT, so results hash-match DuckDB under any partitioning — the
  * property that also makes them reproducible on a real cluster.
  */
object TpchShapes {

  private def ts(s: String) = lit(java.sql.Timestamp.valueOf(s))

  /** TPC-H Q2 shape (min-cost supplier): for each STANDARD part of size
    * <= 10, the supplier(s) achieving the minimum unit price observed in
    * lineitem. The correlated subquery
    * `WHERE price = (SELECT min(price) ... WHERE p_partkey = partkey)`
    * decorrelates to a per-part min aggregate joined back on equality —
    * exact on integer micros, so the boundary row is engine-independent.
    *
    * Scale: the part filter broadcasts into the lineitem join; the
    * per-part min table is dimension-sized (one row per qualifying part)
    * and broadcasts back; the only shuffle is the lineitem aggregation. */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val parts = Tables.part(spark, dir)
      .filter($"p_type" === "STANDARD" && $"p_size" <= 10)
      .select($"p_partkey", $"p_name")
    val offers = Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_suppkey",
        micros($"l_extendedprice" / $"l_quantity").as("unit_u"))
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
    val minPer = offers.groupBy($"l_partkey".as("m_partkey"))
      .agg(min($"unit_u").as("min_u"))
    offers
      .join(broadcast(minPer),
        $"l_partkey" === $"m_partkey" && $"unit_u" === $"min_u")
      .join(Tables.supplier(spark, dir), $"l_suppkey" === $"s_suppkey")
      .select($"p_partkey", $"p_name", $"s_name", $"s_acctbal",
        ($"unit_u" / lit(1e6)).as("min_unit_price"))
      .distinct()
      .orderBy($"s_acctbal".desc, $"p_partkey", $"s_name")
      .limit(100)
  }

  val q2Sql: String =
    s"""WITH offers AS (
       |  SELECT l_partkey, l_suppkey, p_partkey, p_name,
       |    ${sqlMicros("l_extendedprice / l_quantity")} AS unit_u
       |  FROM lineitem
       |  JOIN part ON p_partkey = l_partkey
       |    AND p_type = 'STANDARD' AND p_size <= 10)
       |SELECT DISTINCT p_partkey, p_name, s_name, s_acctbal,
       |  (unit_u / 1000000.0) AS min_unit_price
       |FROM offers
       |JOIN (SELECT l_partkey AS m_partkey, min(unit_u) AS min_u
       |      FROM offers GROUP BY 1) m
       |  ON l_partkey = m_partkey AND unit_u = min_u
       |JOIN supplier ON s_suppkey = l_suppkey
       |ORDER BY s_acctbal DESC, p_partkey, s_name
       |LIMIT 100""".stripMargin

  /** TPC-H Q9 shape (product-type profit by nation and year): revenue
    * from parts matching a name pattern, grouped by the supplying
    * nation and ship year. The LIKE filter prunes part before the join;
    * part and the supplier→nation map both broadcast; lineitem shuffles
    * once for the final aggregate. */
  def q9NationProfit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val parts = Tables.part(spark, dir)
      .filter($"p_name".like("%widget%")).select($"p_partkey")
    val suppNat = Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("nation"))
    Tables.lineitem(spark, dir)
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
      .join(broadcast(suppNat), $"l_suppkey" === $"s_suppkey")
      .groupBy($"nation", year($"l_shipdate").cast("long").as("o_year"))
      .agg(exactSum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_profit"),
        count(lit(1)).as("n_lines"))
      .orderBy($"nation", $"o_year".desc)
  }

  val q9Sql: String =
    s"""SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS o_year,
       |  ${sqlExactSum("l_extendedprice * (1.0 - l_discount)")} AS sum_profit,
       |  count(*) AS n_lines
       |FROM lineitem
       |JOIN part ON p_partkey = l_partkey AND p_name LIKE '%widget%'
       |JOIN supplier ON s_suppkey = l_suppkey
       |JOIN nation ON n_nationkey = s_nationkey
       |GROUP BY 1, 2
       |ORDER BY nation, o_year DESC""".stripMargin

  /** TPC-H Q10 (returned-item reporting): top-20 customers by revenue
    * lost to returns in one quarter. Orders carries the pushed date
    * range, lineitem the returnflag filter; nation broadcasts; the
    * customer join shuffles on custkey (both sides key-partitioned). */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= ts("1995-10-01 00:00:00") &&
              $"o_orderdate" < ts("1996-01-01 00:00:00"))
      .select($"o_orderkey", $"o_custkey")
    val li = Tables.lineitem(spark, dir)
      .filter($"l_returnflag" === "R")
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, dir)),
        $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
      .agg(exactSum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  val q10Sql: String =
    s"""SELECT c_custkey, c_name, c_acctbal, n_name,
       |  ${sqlExactSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |  AND o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
       |GROUP BY 1, 2, 3, 4
       |ORDER BY revenue DESC, c_custkey
       |LIMIT 20""".stripMargin

  /** TPC-H Q11 shape (important stock): parts whose revenue through
    * ASIA-region suppliers exceeds 1/1000 of the region total. The
    * `HAVING sum(...) > frac * (SELECT sum(...) ...)` scalar subquery
    * decorrelates to a one-row global aggregate broadcast against the
    * per-part aggregate, with the fraction restated as an exact integer
    * cross-multiplication (`value_u * 1000 > total_u`) so no float
    * boundary crosses engines. The product stays far below 2^63 for any
    * plausible micros total (overflow at ~9.2e15 micros ≈ $9.2B of
    * region revenue per part — re-scale the fraction before that). */
  def q11ImportantParts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val asiaSupp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .join(Tables.region(spark, dir).filter($"r_name" === "ASIA"),
            $"n_regionkey" === $"r_regionkey")
          .select($"n_nationkey")),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey")
    val value = Tables.lineitem(spark, dir)
      .join(broadcast(asiaSupp), $"l_suppkey" === $"s_suppkey", "left_semi")
      .select($"l_partkey",
        micros($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("v_u"))
      .groupBy($"l_partkey")
      .agg(sum($"v_u").as("value_u"))
      // feeds BOTH the global total and the threshold filter; Spark does
      // not materialize shared subtrees, so without this the lineitem
      // scan and aggregation run twice (plan-audited). The persisted
      // object is part-count-sized at any corpus scale.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = value.agg(sum($"value_u").as("total_u"))
    value.crossJoin(broadcast(total))
      .filter($"value_u" * 1000 > $"total_u")
      .select($"l_partkey", ($"value_u" / lit(1e6)).as("part_value"))
      .orderBy($"part_value".desc, $"l_partkey")
  }

  val q11Sql: String =
    s"""WITH v AS (
       |  SELECT l_partkey,
       |    CAST(sum(${sqlMicros("l_extendedprice * (1.0 - l_discount)")})
       |      AS BIGINT) AS value_u
       |  FROM lineitem
       |  WHERE l_suppkey IN (
       |    SELECT s_suppkey FROM supplier
       |    JOIN nation ON n_nationkey = s_nationkey
       |    JOIN region ON r_regionkey = n_regionkey AND r_name = 'ASIA')
       |  GROUP BY 1)
       |SELECT l_partkey, (value_u / 1000000.0) AS part_value
       |FROM v, (SELECT CAST(sum(value_u) AS BIGINT) AS total_u FROM v) g
       |WHERE value_u * 1000 > total_u
       |ORDER BY part_value DESC, l_partkey""".stripMargin

  /** TPC-H Q12 shape (shipping-priority audit): per return flag, how
    * many 1996-shipped lines belong to high- vs low-priority orders —
    * the canonical conditional two-sum over a fact-fact join. Only the
    * join key and two small columns move through the shuffle. */
  def q12PriorityLines(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hi = Seq("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= ts("1996-01-01 00:00:00") &&
              $"l_shipdate" < ts("1997-01-01 00:00:00"))
      .select($"l_orderkey", $"l_returnflag")
      .join(Tables.orders(spark, dir).select($"o_orderkey", $"o_orderpriority"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_returnflag")
      .agg(
        sum(when($"o_orderpriority".isin(hi: _*), 1L).otherwise(0L)).as("high_line_count"),
        sum(when($"o_orderpriority".isin(hi: _*), 0L).otherwise(1L)).as("low_line_count"))
      .orderBy($"l_returnflag")
  }

  val q12Sql: String =
    """SELECT l_returnflag,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem
      |JOIN orders ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** TPC-H Q14 (promotion effect): the share of one month's revenue from
    * PROMO-type parts. Like Q8, the percentage divides two BIGINT micros
    * sums over the same rows, so the single double division at the end
    * is bit-identical across engines. Part broadcasts; the month filter
    * is pushed into the lineitem scan. */
  def q14PromoShare(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= ts("1996-09-01 00:00:00") &&
              $"l_shipdate" < ts("1996-10-01 00:00:00"))
      .select($"l_partkey",
        micros($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("v_u"))
      .join(broadcast(Tables.part(spark, dir).select($"p_partkey", $"p_type")),
        $"l_partkey" === $"p_partkey")
      .agg(
        sum(when($"p_type" === "PROMO", $"v_u").otherwise(0L)).as("promo_u"),
        sum($"v_u").as("total_u"))
      .select(
        (lit(100.0) * $"promo_u" / $"total_u").as("promo_pct"),
        ($"promo_u" / lit(1e6)).as("promo_revenue"),
        ($"total_u" / lit(1e6)).as("total_revenue"))
  }

  val q14Sql: String =
    s"""SELECT
       |  (100.0 * promo_u / total_u) AS promo_pct,
       |  (promo_u / 1000000.0) AS promo_revenue,
       |  (total_u / 1000000.0) AS total_revenue
       |FROM (
       |  SELECT
       |    CAST(sum(CASE WHEN p_type = 'PROMO'
       |      THEN ${sqlMicros("l_extendedprice * (1.0 - l_discount)")}
       |      ELSE 0 END) AS BIGINT) AS promo_u,
       |    CAST(sum(${sqlMicros("l_extendedprice * (1.0 - l_discount)")})
       |      AS BIGINT) AS total_u
       |  FROM lineitem
       |  JOIN part ON p_partkey = l_partkey
       |  WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00') t""".stripMargin

  /** TPC-H Q15 (top supplier): supplier(s) with the maximum quarterly
    * revenue. The view + scalar-max subquery decorrelates to a one-row
    * max over the per-supplier aggregate, broadcast back as an equality
    * filter — exact on BIGINT micros, so revenue ties surface in both
    * engines identically rather than depending on float rounding. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val revenue = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= ts("1996-01-01 00:00:00") &&
              $"l_shipdate" < ts("1996-04-01 00:00:00"))
      .groupBy($"l_suppkey")
      .agg(sum(micros($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("rev_u"))
      // shared by the max subquery and the equality filter — persist the
      // supplier-count-sized aggregate so lineitem scans once (plan-audited)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val maxRev = revenue.agg(max($"rev_u").as("max_u"))
    revenue.crossJoin(broadcast(maxRev))
      .filter($"rev_u" === $"max_u")
      .join(Tables.supplier(spark, dir), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", ($"rev_u" / lit(1e6)).as("total_revenue"))
      .orderBy($"s_suppkey")
  }

  val q15Sql: String =
    s"""WITH revenue AS (
       |  SELECT l_suppkey,
       |    CAST(sum(${sqlMicros("l_extendedprice * (1.0 - l_discount)")})
       |      AS BIGINT) AS rev_u
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
       |  GROUP BY 1)
       |SELECT s_suppkey, s_name, (rev_u / 1000000.0) AS total_revenue
       |FROM revenue
       |JOIN supplier ON s_suppkey = l_suppkey
       |WHERE rev_u = (SELECT max(rev_u) FROM revenue)
       |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q16 shape (supplier relationship count): distinct suppliers
    * per (brand, type, size) for mid-size non-Brand#1 parts, excluding
    * suppliers in arrears — the NOT IN subquery decorrelated to a
    * broadcast anti join BEFORE the distinct aggregation, so excluded
    * suppliers never enter the shuffle. */
  def q16SupplierCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val badSupp = Tables.supplier(spark, dir)
      .filter($"s_acctbal" < 0.0).select($"s_suppkey".as("bad_suppkey"))
    val parts = Tables.part(spark, dir)
      .filter($"p_brand" =!= "Brand#1" && $"p_size" <= 25)
      .select($"p_partkey", $"p_brand", $"p_type", $"p_size")
    Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_suppkey")
      .join(broadcast(badSupp), $"l_suppkey" === $"bad_suppkey", "left_anti")
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
  }

  val q16Sql: String =
    """SELECT p_brand, p_type, p_size,
      |  count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#1' AND p_size <= 25
      |  AND l_suppkey NOT IN (
      |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** TPC-H Q19 (discounted revenue, disjunctive predicates): one join
    * whose condition is an OR of three brand/size/quantity conjunctions.
    * Catalyst extracts the common `p_partkey = l_partkey` equi-key and
    * keeps the disjunction as a residual filter inside the hash join —
    * the shape that degrades to a cartesian product if the equi-key is
    * buried, which PlanSpec pins against. */
  def q19Disjunctive(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_quantity", $"l_extendedprice", $"l_discount")
    val part = Tables.part(spark, dir)
      .select($"p_partkey", $"p_brand", $"p_size")
    li.join(broadcast(part),
        $"l_partkey" === $"p_partkey" && (
          ($"p_brand" === "Brand#12" && $"p_size".between(1, 15) &&
            $"l_quantity".between(1, 15)) ||
          ($"p_brand" === "Brand#23" && $"p_size".between(1, 20) &&
            $"l_quantity".between(10, 25)) ||
          ($"p_brand" === "Brand#3" && $"p_size".between(1, 25) &&
            $"l_quantity".between(20, 35))))
      .agg(exactSum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val q19Sql: String =
    s"""SELECT ${sqlExactSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  count(*) AS n_lines
       |FROM lineitem
       |JOIN part ON p_partkey = l_partkey
       |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       |       AND l_quantity BETWEEN 1 AND 15)
       |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
       |       AND l_quantity BETWEEN 10 AND 25)
       |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 25
       |       AND l_quantity BETWEEN 20 AND 35)""".stripMargin

  /** TPC-H Q20 shape (excess-volume suppliers): EUROPE suppliers who
    * shipped more than 30 units of some SMALL-type part during 1996.
    * The nested `s_suppkey IN (SELECT ... WHERE l_partkey IN (...)
    * HAVING sum > k)` chain decorrelates to: part filter → per
    * (part, supplier) quantity aggregate with a threshold → semi join
    * into supplier. Quantities are integral doubles, so the BIGINT cast
    * makes the HAVING boundary exact. Each stage's output is strictly
    * smaller than its input — the agg result is pair-count-bounded and
    * broadcasts into the supplier semi join. */
  def q20ExcessSuppliers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val smallParts = Tables.part(spark, dir)
      .filter($"p_type" === "SMALL").select($"p_partkey")
    val bigPairs = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= ts("1996-01-01 00:00:00") &&
              $"l_shipdate" < ts("1997-01-01 00:00:00"))
      .join(broadcast(smallParts), $"l_partkey" === $"p_partkey", "left_semi")
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(sum($"l_quantity".cast("long")).as("qty"))
      .filter($"qty" > 30)
      .select($"l_suppkey")
    val euroNations = Tables.nation(spark, dir)
      .join(Tables.region(spark, dir).filter($"r_name" === "EUROPE"),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey")
    Tables.supplier(spark, dir)
      .join(broadcast(euroNations), $"s_nationkey" === $"n_nationkey", "left_semi")
      .join(broadcast(bigPairs), $"s_suppkey" === $"l_suppkey", "left_semi")
      .select($"s_suppkey", $"s_name", $"s_acctbal")
      .orderBy($"s_suppkey")
  }

  val q20Sql: String =
    """SELECT s_suppkey, s_name, s_acctbal
      |FROM supplier
      |WHERE s_nationkey IN (
      |    SELECT n_nationkey FROM nation
      |    JOIN region ON r_regionkey = n_regionkey AND r_name = 'EUROPE')
      |  AND s_suppkey IN (
      |    SELECT l_suppkey FROM lineitem
      |    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'SMALL')
      |      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |    GROUP BY l_partkey, l_suppkey
      |    HAVING CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) > 30)
      |ORDER BY s_suppkey""".stripMargin
}
