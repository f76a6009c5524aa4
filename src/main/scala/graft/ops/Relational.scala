package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Num._

/** Core relational queries over the driver test tables.
  *
  * Covers SURVEY.md §2 operators on TPC-H-ish data: scans with pruning
  * (S1-S3), projections/filters (P1-P5), broadcast + composite-key joins
  * (J1-J2, J4), multi-aggregates (A3), sort/limit (O1).
  *
  * Scale notes (100 TB design): filters appear before joins so Catalyst
  * pushes them into the parquet scan; dimension tables get explicit
  * `broadcast()` hints; fact-fact joins shuffle on their natural keys and
  * benefit from AQE; every aggregate is map-side combinable.
  */
object Relational {

  private def ts(s: String) = lit(java.sql.Timestamp.valueOf(s))

  /** TPC-H Q1: pricing summary report. Ref: named multi-agg pattern
    * (eppa_analysis_all_plays.ipynb cells 4-5 — SURVEY §2.4 A3). */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= ts("1998-09-02 00:00:00"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").cast("long").as("sum_qty"),
        exactSum($"l_extendedprice").as("sum_base_price"),
        exactSum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        exactSum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("sum_charge"),
        (sum($"l_quantity").cast("double") / count(lit(1))).as("avg_qty"),
        exactAvg($"l_extendedprice").as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       |  ${sqlExactSum("l_extendedprice")} AS sum_base_price,
       |  ${sqlExactSum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       |  ${sqlExactSum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
       |  (CAST(sum(l_quantity) AS DOUBLE) / count(*)) AS avg_qty,
       |  ${sqlExactAvg("l_extendedprice")} AS avg_price,
       |  count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-ish: top-10 orders by revenue for one market segment.
    * Join shape J2 (composite keys), topk O1. The customer→orders join
    * broadcasts the filtered customer side; orders→lineitem shuffles on
    * orderkey (both already hash-partitionable on the key at scale). */
  def q3TopOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
      .filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey")
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" < ts("1998-03-15 00:00:00"))
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val li = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" > ts("1995-03-15 00:00:00"))
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate")
      .agg(exactSum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .select($"l_orderkey", $"revenue",
        date_format($"o_orderdate", "yyyy-MM-dd").as("orderdate"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  val q3Sql: String =
    s"""SELECT l_orderkey,
       |  ${sqlExactSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
       |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
       |GROUP BY l_orderkey, o_orderdate
       |ORDER BY revenue DESC, l_orderkey
       |LIMIT 10""".stripMargin

  /** TPC-H Q5-ish: revenue per nation via a 6-way join (region, nation
    * broadcast; customer/supplier co-partitioned on nationkey; the
    * orders⋈lineitem fact join shuffles on orderkey). J1/J2/J4 shapes. */
  def q5RegionRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val region = Tables.region(spark, dir).filter($"r_name" =!= "EUROPE")
    val nation = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir)
    val supp = Tables.supplier(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= ts("1996-01-01 00:00:00") &&
              $"o_orderdate" < ts("1998-01-01 00:00:00"))
    val li = Tables.lineitem(spark, dir)
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(supp, $"l_suppkey" === $"s_suppkey")
      .join(cust, $"o_custkey" === $"c_custkey" &&
                  $"s_nationkey" === $"c_nationkey")
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(exactSum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
           count(lit(1)).as("n_lineitems"))
      .orderBy($"revenue".desc, $"n_name")
  }

  val q5Sql: String =
    s"""SELECT n_name,
       |  ${sqlExactSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  count(*) AS n_lineitems
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name <> 'EUROPE'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q6: forecast revenue change — pure scan+filter+agg, the shape
    * where predicate pushdown matters most (P4 range predicates).
    * `.explain` must show PushedFilters on shipdate/discount/quantity. */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= ts("1996-01-01 00:00:00") &&
              $"l_shipdate" < ts("1997-01-01 00:00:00") &&
              $"l_discount" >= 0.05 && $"l_discount" <= 0.07 &&
              $"l_quantity" < 24)
      .agg(exactSum($"l_extendedprice" * $"l_discount").as("revenue"),
           count(lit(1)).as("n_rows"))
  }

  val q6Sql: String =
    s"""SELECT ${sqlExactSum("l_extendedprice * l_discount")} AS revenue,
       |  count(*) AS n_rows
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
       |  AND l_discount >= 0.05 AND l_discount <= 0.07
       |  AND l_quantity < 24""".stripMargin

  /** TPC-H Q4 shape (adapted: the test lineitem has no commit/receipt
    * dates, so "late" = shipped >60 days after the order date): order
    * counts per priority for one quarter, EXISTS-gated on a late line.
    * The EXISTS compiles to a LEFT SEMI join — each order emitted at most
    * once no matter how many lines match, with the non-equi date predicate
    * evaluated inside the join. Scale: semi joins shuffle only the two key
    * columns and short-circuit on first match. */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= ts("1995-01-01 00:00:00") &&
              $"o_orderdate" < ts("1995-04-01 00:00:00"))
    val li = Tables.lineitem(spark, dir).select($"l_orderkey", $"l_shipdate")
    ord.join(li,
        $"o_orderkey" === $"l_orderkey" &&
          $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy($"o_orderpriority")
  }

  val q4Sql: String =
    """SELECT o_orderpriority, count(*) AS n_orders
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1995-04-01 00:00:00'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q13 shape: customer distribution by order count — a left outer
    * join with a build-side predicate feeding a two-level aggregation
    * (count per customer, then histogram of those counts). The classic
    * "count(right_key) counts only matches" outer-join idiom. */
  def q13CustDist(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderpriority" =!= "1-URGENT")
      .select($"o_custkey", $"o_orderkey")
    Tables.customer(spark, dir).select($"c_custkey")
      .join(ord, $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  val q13Sql: String =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer
      |  LEFT JOIN (SELECT o_custkey, o_orderkey FROM orders
      |             WHERE o_orderpriority <> '1-URGENT') o
      |    ON c_custkey = o_custkey
      |  GROUP BY c_custkey) t
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q18 shape (large-volume customers): the IN-subquery over an
    * aggregate HAVING decorrelates to a semi join against the aggregated
    * lineitem — Spark-side we state the semi join directly. The big-order
    * key set is small (HAVING keeps the tail) so it broadcasts; the
    * customer join stays a shuffle join on the fact side. Quantities are
    * integral-valued doubles, so the BIGINT cast of their sum is exact in
    * both engines. */
  def q18BigOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir).select($"l_orderkey", $"l_quantity")
    val bigOrders = li.groupBy($"l_orderkey")
      .agg(sum($"l_quantity").as("qty"))
      .filter($"qty" > 250)
      .select($"l_orderkey".as("big_orderkey"))
    val ord = Tables.orders(spark, dir)
      .join(broadcast(bigOrders), $"o_orderkey" === $"big_orderkey", "left_semi")
    Tables.customer(spark, dir).select($"c_custkey", $"c_name")
      .join(ord, $"c_custkey" === $"o_custkey")
      .join(li, $"o_orderkey" === $"l_orderkey")
      .groupBy($"c_name", $"c_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
      .agg(sum($"l_quantity").cast("long").as("total_qty"))
      .select($"c_name", $"c_custkey", $"o_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("orderdate"),
        $"o_totalprice", $"total_qty")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(100)
  }

  val q18Sql: String =
    """SELECT c_name, c_custkey, o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
      |  o_totalprice, CAST(sum(l_quantity) AS BIGINT) AS total_qty
      |FROM customer, orders, lineitem
      |WHERE o_orderkey IN (
      |    SELECT l_orderkey FROM lineitem
      |    GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
      |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin

  /** TPC-H Q21 shape (suppliers who kept the order waiting), re-expressed
    * over this dataset's columns: per supplier, count 'F'-status orders
    * where that supplier's line came back 'R' (EXISTS another supplier on
    * the order, NOT EXISTS another supplier who also returned). The
    * classic multi-correlated-subquery pair decorrelates to a semi join
    * plus an anti join on the same (orderkey, suppkey-≠) predicate —
    * stated directly, which is exactly what Catalyst's
    * RewritePredicateSubquery produces from the EXISTS form. */
  def q21LateSuppliers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_returnflag")
    val l1 = li.filter($"l_returnflag" === "R")
      .join(Tables.orders(spark, dir).filter($"o_orderstatus" === "F")
          .select($"o_orderkey"),
        $"l_orderkey" === $"o_orderkey", "left_semi")
    val others = li.select($"l_orderkey".as("o2_orderkey"), $"l_suppkey".as("o2_suppkey"))
    val othersR = li.filter($"l_returnflag" === "R")
      .select($"l_orderkey".as("o3_orderkey"), $"l_suppkey".as("o3_suppkey"))
    l1
      .join(others,
        $"l_orderkey" === $"o2_orderkey" && $"l_suppkey" =!= $"o2_suppkey",
        "left_semi")
      .join(othersR,
        $"l_orderkey" === $"o3_orderkey" && $"l_suppkey" =!= $"o3_suppkey",
        "left_anti")
      .groupBy($"l_suppkey")
      .agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"l_suppkey")
      .limit(100)
  }

  val q21Sql: String =
    """SELECT l1.l_suppkey, count(*) AS numwait
      |FROM lineitem l1
      |JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
      |WHERE l1.l_returnflag = 'R'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_returnflag = 'R')
      |GROUP BY l1.l_suppkey
      |ORDER BY numwait DESC, l1.l_suppkey
      |LIMIT 100""".stripMargin

  /** TPC-H Q17 shape (small-quantity revenue): the correlated scalar
    * subquery `l_quantity < 0.2 * (SELECT avg(l_quantity) ...)` joins the
    * per-part aggregate back to the lines. The float average would make
    * boundary rows engine-dependent, so the predicate is restated in
    * exact integer arithmetic — `5·q·n < Σq` over BIGINTs (quantities are
    * integral) — which is the same inequality with both sides multiplied
    * by 5n. The brand filter shrinks the part side to broadcast size.
    * The brand-filtered lineitem subtree is deliberately NOT persisted
    * although it feeds both the aggregate and the probe side: unlike
    * Q11/Q15 (where the shared piece is the part/supplier-sized
    * AGGREGATE), the shared piece here is fact-sized — re-scanning a
    * pruned columnar projection is cheaper than caching it at scale. */
  def q17SmallQuantity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val parts = Tables.part(spark, dir)
      .filter($"p_brand" === "Brand#23").select($"p_partkey")
    val li = Tables.lineitem(spark, dir)
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
      .select($"l_partkey", $"l_quantity".cast("long").as("qty"),
        $"l_extendedprice")
    val perPart = li.groupBy($"l_partkey".as("agg_partkey"))
      .agg(count(lit(1)).as("cnt"), sum($"qty").as("sum_qty"))
    li.join(broadcast(perPart), $"l_partkey" === $"agg_partkey")
      .filter($"qty" * 5 * $"cnt" < $"sum_qty")
      .agg(exactSum($"l_extendedprice").as("total_small_qty_price"),
        count(lit(1)).as("n_lines"))
  }

  val q17Sql: String =
    s"""SELECT ${sqlExactSum("l_extendedprice")} AS total_small_qty_price,
       |  count(*) AS n_lines
       |FROM lineitem
       |JOIN part ON p_partkey = l_partkey AND p_brand = 'Brand#23'
       |JOIN (
       |  SELECT l_partkey AS agg_partkey, count(*) AS cnt,
       |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
       |  FROM lineitem
       |  JOIN part ON p_partkey = l_partkey AND p_brand = 'Brand#23'
       |  GROUP BY l_partkey) a ON agg_partkey = l_partkey
       |WHERE CAST(l_quantity AS BIGINT) * 5 * cnt < sum_qty""".stripMargin

  /** TPC-H Q22 shape (global-customer sales opportunity), re-expressed by
    * nation since the testdata carries no phone column: customers with an
    * account balance above the average POSITIVE balance and no orders at
    * no URGENT orders — a global scalar subquery plus an anti join
    * against a filtered order set (the unfiltered form is empty at small
    * scale factors, where every customer has some order). The average
    * comparison is restated exactly as `bal_micros · n > Σ micros` over
    * BIGINTs, so no float average crosses engines. The one-row global
    * aggregate broadcasts; the anti join runs on the orders key. (The
    * customer projection is scanned twice — once for the global average,
    * once for the probe; like Q17 and unlike Q11/Q15, the shared subtree
    * is table-sized, so the re-scan beats caching it.) */
  def q22NoOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_nationkey", $"c_acctbal",
        micros($"c_acctbal").as("bal_u"))
    val globalAvg = cust.filter($"c_acctbal" > 0.0)
      .agg(count(lit(1)).as("n_pos"), sum($"bal_u").as("sum_u"))
    cust.crossJoin(broadcast(globalAvg))
      .filter($"bal_u" * $"n_pos" > $"sum_u")
      .join(Tables.orders(spark, dir)
          .filter($"o_orderpriority" === "1-URGENT").select($"o_custkey"),
        $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("numcust"), exactSum($"c_acctbal").as("totacctbal"))
      .orderBy($"c_nationkey")
  }

  val q22Sql: String =
    s"""WITH cust AS (
       |  SELECT c_custkey, c_nationkey, c_acctbal,
       |    ${sqlMicros("c_acctbal")} AS bal_u
       |  FROM customer),
       |g AS (SELECT count(*) AS n_pos, CAST(sum(bal_u) AS BIGINT) AS sum_u
       |      FROM cust WHERE c_acctbal > 0.0)
       |SELECT c_nationkey, count(*) AS numcust,
       |  ${sqlExactSum("c_acctbal")} AS totacctbal
       |FROM cust, g
       |WHERE bal_u * n_pos > sum_u
       |  AND NOT EXISTS (SELECT 1 FROM orders
       |                  WHERE o_custkey = c_custkey
       |                    AND o_orderpriority = '1-URGENT')
       |GROUP BY c_nationkey
       |ORDER BY c_nationkey""".stripMargin

  /** TPC-H Q7 shape (volume shipping between two nations): the 5-table
    * join chain lineitem→orders→customer + lineitem→supplier, each end
    * resolved to a nation, filtered to one ordered nation pair per
    * direction. Both nation-resolved key maps (supplier→nation,
    * customer-of-order→nation) are dimension-sized after their filters
    * and broadcast; only the lineitem scan shuffles — once, for the final
    * group-by. Revenue sums are micros-quantized. */
  def q7ShippingVolume(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nations = Seq("NATION_3", "NATION_7")
    val nat = Tables.nation(spark, dir).filter($"n_name".isin(nations: _*))
      .select($"n_nationkey", $"n_name")
    val supp = Tables.supplier(spark, dir)
      .join(nat, $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("supp_nation"))
    val custNat = Tables.customer(spark, dir)
      .join(nat, $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"n_name".as("cust_nation"))
    val ordNat = Tables.orders(spark, dir)
      .join(custNat, $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"cust_nation")
    Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate",
        ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("volume"))
      .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
      // orders-side map is NOT hinted: nation-filtered orders are ~8% of
      // the table — broadcastable at test scale (AQE will), a shuffle
      // join at 100 TB. Let the planner pick per-scale.
      .join(ordNat, $"l_orderkey" === $"o_orderkey")
      .filter($"supp_nation" =!= $"cust_nation")
      .groupBy($"supp_nation", $"cust_nation",
        year($"l_shipdate").cast("long").as("l_year"))
      .agg(exactSum($"volume").as("revenue"), count(lit(1)).as("n_lines"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  val q7Sql: String =
    s"""SELECT supp_nation, cust_nation, l_year,
       |  ${sqlExactSum("volume")} AS revenue, count(*) AS n_lines
       |FROM (
       |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
       |    l_extendedprice * (1.0 - l_discount) AS volume
       |  FROM lineitem
       |  JOIN supplier ON s_suppkey = l_suppkey
       |  JOIN nation n1 ON n1.n_nationkey = s_nationkey
       |  JOIN orders ON o_orderkey = l_orderkey
       |  JOIN customer ON c_custkey = o_custkey
       |  JOIN nation n2 ON n2.n_nationkey = c_nationkey
       |  WHERE n1.n_name IN ('NATION_3', 'NATION_7')
       |    AND n2.n_name IN ('NATION_3', 'NATION_7')
       |    AND n1.n_name <> n2.n_name) t
       |GROUP BY 1, 2, 3
       |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** TPC-H Q8 shape (market share): one nation's supplier share of a
    * region's revenue per year. The share is a division of two sums over
    * the SAME quantized micros rows — identical BIGINT numerators and
    * denominators on both engines, so the one double division at the end
    * is bit-identical too. Conditional aggregation (sum of CASE) replaces
    * Q8's correlated structure; every dimension side broadcasts. */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val target = "NATION_5"
    val regionNations = Tables.nation(spark, dir)
      .join(Tables.region(spark, dir).filter($"r_name" === "ASIA"),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name")
    val cust = Tables.customer(spark, dir)
      .join(broadcast(regionNations), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey")
    val ordCust = Tables.orders(spark, dir)
      .join(cust, $"o_custkey" === $"c_custkey", "left_semi")
      .select($"o_orderkey", $"o_orderdate")
    val suppNat = Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir).select($"n_nationkey", $"n_name"),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("supp_nation"))
    Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_suppkey",
        micros($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("vol_u"))
      // region-filtered orders are a fact-sized side at 100 TB: no hint
      .join(ordCust, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(suppNat), $"l_suppkey" === $"s_suppkey")
      .groupBy(year($"o_orderdate").cast("long").as("o_year"))
      .agg(
        sum(when($"supp_nation" === target, $"vol_u").otherwise(0L)).as("target_u"),
        sum($"vol_u").as("total_u"))
      .select($"o_year",
        ($"target_u" / $"total_u").as("mkt_share"),
        ($"target_u" / lit(1e6)).as("target_volume"),
        ($"total_u" / lit(1e6)).as("total_volume"))
      .orderBy($"o_year")
  }

  val q8Sql: String =
    s"""SELECT o_year,
       |  (target_u / CAST(total_u AS DOUBLE)) AS mkt_share,
       |  (target_u / 1000000.0) AS target_volume,
       |  (total_u / 1000000.0) AS total_volume
       |FROM (
       |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |    CAST(sum(CASE WHEN n2.n_name = 'NATION_5'
       |      THEN ${sqlMicros("l_extendedprice * (1.0 - l_discount)")}
       |      ELSE 0 END) AS BIGINT) AS target_u,
       |    CAST(sum(${sqlMicros("l_extendedprice * (1.0 - l_discount)")})
       |      AS BIGINT) AS total_u
       |  FROM lineitem
       |  JOIN orders ON o_orderkey = l_orderkey
       |  JOIN customer ON c_custkey = o_custkey
       |  JOIN nation n1 ON n1.n_nationkey = c_nationkey
       |  JOIN region ON r_regionkey = n1.n_regionkey AND r_name = 'ASIA'
       |  JOIN supplier ON s_suppkey = l_suppkey
       |  JOIN nation n2 ON n2.n_nationkey = s_nationkey
       |  GROUP BY 1) t
       |ORDER BY o_year""".stripMargin
}
