package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality audit (`t_dq_audit`): the referential-integrity and
  * domain-constraint checks an ingest pipeline runs before promoting a
  * batch — emitted as one (check, n_violations) table, the artifact a
  * data contract actually gates on.
  *
  * Distributed shape: checks that share an input share a PASS. All
  * row-local lineitem constraints (domain ranges, null keys) are
  * conditional sums inside ONE scan; the two lineitem↔orders checks
  * (orphaned lines, shipped-before-ordered) share ONE left join; the
  * customer orphan check is its own anti-join-shaped left join. Nothing
  * is per-check re-scanned — at 100 TB the audit costs two joins and a
  * scan no matter how many constraints it carries. Every count is an
  * exact integer, so the audit is hash-gated like any other query. */
object Quality {

  def dqAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // one scan: all row-local lineitem constraints
    val rowLocal = Tables.lineitem(spark, dir).agg(
      sum(when($"l_quantity" <= 0 || $"l_quantity".isNull, 1L).otherwise(0L))
        .as("bad_quantity"),
      sum(when($"l_discount" < 0 || $"l_discount" > 1, 1L).otherwise(0L))
        .as("bad_discount"),
      sum(when($"l_extendedprice" <= 0, 1L).otherwise(0L))
        .as("bad_price"),
      sum(when($"l_orderkey".isNull || $"l_partkey".isNull || $"l_suppkey".isNull,
        1L).otherwise(0L)).as("null_keys"))
    // one join: both cross-table lineitem checks
    val liOrders = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_shipdate")
      .join(Tables.orders(spark, dir).select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey", "left")
      .agg(
        sum(when($"o_orderkey".isNull, 1L).otherwise(0L)).as("orphan_lines"),
        sum(when($"o_orderkey".isNotNull && $"l_shipdate" < $"o_orderdate",
          1L).otherwise(0L)).as("shipped_before_ordered"))
    val ordCust = Tables.orders(spark, dir).select($"o_custkey")
      .join(Tables.customer(spark, dir).select($"c_custkey"),
        $"o_custkey" === $"c_custkey", "left")
      .agg(sum(when($"c_custkey".isNull, 1L).otherwise(0L)).as("orphan_orders"))
    val one = rowLocal.crossJoin(liOrders).crossJoin(ordCust)
    one.selectExpr(
        """stack(7,
          |  'bad_quantity', bad_quantity,
          |  'bad_discount', bad_discount,
          |  'bad_price', bad_price,
          |  'null_keys', null_keys,
          |  'orphan_lines', orphan_lines,
          |  'orphan_orders', orphan_orders,
          |  'shipped_before_ordered', shipped_before_ordered
          |) AS (check, n_violations)""".stripMargin)
      .orderBy("check")
  }

  val dqAuditSql: String =
    """WITH row_local AS (
      |  SELECT
      |    CAST(sum(CASE WHEN l_quantity <= 0 OR l_quantity IS NULL
      |      THEN 1 ELSE 0 END) AS BIGINT) AS bad_quantity,
      |    CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1
      |      THEN 1 ELSE 0 END) AS BIGINT) AS bad_discount,
      |    CAST(sum(CASE WHEN l_extendedprice <= 0
      |      THEN 1 ELSE 0 END) AS BIGINT) AS bad_price,
      |    CAST(sum(CASE WHEN l_orderkey IS NULL OR l_partkey IS NULL
      |      OR l_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_keys
      |  FROM lineitem),
      |li_orders AS (
      |  SELECT
      |    CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |      AS orphan_lines,
      |    CAST(sum(CASE WHEN o_orderkey IS NOT NULL AND l_shipdate < o_orderdate
      |      THEN 1 ELSE 0 END) AS BIGINT) AS shipped_before_ordered
      |  FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey),
      |ord_cust AS (
      |  SELECT CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS orphan_orders
      |  FROM orders LEFT JOIN customer ON o_custkey = c_custkey)
      |SELECT 'bad_quantity' AS "check", bad_quantity AS n_violations FROM row_local
      |UNION ALL SELECT 'bad_discount', bad_discount FROM row_local
      |UNION ALL SELECT 'bad_price', bad_price FROM row_local
      |UNION ALL SELECT 'null_keys', null_keys FROM row_local
      |UNION ALL SELECT 'orphan_lines', orphan_lines FROM li_orders
      |UNION ALL SELECT 'orphan_orders', orphan_orders FROM ord_cust
      |UNION ALL SELECT 'shipped_before_ordered', shipped_before_ordered FROM li_orders
      |ORDER BY "check"""".stripMargin
}
