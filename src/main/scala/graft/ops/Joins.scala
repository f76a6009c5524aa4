package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Num._

/** Join-shape coverage (SURVEY.md §2.3): left outer (J4), semi/anti (J9),
  * grid cross-join (J11), derived-aggregate self-join (J3).
  *
  * Scale: anti/semi joins broadcast their filter side when small; the
  * cross-grid join generates the grid with `sequence` (no data shuffle at
  * all) and left-joins facts onto it broadcast-wise.
  */
object Joins {

  /** J4: left outer join — every customer with order count and spend,
    * zero-filled for customers who never ordered. */
  def leftOuterOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir)
    val perCust = ord.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), exactSum(col("o_totalprice")).as("spend"))
    cust.join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("spend"), lit(0.0)).as("spend"))
      .orderBy("c_custkey")
  }

  val leftOuterOrdersSql: String =
    s"""SELECT c_custkey,
       |  coalesce(n_orders, 0) AS n_orders,
       |  coalesce(spend, 0.0) AS spend
       |FROM customer
       |LEFT JOIN (
       |  SELECT o_custkey, count(*) AS n_orders,
       |    ${sqlExactSum("o_totalprice")} AS spend
       |  FROM orders GROUP BY o_custkey) t
       |  ON c_custkey = o_custkey
       |ORDER BY c_custkey""".stripMargin

  /** J9 semi/anti: nations ranked by how many of their customers have
    * never placed an order (anti join), with active count (semi join). */
  def semiAntiCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir).select(col("o_custkey"))
    val never = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey").agg(count(lit(1)).as("n_inactive"))
    val active = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_nationkey").agg(count(lit(1)).as("n_active"))
    val nation = Tables.nation(spark, dir)
    // Left outer preserves the nation side, so only the aggregate (build)
    // sides are broadcast-able — hinting the preserved side is a no-op Spark
    // warns about.
    nation
      .join(broadcast(active), col("n_nationkey") === active("c_nationkey"), "left")
      .drop("c_nationkey")
      .join(broadcast(never), col("n_nationkey") === never("c_nationkey"), "left")
      .select(col("n_name"),
        coalesce(col("n_active"), lit(0L)).as("n_active"),
        coalesce(col("n_inactive"), lit(0L)).as("n_inactive"))
      .orderBy("n_name")
  }

  /** Runtime bloom-pruned fact/dim join: brand revenue over small parts.
    *
    * The selective dim side (p_size <= 5, ~1/10 of part) is sketched into
    * a BloomFilter (one tiny driver job), and the lineitem side is pruned
    * with `graft_bloom_might_contain` BEFORE its shuffle — at 100 TB this
    * is the difference between shuffling the whole fact table and
    * shuffling ~the matching tenth. The join is forced to shuffle (merge
    * hint) precisely because that's the regime where runtime pruning
    * pays; with a broadcast join the probe side never shuffles anyway.
    * False positives (1%) are eliminated by the join itself, so the
    * result is bit-identical to the unpruned plan — the oracle runs the
    * plain join. Spark's adaptive runtime filter does this same rewrite
    * automatically when statistics justify it; this operator makes the
    * pruning explicit and composable with non-join consumers. */
  def bloomPrunedJoin(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.BloomExpressions
    BloomExpressions.register(spark)
    val dim = Tables.part(spark, dir)
      .filter(col("p_size") <= 5)
      .select(col("p_partkey"), col("p_brand"))
    // one driver-side job over the (already filtered, projected) dim —
    // the sketch is mergeable, built distributed, collected as ~180 KB
    val bloom = dim.stat.bloomFilter("p_partkey", 100000, 0.01)
    val bloomLit = lit(BloomExpressions.serialize(bloom))
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      .filter(BloomExpressions.mightContain(bloomLit, col("l_partkey")))
      .join(dim.hint("merge"), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(Num.exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
             .as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy("p_brand")
  }

  val bloomPrunedJoinSql: String =
    s"""SELECT p_brand,
       |  ${Num.sqlExactSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  count(*) AS n_items
       |FROM lineitem
       |JOIN part ON l_partkey = p_partkey
       |WHERE p_size <= 5
       |GROUP BY p_brand
       |ORDER BY p_brand""".stripMargin

  val semiAntiCustomersSql: String =
    """SELECT n_name,
      |  coalesce(a.n_active, 0) AS n_active,
      |  coalesce(i.n_inactive, 0) AS n_inactive
      |FROM nation
      |LEFT JOIN (
      |  SELECT c_nationkey, count(*) AS n_active FROM customer
      |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |  GROUP BY c_nationkey) a ON n_nationkey = a.c_nationkey
      |LEFT JOIN (
      |  SELECT c_nationkey, count(*) AS n_inactive FROM customer
      |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |  GROUP BY c_nationkey) i ON n_nationkey = i.c_nationkey
      |ORDER BY n_name""".stripMargin

  /** J11 grid cross-join: dense month × event_type matrix with zero-filled
    * counts — the grid comes from sequence() (generated, never shuffled),
    * facts are left-joined on. Mirrors the reference's field-grid × T
    * expansion (consts.py:5-11 meshgrid → SURVEY J11). */
  def gridDensify(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val counts = ev
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), exactSum(col("value")).as("total_value"))
    val days = spark.range(1).select(explode(expr(
      "transform(sequence(0, 30), d -> date_format(date_add(to_date('2024-01-01'), d), 'yyyy-MM-dd'))"))
      .as("day"))
    val types = ev.select(col("event_type")).distinct()
    days.crossJoin(types)
      .join(counts, Seq("day", "event_type"), "left")
      .select(col("day"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("total_value"), lit(0.0)).as("total_value"))
      .orderBy("day", "event_type")
  }

  val gridDensifySql: String =
    s"""WITH counts AS (
       |  SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
       |    count(*) AS n, ${sqlExactSum("value")} AS total_value
       |  FROM events GROUP BY 1, 2),
       |days AS (
       |  SELECT strftime(DATE '2024-01-01' + INTERVAL (d) DAY, '%Y-%m-%d') AS day
       |  FROM UNNEST(range(0, 31)) AS t(d)),
       |types AS (SELECT DISTINCT event_type FROM events)
       |SELECT d.day, ty.event_type,
       |  coalesce(c.n, 0) AS n,
       |  coalesce(c.total_value, 0.0) AS total_value
       |FROM days d CROSS JOIN types ty
       |LEFT JOIN counts c ON c.day = d.day AND c.event_type = ty.event_type
       |ORDER BY d.day, ty.event_type""".stripMargin

  /** J3 derived-aggregate self-join, window-rewritten: each order's share
    * of its customer's total spend. The reference does filter→join-back
    * (normalize.py:35-37); the idiomatic Spark form is a whole-partition
    * window, saving the join and its shuffle. Output in exact basis
    * points. */
  def shareOfCustomerSpend(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("o_custkey")
    Tables.orders(spark, dir)
      .withColumn("cust_total_micros", sum(micros(col("o_totalprice"))).over(w))
      .select(col("o_orderkey"), col("o_custkey"),
        floor(micros(col("o_totalprice")) * 10000 / col("cust_total_micros"))
          .cast("long").as("share_bp"))
      .orderBy("o_orderkey")
  }

  val shareOfCustomerSpendSql: String =
    s"""SELECT o_orderkey, o_custkey,
       |  CAST(floor(${sqlMicros("o_totalprice")} * 10000
       |    / (sum(${sqlMicros("o_totalprice")})
       |       OVER (PARTITION BY o_custkey))) AS BIGINT) AS share_bp
       |FROM orders
       |ORDER BY o_orderkey""".stripMargin

  /** Max edit distance for [[fuzzyNameMatch]] candidates. */
  val FuzzyMaxDist = 4

  /** Entity-resolution fuzzy join with blocking: part names that are
    * edit-distance neighbors of each other within a block. The classic
    * approximate-string-join problem is O(n²) in comparisons; the scale
    * answer is the same as every dedup operator here — BLOCK first, so
    * the quadratic term applies per block, not per corpus. The block key
    * (the name's last token — "entity type") is exact and cheap; the
    * expensive predicate (levenshtein, a codegen builtin in both
    * engines) runs only inside the equi-join's residual condition.
    * De-duplicating to distinct names BEFORE pairing collapses the n²
    * term to distinct-name counts — at any corpus size the name
    * dictionary is orders of magnitude smaller than the row count, the
    * same dictionary-first trick record linkage systems use. Per-name
    * part counts re-attach afterwards so the output reads as a
    * resolution table (how many records each surface form covers). */
  def fuzzyNameMatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val names = Tables.part(spark, dir)
      .groupBy($"p_name")
      .agg(count(lit(1)).as("n_parts"))
      .withColumn("noun", element_at(split($"p_name", " "), -1))
    val a = names.select($"noun", $"p_name".as("name_a"), $"n_parts".as("n_a"))
    val b = names.select($"noun".as("noun_b"), $"p_name".as("name_b"),
      $"n_parts".as("n_b"))
    // the bounded form levenshtein(a, b, t) early-exits the DP once the
    // distance exceeds t (returns -1) — on a block of far-apart names the
    // common case costs O(t·len) instead of O(len²)
    a.join(b, $"noun" === $"noun_b" && $"name_a" < $"name_b" &&
        levenshtein($"name_a", $"name_b", FuzzyMaxDist) =!= -1)
      .select($"noun", $"name_a", $"name_b",
        levenshtein($"name_a", $"name_b").cast("long").as("dist"),
        $"n_a", $"n_b")
      .orderBy($"noun", $"name_a", $"name_b")
  }

  val fuzzyNameMatchSql: String =
    s"""WITH names AS (
       |  SELECT p_name, count(*) AS n_parts,
       |    string_split(p_name, ' ')[-1] AS noun
       |  FROM part GROUP BY p_name)
       |SELECT a.noun AS noun, a.p_name AS name_a, b.p_name AS name_b,
       |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
       |  a.n_parts AS n_a, b.n_parts AS n_b
       |FROM names a
       |JOIN names b ON a.noun = b.noun AND a.p_name < b.p_name
       |  AND levenshtein(a.p_name, b.p_name) <= $FuzzyMaxDist
       |ORDER BY a.noun, name_a, name_b""".stripMargin
}
