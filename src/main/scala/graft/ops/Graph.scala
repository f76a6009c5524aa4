package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph algorithms as relational plans — no GraphX, no RDDs:
  * a rank iteration is one join + one aggregation, which is exactly what
  * scales (Pregel-style message passing IS a shuffle on dst). */
object Graph {

  /** PageRank iterations over the customer↔part co-purchase graph
    * (`g_copurchase_rank`): the bipartite random-walk centrality used to
    * weight corpus items by structural importance (a curation signal,
    * like perplexity or quality scores, but relational).
    *
    * Graph: an undirected edge per DISTINCT (customer, part) purchase
    * pair — customers encode as 2k, parts as 2k+1, so one long node id
    * space carries both sides. Ranks are integer PARTS-PER-BILLION with
    * floor division at every step (`div`/`//` — all values positive, so
    * floor = truncate and the two engines agree bit-for-bit):
    *
    *   r₀(v)   = 10⁹ div n
    *   rᵢ₊₁(v) = (15·(10⁹ div n)) div 100
    *           + (85 · Σ_{u→v} (rᵢ(u) div deg(u))) div 100
    *
    * [[PrIters]] unrolled iterations, replayed verbatim by the oracle
    * SQL's chained CTEs (the `s_kmeans_ivf` unrolling device). Each
    * iteration is ONE equi-join of the edge list with the rank table on
    * src plus ONE aggregation on dst — at any scale that is a shuffle
    * keyed by node id, and the edge list can be pre-partitioned by src so
    * successive iterations reuse the exchange. Floor-division mass
    * leakage (the sub-ppb remainders) is deliberate: exactness of the
    * replay beats conservation of the 9th decimal.
    *
    * The driver holds only `n` (one count); ranks never leave the
    * cluster. Per-iteration localCheckpoint cuts the 3-deep join lineage
    * the same way the admission cache does. */
  val PrIters = 3

  def copurchaseRank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = graft.Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey")
      .join(graft.Tables.lineitem(spark, dir).select($"l_orderkey", $"l_partkey"),
        $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey".as("c"), $"l_partkey".as("p")).distinct()
    val edges = pairs.select(($"c" * 2).as("src"), ($"p" * 2 + 1).as("dst"))
      .unionAll(pairs.select(($"p" * 2 + 1).as("src"), ($"c" * 2).as("dst")))
      .localCheckpoint()
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("d"))
    // degree rides WITH the edge: one 3-column table replaces the
    // per-iteration (edges ⋈ deg) re-join — each iteration is then a
    // single equi-join + aggregation over this checkpointed relation
    val edgesDeg = edges.join(deg, "src")
      .select($"src", $"dst", $"d").localCheckpoint()
    val n = deg.count()
    val base = 1000000000L / n
    val jump = (15L * base) / 100L
    // r17 (optimization): iterations stay LAZY — at PrIters = 3 the fused
    // plan is shallow (the edgesDeg localCheckpoint above already caps
    // lineage at one RDD scan per iteration), so the per-iteration eager
    // localCheckpoint bought nothing and cost one full materialization
    // job per round (guide §1.2: don't pay for passes you don't need;
    // a long-iteration caller would re-add a checkpoint every ~8 rounds,
    // the Bpe.train cadence).
    var ranks = deg.select($"src".as("node"), lit(base).as("r"))
    for (_ <- 1 to PrIters) {
      ranks = edgesDeg
        .join(ranks, $"src" === $"node")
        .select($"dst", expr("r div d").as("contrib"))
        .groupBy($"dst")
        .agg((lit(jump) + expr("85 * sum(contrib) div 100")).as("r"))
        .select($"dst".as("node"), $"r")
    }
    ranks
      .select(when($"node" % 2 === 0, lit("customer")).otherwise(lit("part")).as("kind"),
        expr("node div 2").as("key"), $"r".as("rank_ppb"))
      .orderBy($"rank_ppb".desc, $"kind", $"key")
      .limit(100)
  }

  /** Seed customer for the personalized walk (customer key 1 → node 2). */
  val PprSeedCust = 1L

  /** PERSONALIZED PageRank (`g_personalized_rank`): the random walk
    * restarts at ONE seed node instead of uniformly — the
    * "related items for THIS customer" recommender query, vs
    * [[copurchaseRank]]'s global importance. Only the jump term
    * changes: the seed gets the full 15% restart mass, everyone else
    * gets none, so rank concentrates in the seed's neighborhood.
    * Same integer-ppb floor arithmetic, same one-join-one-agg
    * iteration shape, same unrolled-CTE oracle; nodes the walk never
    * reaches simply drop out (sparse — at corpus scale the frontier
    * is the seed's k-hop ball, far smaller than the graph). */
  def personalizedRank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = graft.Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey")
      .join(graft.Tables.lineitem(spark, dir).select($"l_orderkey", $"l_partkey"),
        $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey".as("c"), $"l_partkey".as("p")).distinct()
    val edges = pairs.select(($"c" * 2).as("src"), ($"p" * 2 + 1).as("dst"))
      .unionAll(pairs.select(($"p" * 2 + 1).as("src"), ($"c" * 2).as("dst")))
      .localCheckpoint()
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("d"))
    val edgesDeg = edges.join(deg, "src")
      .select($"src", $"dst", $"d").localCheckpoint()
    val seed = PprSeedCust * 2
    val jumpAtSeed = (15L * 1000000000L) / 100L
    // the restart row is UNIONED in, not added via a dst-side CASE: on
    // this strictly bipartite graph the seed (even node) receives no
    // contribution on odd iterations, so a CASE on contributing dst
    // nodes would silently evaporate the 15% restart mass every other
    // step and the seed could never appear in its own ranking
    val seedJump = spark.range(1)
      .select(lit(seed).as("node"), lit(jumpAtSeed).as("r"))
    // lazy iterations — see copurchaseRank's r17 note
    var ranks = deg.select($"src".as("node"))
      .filter($"node" === seed).select($"node", lit(1000000000L).as("r"))
    for (_ <- 1 to PrIters) {
      ranks = edgesDeg
        .join(ranks, $"src" === $"node")
        .select($"dst".as("node"), expr("(85 * (r div d)) div 100").as("r"))
        .unionByName(seedJump)
        .groupBy($"node")
        .agg(sum($"r").as("r"))
    }
    ranks
      .select(when($"node" % 2 === 0, lit("customer")).otherwise(lit("part")).as("kind"),
        expr("node div 2").as("key"), $"r".as("rank_ppb"))
      .orderBy($"rank_ppb".desc, $"kind", $"key")
      .limit(100)
  }

  val personalizedRankSql: String = {
    val seed = PprSeedCust * 2
    def iter(prev: String, cur: String): String =
      s"""$cur AS (
         |  SELECT node, CAST(sum(r) AS BIGINT) AS r FROM (
         |    SELECT e.dst AS node, (85 * (r.r // d.d)) // 100 AS r
         |    FROM edges e
         |    JOIN $prev r ON e.src = r.node
         |    JOIN deg d ON e.src = d.src
         |    UNION ALL
         |    SELECT $seed AS node, (15 * 1000000000::BIGINT) // 100 AS r) u
         |  GROUP BY node)""".stripMargin
    s"""WITH pairs AS (
       |  SELECT DISTINCT o_custkey AS c, l_partkey AS p
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (
       |  SELECT c * 2 AS src, p * 2 + 1 AS dst FROM pairs
       |  UNION ALL
       |  SELECT p * 2 + 1 AS src, c * 2 AS dst FROM pairs),
       |deg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
       |r0 AS (
       |  SELECT src AS node, 1000000000::BIGINT AS r
       |  FROM deg WHERE src = $seed),
       |${iter("r0", "r1")},
       |${iter("r1", "r2")},
       |${iter("r2", "r3")}
       |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'part' END AS kind,
       |  node // 2 AS key, r AS rank_ppb
       |FROM r3
       |ORDER BY rank_ppb DESC, kind, key
       |LIMIT 100""".stripMargin
  }

  val copurchaseRankSql: String = {
    // CAST back to BIGINT: DuckDB widens sum(BIGINT) to HUGEINT, which
    // pandas would surface as float and break the hash compare
    def iter(prev: String, cur: String): String =
      s"""$cur AS (
         |  SELECT e.dst AS node,
         |    CAST((15 * ((1000000000::BIGINT) // (SELECT count(*) FROM deg))) // 100
         |      + (85 * sum(r.r // d.d)) // 100 AS BIGINT) AS r
         |  FROM edges e
         |  JOIN $prev r ON e.src = r.node
         |  JOIN deg d ON e.src = d.src
         |  GROUP BY e.dst)""".stripMargin
    s"""WITH pairs AS (
       |  SELECT DISTINCT o_custkey AS c, l_partkey AS p
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (
       |  SELECT c * 2 AS src, p * 2 + 1 AS dst FROM pairs
       |  UNION ALL
       |  SELECT p * 2 + 1 AS src, c * 2 AS dst FROM pairs),
       |deg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
       |r0 AS (
       |  SELECT src AS node,
       |    (1000000000::BIGINT) // (SELECT count(*) FROM deg) AS r
       |  FROM deg),
       |${iter("r0", "r1")},
       |${iter("r1", "r2")},
       |${iter("r2", "r3")}
       |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'part' END AS kind,
       |  node // 2 AS key, r AS rank_ppb
       |FROM r3
       |ORDER BY rank_ppb DESC, kind, key
       |LIMIT 100""".stripMargin
  }
}
