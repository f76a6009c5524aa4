package graft

import org.apache.spark.sql.functions._

/** Semantics and plan-shape checks for the as-of join, the bucketed range
  * join, and the duplicate-cluster connected components. Each operator's
  * composed scale shape must agree with the naive definition it replaces
  * (the naive form is only feasible at spec scale — that's the point).
  */
class TemporalJoinsSpec extends SparkTestBase {
  import graft.ops.TemporalJoins

  test("asof join equals the naive greatest-ts-at-or-before definition") {
    val ev = Tables.events(spark, sfDir).withColumn("ts_us", unix_micros(col("ts")))
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id", "ts_us").agg(max("value").as("view_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = purchases.map { case (eid, uid, ts) =>
      val best = views.getOrElse(uid, Array.empty[(Long, Long, Double)])
        .filter(_._2 <= ts).sortBy(_._2).lastOption
      eid -> best.map(b => (b._2, b._3))
    }.toMap
    val got = TemporalJoins.asofLastView(spark, sfDir).collect().map { r =>
      r.getLong(0) -> (if (r.isNullAt(4)) None
                       else Some((r.getLong(4), r.getDouble(5))))
    }.toMap
    assert(got.size == expected.size)
    assert(got == expected)
  }

  test("asof join plan: one exchange on the key, no theta join") {
    val p = TemporalJoins.asofLastView(spark, sfDir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"asof degraded to a theta join:\n${p.take(1200)}")
    // the union-window form needs one user_id exchange for the windows
    // plus the (user_id, ts_us) exchange of the right-side dedup groupBy —
    // nothing else may shuffle
    val keyExchanges = p.linesIterator
      .count(l => l.contains("Arguments: hashpartitioning(user_id"))
    assert(keyExchanges <= 2, s"extra shuffles in asof plan:\n$p")
  }

  test("range pairs equal the naive quadratic definition") {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val expected = byUser.values.flatMap { arr =>
      val rows = arr.toSeq
      for {
        a <- rows; b <- rows
        if b._3 > a._3 && b._3 - a._3 <= TemporalJoins.RangeWindowUs
      } yield (a._2, b._2, b._3 - a._3)
    }.toSet
    val got = TemporalJoins.rangePairs(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
    assert(got.nonEmpty, "spec data produced no in-window pairs")
  }

  test("range join stays an equi hash join (bucketed), never nested-loop") {
    val p = TemporalJoins.rangePairs(spark, sfDir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join lost its bucket equi keys:\n${p.take(1200)}")
  }

  test("dup clusters: labels are transitive-closure minima of is_dup pairs") {
    val edges = graft.dedup.Dedup.lshJaccard(spark, sfDir)
      .filter(col("is_dup") === 1).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // driver-side union-find as the oracle-of-the-oracle
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val got = graft.dedup.Dedup.dupClusters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val docCount = Tables.documents(spark, sfDir).count()
    assert(got.length == docCount, "every document gets a cluster row")
    got.foreach { case (doc, cluster, keep) =>
      assert(cluster == find(doc), s"doc $doc: cluster $cluster != ${find(doc)}")
      assert(keep == (if (doc == cluster) 1 else 0))
    }
  }

  test("strict as-of excludes same-instant rows (no label leakage)") {
    import spark.implicits._
    import graft.ops.TemporalJoins
    val left = Seq((1L, 100L, "label")).toDF("k", "t", "what")
    val right = Seq((1L, 99L, 10.0), (1L, 100L, 99.0), (1L, 101L, 50.0))
      .toDF("k", "t", "feat")
    // default (at-or-before): the t=100 feature row matches
    val loose = TemporalJoins.asofJoin(left, right, Seq("k"), "t")
      .select("asof_feat").head().getDouble(0)
    assert(loose == 99.0)
    // strict: only the t=99 row is visible at the t=100 label
    val strict = TemporalJoins.asofJoin(left, right, Seq("k"), "t", strict = true)
      .select("asof_feat").head().getDouble(0)
    assert(strict == 10.0, "same-instant feature leaked into a strict as-of")
    // with no earlier row at all, strict yields null
    val none = TemporalJoins.asofJoin(
      Seq((1L, 99L, "l")).toDF("k", "t", "what"), right, Seq("k"), "t",
      strict = true).select("asof_feat").head()
    assert(none.isNullAt(0))
  }

  test("tolerance: stale matches are nulled, fresh ones identical to plain as-of") {
    import spark.implicits._
    val plain = TemporalJoins.asofLastView(spark, sfDir)
      .select($"event_id", $"last_view_ts_us", $"last_view_value", $"ts_us")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2), r.getLong(3)))))
      .toMap
    val tol = TemporalJoins.asofTolerance(spark, sfDir).collect()
    assert(tol.length == plain.size)
    var nFresh = 0; var nStale = 0
    tol.foreach { r =>
      val id = r.getLong(0)
      val fresh = r.getBoolean(6)
      plain(id) match {
        case Some((mts, mval, lts)) if lts - mts <= TemporalJoins.AsofMaxAgeUs =>
          assert(fresh && r.getLong(4) == mts && r.getDouble(5) == mval)
          nFresh += 1
        case other =>
          // stale match or no match at all: both must surface as nulls
          assert(!fresh && r.isNullAt(4) && r.isNullAt(5), s"$id $other")
          nStale += 1
      }
    }
    info(s"fresh=$nFresh stale-or-none=$nStale")
    assert(nFresh > 0, "no fresh matches — horizon too tight for the corpus")
    assert(nStale > 0, "no stale/none rows — the guard is not exercised")
  }
}
