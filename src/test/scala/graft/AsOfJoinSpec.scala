package graft

import org.apache.spark.sql.functions._
import graft.plans.AsOfJoinPlan

/** The custom as-of physical operator vs the composed union-window form:
  * row parity on adversarial fixtures, plus the plan shape that makes it
  * the better executor (two lean exchanges, no padded union, no window).
  */
class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  // (id, key, ts, payload) left; (key, ts, value) right
  private def leftDf = Seq(
    (1L, 10L, 100L, "a"),
    (2L, 10L, 200L, "b"),
    (3L, 10L, 200L, "b2"), // duplicate left ts
    (4L, 20L, 50L, "c"),   // key with right rows only later
    (5L, 30L, 500L, "d"),  // key with no right rows at all
    (6L, 40L, 400L, "e")   // exact-tie case against right (40, 400)
  ).toDF("id", "k", "t", "payload")

  private def rightDf = Seq(
    (10L, 90L, 1.0), (10L, 100L, 2.0), (10L, 150L, 3.0), (10L, 201L, 4.0),
    (20L, 60L, 5.0),
    (40L, 400L, 6.0), (40L, 399L, 7.0)
  ).toDF("k", "t", "v")

  private def native(l: org.apache.spark.sql.DataFrame,
                     r: org.apache.spark.sql.DataFrame,
                     strict: Boolean) =
    AsOfJoinPlan.asofJoinNative(
      l, r.select($"k".as("rk"), $"t".as("rt"), $"v"),
      Seq("k"), Seq("rk"), "t", "rt", strict)
      .select($"id", $"k", $"t", $"rt".as("asof_t"), $"v".as("asof_v"))

  private def composed(l: org.apache.spark.sql.DataFrame,
                       r: org.apache.spark.sql.DataFrame,
                       strict: Boolean) =
    graft.ops.TemporalJoins.asofJoin(l, r, Seq("k"), "t", strict)
      .select($"id", $"k", $"t", $"asof_t", $"asof_v")

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      r.getLong(0) -> (Option(r.get(3)), Option(r.get(4)))
    }.toMap

  test("fixture semantics: ties, misses, and strict mode") {
    val got = asMap(native(leftDf, rightDf, strict = false))
    assert(got(1L) == (Some(100L), Some(2.0)))  // tie at 100 matches
    assert(got(2L) == (Some(150L), Some(3.0)))  // 201 is in the future
    assert(got(3L) == (Some(150L), Some(3.0)))
    assert(got(4L) == (None, None))             // right rows only later
    assert(got(5L) == (None, None))             // key absent from right
    assert(got(6L) == (Some(400L), Some(6.0)))  // exact tie matches
    val strict = asMap(native(leftDf, rightDf, strict = true))
    assert(strict(1L) == (Some(90L), Some(1.0))) // tie excluded
    assert(strict(6L) == (Some(399L), Some(7.0)))
  }

  test("parity with the composed operator, both modes") {
    Seq(false, true).foreach { strict =>
      val n = asMap(native(leftDf, rightDf, strict))
      val c = asMap(composed(leftDf, rightDf, strict))
      assert(n == c, s"strict=$strict: $n vs $c")
    }
  }

  test("null keys and null times never match, empty right joins all-null") {
    val l = Seq((1L, Option(10L), Option(100L)), (2L, None, Option(100L)),
      (3L, Option(10L), None)).toDF("id", "k", "t")
    val r = Seq((Option(10L), Option(90L), 1.0),
      (Option.empty[Long], Option(50L), 2.0),
      (Option(10L), Option.empty[Long], 3.0))
      .toDF("rk", "rt", "v")
    val got = AsOfJoinPlan.asofJoinNative(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .select($"id", $"v").collect()
      .map(row => row.getLong(0) -> Option(row.get(1))).toMap
    assert(got == Map(1L -> Some(1.0), 2L -> None, 3L -> None))
    val empty = AsOfJoinPlan.asofJoinNative(
      l, r.limit(0), Seq("k"), Seq("rk"), "t", "rt")
    assert(empty.count() == 3 && empty.filter($"v".isNotNull).count() == 0)
  }

  test("randomized parity against the composed operator") {
    var seed = 42L
    def nxt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound + bound) % bound).toInt
    }
    (0 until 5).foreach { trial =>
      val l = (0 until 200).map(i =>
        (i.toLong, nxt(8).toLong, nxt(50).toLong, nxt(1000).toDouble))
        .toDF("id", "k", "t", "payload")
      val r = (0 until 300).map(_ =>
        (nxt(10).toLong, nxt(50).toLong, nxt(1000).toDouble))
        .distinctBy(x => (x._1, x._2)) // unique (key, ts): deterministic match
        .toDF("k", "t", "v")
      val n = asMap(native(l, r, trial % 2 == 0))
      val c = asMap(composed(l, r, trial % 2 == 0))
      assert(n == c, s"trial $trial differs")
    }
  }

  test("plan: AsOfJoinExec with one exchange per side, no union, no window") {
    val df = SparkEntry.queries("j_asof_native")(spark, sfDir)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // SparkPlan.nodeName strips the Exec suffix in explain output
    assert(p.contains("AsOfJoin"), p.take(1500))
    assert(!p.contains("Union"), "native path must not pad-union the sides")
    assert(!p.contains("Window"), "native path must not run a window engine")
    // three hash exchanges: left join key, right (user_id, ts_us) dedup
    // aggregate, right join key — the join itself adds ONE per side
    val hashParts = p.linesIterator
      .count(l => l.contains("Arguments: hashpartitioning"))
    assert(hashParts == 3, s"expected 2 join-side + 1 dedup-agg exchange:\n$p")
    // end to end it still answers correctly under this session
    assert(df.count() > 0)
  }
}
