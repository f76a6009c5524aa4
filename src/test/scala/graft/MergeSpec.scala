package graft

import org.apache.spark.sql.functions._
import graft.ops.Merge
import graft.ops.Merge.Matched

/** Clause-level semantics of [[graft.ops.Merge.mergeInto]] on small
  * fixtures: ordered first-true-wins matching, delete, insert, and
  * pass-through of both unmatched sides. */
class MergeSpec extends SparkTestBase {
  import spark.implicits._

  private def target = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
  ).toDF("id", "name", "bal")

  private def source = Seq(
    (1L, 5L),   // matched, first clause (delete)
    (2L, 100L), // matched, second clause (update)
    (9L, 7L)    // source-only (insert)
  ).toDF("id", "amt")

  test("ordered clauses: delete, update, insert, and pass-through") {
    val out = Merge.mergeInto(target, source, "id", "id",
      Seq(
        Matched(col("s.amt") < 10, delete = true),
        Matched(lit(true), set = Map("bal" -> (col("t.bal") + col("s.amt"))))),
      insert = Some(Map(
        "id" -> col("s.id"),
        "name" -> lit("new"),
        "bal" -> col("s.amt").cast("double"))))
      .orderBy("id")
    assert(out.columns.toSeq == Seq("id", "name", "bal"))
    val rows = out.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows.toSeq == Seq(
      (2L, "b", 120.0),  // updated
      (3L, "c", 30.0),   // target-only: untouched
      (4L, "d", 40.0),   // target-only: untouched
      (9L, "new", 7.0))) // inserted; id 1 deleted
  }

  test("clause order is first-true-wins, not best-match") {
    // both clauses match id=2; the FIRST one (update to 0) must win
    val out = Merge.mergeInto(target, source.filter($"id" === 2), "id", "id",
      Seq(
        Matched(col("s.amt") >= 100, set = Map("bal" -> lit(0.0))),
        Matched(lit(true), set = Map("bal" -> lit(-1.0)))),
      insert = None)
    val bal = out.filter($"id" === 2).head().getAs[Double]("bal")
    assert(bal == 0.0)
  }

  test("no insert projection drops source-only rows") {
    val out = Merge.mergeInto(target, source, "id", "id",
      Seq(Matched(lit(true), set = Map.empty)), insert = None)
    assert(out.count() == 4) // all targets survive, id 9 never appears
    assert(out.filter($"id" === 9L).count() == 0)
  }

  test("fuzz: mergeInto agrees with a scalar reference on random tables") {
    // deterministic LCG so failures reproduce
    var seed = 0x9e3779b97f4a7c15L
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound + bound) % bound).toInt
    }
    (0 until 20).foreach { trial =>
      val tgtRows = (0 until 30).map(_ => (nextInt(20).toLong, nextInt(100).toLong))
        .distinctBy(_._1)
      val srcRows = (0 until 30).map(_ => (nextInt(25).toLong, nextInt(100).toLong))
        .distinctBy(_._1)
      // clause thresholds drawn per trial; two matched clauses + insert
      val t1 = nextInt(100); val t2 = nextInt(100)
      val out = Merge.mergeInto(
        tgtRows.toDF("id", "v"), srcRows.toDF("id", "amt"),
        "id", "id",
        Seq(
          Matched(col("s.amt") < t1, delete = true),
          Matched(col("s.amt") < t2,
            set = Map("v" -> (col("t.v") + col("s.amt"))))),
        insert = Some(Map("id" -> col("s.id"), "v" -> col("s.amt"))))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // scalar reference with the same first-true-wins semantics
      val src = srcRows.toMap
      val ref = scala.collection.mutable.Map.empty[Long, Long]
      tgtRows.foreach { case (id, v) =>
        src.get(id) match {
          case Some(amt) if amt < t1 => () // delete
          case Some(amt) if amt < t2 => ref(id) = v + amt
          case _ => ref(id) = v
        }
      }
      srcRows.foreach { case (id, amt) =>
        if (!tgtRows.exists(_._1 == id)) ref(id) = amt
      }
      assert(out == ref.toMap,
        s"trial $trial (t1=$t1 t2=$t2): $out vs $ref")
    }
  }

  test("s_merge_upsert exercises every clause class") {
    val out = Merge.mergeUpsert(spark, sfDir).cache()
    val customers = Tables.customer(spark, sfDir)
    val nCust = customers.count()
    // inserted rows carry the planted key offset and the MERGED segment
    val inserted = out.filter($"c_custkey" >= Merge.MergeNewBase)
    assert(inserted.count() > 0)
    assert(inserted.filter($"c_mktsegment" =!= "MERGED").count() == 0)
    // low-activity customers were deleted — and the clause must actually
    // fire at this SF for the test to mean anything
    val dormant = Tables.orders(spark, sfDir).groupBy($"o_custkey")
      .agg(count(lit(1)).as("n"))
      .filter($"n" <= Merge.MergeDeleteMaxOrders).count()
    assert(dormant > 0, "fixture SF no longer exercises the delete clause")
    assert(out.count() - inserted.count() == nCust - dormant)
    // order-less customers pass through with their original balance
    val orderless = customers.join(
      Tables.orders(spark, sfDir).select($"o_custkey".as("c_custkey")).distinct(),
      Seq("c_custkey"), "left_anti").select("c_custkey", "c_acctbal")
    val passthrough = out.join(orderless.select($"c_custkey",
        $"c_acctbal".as("orig")), "c_custkey")
      .filter($"c_acctbal" =!= $"orig")
    assert(passthrough.count() == 0)
    out.unpersist()
  }
}
