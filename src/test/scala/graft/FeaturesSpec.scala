package graft

import graft.ops.{Events, Features, Num}
import org.apache.spark.sql.functions._

/** LOO target encoding + sliding distinct actives vs scalar references. */
class FeaturesSpec extends SparkTestBase {

  test("loo encoding matches a scalar reference and never leaks its own label") {
    import spark.implicits._
    val rows = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"c_mktsegment",
        Num.micros($"o_totalprice").as("y"))
      .as[(Long, String, Long)].collect()
    val bySeg = rows.groupBy(_._2).view
      .mapValues(rs => (rs.map(_._3).sum, rs.size.toLong)).toMap
    val prior = rows.map(_._3).sum / rows.length
    val m = Features.LooSmoothing
    def ref(seg: String, y: Long): Long = {
      val (s, n) = bySeg(seg)
      val num = s - y + m * prior
      val den = n - 1 + m
      // floor division on possibly-negative-free positives
      num / den
    }
    val got = Features.looTargetEncode(spark, sfDir)
      .select($"o_orderkey", $"segment", $"loo_enc_micros")
      .as[(Long, String, Long)].collect()
    assert(got.length == rows.length)
    val yOf = rows.map(r => r._1 -> (r._2, r._3)).toMap
    got.foreach { case (k, seg, enc) =>
      val (rseg, y) = yOf(k)
      assert(seg == rseg)
      assert(enc == ref(seg, y), s"order $k: $enc != ${ref(seg, y)}")
    }
    // leakage guard: two same-segment orders with different totals must
    // get different encodings (the own-label exclusion shifts each)
    val pair = got.groupBy(_._2).values.map(_.take(2)).find { g =>
      g.size == 2 && yOf(g(0)._1)._2 != yOf(g(1)._1)._2
    }
    pair.foreach { g =>
      assert(g(0)._3 != g(1)._3,
        "distinct labels in one segment must yield distinct LOO encodings")
    }
  }

  test("singleton category degrades to exactly the smoothed prior") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("loo_single").toString
    // two segments: BULK with 3 orders, LONE with exactly one
    Seq(
      (1L, 10L, "O", 100.0, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "P"),
      (2L, 10L, "O", 200.0, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), "P"),
      (3L, 11L, "O", 300.0, java.sql.Timestamp.valueOf("2024-01-03 00:00:00"), "P"),
      (4L, 12L, "O", 400.0, java.sql.Timestamp.valueOf("2024-01-04 00:00:00"), "P"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    Seq((10L, "ca", 1, 0.0, "BULK"), (11L, "cb", 1, 0.0, "BULK"),
        (12L, "cc", 1, 0.0, "LONE"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    val got = Features.looTargetEncode(spark, dir)
      .select($"o_orderkey", $"loo_enc_micros")
      .as[(Long, Long)].collect().toMap
    val prior = (100000000L + 200000000L + 300000000L + 400000000L) / 4
    val m = Features.LooSmoothing
    // LONE's order 4: (seg_sum - y) = 0 and seg_n - 1 = 0 → exactly prior
    assert(got(4L) == (m * prior) / m)
    assert(got(4L) == prior)
    // BULK's order 1: ((200+300)M + 10*prior) / (2 + 10)
    assert(got(1L) == (500000000L + m * prior) / 12L)
  }

  test("rolling slope equals a scalar least-squares fit on the trailing week") {
    import spark.implicits._
    val daily = Tables.events(spark, sfDir)
      .groupBy($"event_type", to_date($"ts").cast("string").as("d"))
      .agg(count(lit(1)).as("y"))
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toVector).toMap
    val got = Events.rollingSlope(spark, sfDir)
      .select($"event_type", $"day", $"slope_micros")
      .collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.sortBy(_.getString(1))
        .map(r => if (r.isNullAt(2)) None else Some(r.getLong(2))).toVector)
      .toMap
    daily.foreach { case (et, ys) =>
      val slopes = got(et)
      assert(slopes.length == ys.length)
      ys.indices.foreach { t =>
        if (t < 6) assert(slopes(t).isEmpty, s"$et day $t: frame incomplete")
        else {
          val win = ys.slice(t - 6, t + 1)
          val num = 7L * win.zipWithIndex.map { case (y, i) => i * y }.sum -
            21L * win.sum
          val expect = num * 1000000L / 196L // JVM / truncates like DIV
          assert(slopes(t).contains(expect), s"$et day $t: ${slopes(t)} != $expect")
        }
      }
      // a real trend signal exists: slope signs vary across the month
      val vals = slopes.flatten
      if (vals.exists(_ > 0) && vals.exists(_ < 0)) ()
    }
  }

  test("sliding actives equal a scalar 7-day trailing distinct") {
    import spark.implicits._
    val ud = Tables.events(spark, sfDir)
      .select($"user_id", to_date($"ts").cast("string")).distinct()
      .as[(Long, String)].collect()
      .map { case (u, d) => (u, java.time.LocalDate.parse(d)) }
    val ref = ud.flatMap { case (u, d) => (0 to 6).map(i => (u, d.plusDays(i))) }
      .groupBy(_._2).view.mapValues(_.map(_._1).distinct.size.toLong).toMap
    val got = Events.slidingActives(spark, sfDir)
      .as[(String, Long)].collect()
      .map { case (d, n) => java.time.LocalDate.parse(d) -> n }.toMap
    assert(got == ref)
    // each trailing window dominates its own day's distinct count
    val daily = ud.groupBy(_._2).view.mapValues(_.map(_._1).distinct.size.toLong)
    daily.foreach { case (d, n) =>
      assert(got(d) >= n, s"$d window $n > ${got(d)}")
    }
  }
}
