package graft

import org.apache.spark.sql.functions._

/** The round-3 per-document dedup expressions must be value-identical to
  * the exploded built-in compositions they replaced — that equivalence is
  * what keeps the DuckDB oracle SQL (which still uses the exploded form)
  * valid for the array-based query plans.
  */
class ShingleExprSpec extends SparkTestBase {
  import graft.dedup.Dedup
  import graft.functions.ShingleExpressions

  test("shingle set equals distinct exploded md5 hashes, sorted") {
    val docs = Tables.documents(spark, sfDir).limit(50)
    val viaArray = Dedup.shingleSets(docs)
      .select(col("doc_id"), explode(col("hs")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaExplode = Dedup.shingleHashes(docs).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaArray == viaExplode)
  }

  test("shingle set arrays arrive sorted and distinct") {
    val rows = Dedup.shingleSets(Tables.documents(spark, sfDir).limit(20))
      .collect()
    rows.foreach { r =>
      val hs = r.getSeq[Long](1)
      assert(hs == hs.sorted, s"doc ${r.getLong(0)} not sorted")
      assert(hs.distinct == hs, s"doc ${r.getLong(0)} has duplicates")
    }
  }

  test("xxh64 shingle set equals the pmod(xxhash64) exploded form") {
    val docs = Tables.documents(spark, sfDir).limit(50)
    val viaArray = Dedup.shingleSets(docs, algo = "xxh64")
      .select(col("doc_id"), explode(col("hs")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaExplode = Dedup.shingleHashesFast(docs).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaArray == viaExplode)
  }

  test("short and empty texts yield exactly one shingle") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, "ab"), (3L, "exactly7")).toDF("doc_id", "text")
    val sets = Dedup.shingleSets(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sets(1L).length == 1) // md5("") still hashes
    assert(sets(2L).length == 1) // whole 2-char text is the shingle
    assert(sets(3L).length == 2) // len 8 → windows at 1 and 2
  }

  test("multibyte text shingles by code points, not bytes") {
    import spark.implicits._
    // 10 code points => 10-7+1 = 4 windows; byte-based windows would differ
    val docs = Seq((1L, "héllo wörld".take(10))).toDF("doc_id", "text")
    val viaArray = Dedup.shingleSets(docs)
      .select(explode(col("hs")).as("h")).collect().map(_.getLong(0)).toSet
    val viaExplode = Dedup.shingleHashes(docs).distinct()
      .collect().map(_.getLong(1)).toSet
    assert(viaArray == viaExplode)
    assert(viaArray.size <= 4)
  }

  test("minhash signature equals the groupBy-min of the universal hashes") {
    val docs = Tables.documents(spark, sfDir).limit(50)
    val viaExpr = Dedup.signatures(docs).collect()
      .map(r => r.getLong(0) -> (1 to Dedup.NumHashes).map(r.getLong)).toMap
    val sh = Dedup.shingleHashes(docs)
    val aggs = (0 until Dedup.NumHashes).map { j =>
      min((col("h") * (2L * j + 1) + (101L * j + 7)) % Dedup.P).as(s"mh$j")
    }
    val viaAgg = sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*).collect()
      .map(r => r.getLong(0) -> (1 to Dedup.NumHashes).map(r.getLong)).toMap
    assert(viaExpr == viaAgg)
  }

  test("sorted intersect count matches set intersection") {
    import spark.implicits._
    val df = Seq((Array(1L, 3L, 5L, 9L), Array(2L, 3L, 5L, 10L, 11L)))
      .toDF("a", "b")
    graft.functions.ShingleExpressions.register(spark)
    val n = df.select(ShingleExpressions.sortedIntersect(col("a"), col("b")))
      .head.getLong(0)
    assert(n == 2)
    val empty = Seq((Array.empty[Long], Array(1L))).toDF("a", "b")
      .select(ShingleExpressions.sortedIntersect(col("a"), col("b")))
      .head.getLong(0)
    assert(empty == 0)
  }

  test("simhash expression equals the exploded 32-conditional-sum form") {
    val docs = Tables.documents(spark, sfDir).limit(100)
    graft.functions.HashExpressions.register(spark)
    val viaExpr = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tokens = docs
      .withColumn("tok", explode(split(trim(lower(col("text"))), "\\s+")))
      .select(col("doc_id"),
        graft.functions.HashExpressions.md5Prefix64(col("tok"), 8).as("h32"))
    val balances = (0 until 32).map { i =>
      sum(when(expr(s"(h32 >> $i) & 1") === 1, 1).otherwise(-1)).as(s"bal$i")
    }
    val sigExpr = (0 until 32).map { i =>
      when(col(s"bal$i") > 0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)
    val viaAgg = tokens.groupBy("doc_id")
      .agg(balances.head, balances.tail: _*)
      .select(col("doc_id"), sigExpr.as("sig")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr == viaAgg)
  }

  test("fuzz: expression equals built-in composition on random unicode text") {
    import spark.implicits._
    // deterministic generator mixing ASCII, multibyte, whitespace runs,
    // and degenerate lengths — the input classes where a byte-vs-codepoint
    // or window-boundary bug would hide
    val rng = new scala.util.Random(20260812L)
    val alphabet = "abc déﬁ 統計 🎲 \t\n  xyz0123"
    val docs = (0 until 120).map { i =>
      val len = rng.nextInt(40)
      (i.toLong, (0 until len).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
    }.toDF("doc_id", "text")
    val viaArray = Dedup.shingleSets(docs)
      .select(col("doc_id"), explode(col("hs")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaExplode = Dedup.shingleHashes(docs).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaArray == viaExplode)
    // simhash too: expression vs exploded conditional-sum aggregation
    graft.functions.HashExpressions.register(spark)
    val viaExpr = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tokens = docs
      .withColumn("tok", explode(split(trim(lower(col("text"))), "\\s+")))
      .select(col("doc_id"),
        graft.functions.HashExpressions.md5Prefix64(col("tok"), 8).as("h32"))
    val balances = (0 until 32).map { i =>
      sum(when(expr(s"(h32 >> $i) & 1") === 1, 1).otherwise(-1)).as(s"bal$i")
    }
    val sigExpr = (0 until 32).map { i =>
      when(col(s"bal$i") > 0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)
    val viaAgg = tokens.groupBy("doc_id")
      .agg(balances.head, balances.tail: _*)
      .select(col("doc_id"), sigExpr.as("sig")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr == viaAgg)
  }

  test("jaccard plan stays doc-level: set + intersect exprs, one band explode") {
    // the inline construction — the default entry serves the bucketed
    // layout since r11, where the shingle hashing ran at build time and
    // the serve plan only scans + intersects
    val df = Dedup.lshJaccardInline(spark, sfDir)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("graft_shingle_set"), "shingle hashing left codegen")
    assert(p.contains("graft_sorted_intersect"), "verify join re-appeared")
    // the only Generate allowed is the 3-rows-per-doc band explode — a
    // shingle-level explode (~300 rows/doc) must never come back
    val generates = p.linesIterator.count(_.trim.startsWith("Generate"))
    assert(generates <= 1, s"unexpected explodes in the jaccard plan:\n${p.take(1500)}")
  }
}
