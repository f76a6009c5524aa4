package graft

import graft.similarity.Retrieval
import org.apache.spark.sql.functions._

/** Hybrid retrieval: the oracle gates the integer core and the fused
  * RRF ranking; these specs cover the BM25 log-idf arithmetic (vs an
  * independent scalar reference) and the fusion invariants. */
class RetrievalSpec extends SparkTestBase {

  private def tokens(text: String): Seq[String] =
    text.trim.toLowerCase.split("\\s+").toSeq

  test("bm25 scores match an independent scalar reference") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val toks = docs.map { case (id, tx) => id -> tokens(tx) }.toMap
    val n = docs.length.toDouble
    val avgdl = toks.values.map(_.size).sum / n
    val dfMap = toks.values.flatMap(_.distinct).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val (k1, b) = (Retrieval.Bm25K1, Retrieval.Bm25B)

    def score(qid: Long, did: Long): Double = {
      val terms = toks(qid).take(Retrieval.QueryTerms).distinct
      val dToks = toks(did)
      val dl = dToks.size.toDouble
      terms.map { t =>
        val tf = dToks.count(_ == t).toDouble
        if (tf == 0) 0.0
        else {
          val df = dfMap(t).toDouble
          val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
          idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        }
      }.sum
    }

    val got = Retrieval.bm25TopK(spark, sfDir)
      .select($"query_id", $"rank", $"doc_id", $"score")
      .as[(Long, Int, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (q, _, d, s) =>
      val r = score(q, d)
      assert(math.abs(s - r) <= 1e-9 * math.max(1.0, r), s"q=$q d=$d got=$s ref=$r")
    }
    // ranks are dense 1..k per query and ordered by the reference score
    got.groupBy(_._1).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).sameElements(1 to sorted.length), s"q=$q ranks")
      val scores = sorted.map(_._4)
      assert(scores.zip(scores.tail).forall { case (a, c) => a >= c - 1e-12 },
        s"q=$q not score-ordered")
    }
  }

  test("rrf fusion: scores recompute from the member ranks; sources agree") {
    import spark.implicits._
    val rows = Retrieval.hybridRrf(spark, sfDir)
      .select($"query_id", $"rank", $"doc_id", $"rrf_score",
              $"rank_kw", $"rank_vec")
      .as[(Long, Int, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (q, _, d, s, rk, rv) =>
      val expect =
        (if (rk > 0) Retrieval.RrfScale / (rk + Retrieval.RrfK) else 0L) +
        (if (rv > 0) Retrieval.RrfScale / (rv + Retrieval.RrfK) else 0L)
      assert(s == expect, s"q=$q d=$d score $s != $expect from ranks ($rk,$rv)")
      assert(rk > 0 || rv > 0, s"q=$q d=$d in neither source list")
      assert(d != q, "self must be excluded from both lists")
    }
    // within a query, fused rank order is exactly (score desc, doc_id)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      val resorted = rs.sortBy(r => (-r._4, r._3))
      assert(sorted.map(_._3).sameElements(resorted.map(_._3)), s"q=$q order")
    }
    // a doc ranked #1 by BOTH lists must win the fusion
    rows.filter(r => r._5 == 1 && r._6 == 1).foreach { r =>
      assert(r._2 == 1, s"double-#1 doc ${r._3} not fused #1 for q=${r._1}")
    }
  }

  test("NFC-invariant retrieval: composed and decomposed query spellings " +
      "retrieve the same ranked list") {
    import spark.implicits._
    // the executable recipe for SURVEY's normalization policy (r12
    // VERDICT item 5): normalize corpus AND query with graft_nfc, and
    // canonical equivalence stops mattering anywhere downstream
    val composed = "caf\u00e9"       // e-acute precomposed
    val decomposed = "cafe\u0301"    // e + combining acute
    assert(composed != decomposed, "distinct byte forms by construction")
    val docs = Seq(
      (1L, s"the $decomposed on the corner serves espresso"),
      (2L, s"a $composed with milk and sugar"),
      (3L, "tea house with no coffee at all"),
      (4L, s"$composed visits another $decomposed in town"))
      .toDF("doc_id", "text")
    val qC = Seq((100L, composed)).toDF("query_id", "text")
    val qD = Seq((100L, decomposed)).toDF("query_id", "text")
    val a = Retrieval.bm25TopKNfc(spark, docs, qC).collect().map(_.toSeq).toSeq
    val b = Retrieval.bm25TopKNfc(spark, docs, qD).collect().map(_.toSeq).toSeq
    assert(a == b, "the two spellings must retrieve identical ranked lists")
    val ranked = a.map(_(2).asInstanceOf[Long]).toSet
    assert(ranked == Set(1L, 2L, 4L),
      s"the canonical index must reach BOTH spellings' documents: $ranked")
    // control: the raw byte-driven terms split the spellings — without
    // the recipe each query sees only its own byte form's documents
    val rawC = Retrieval.bm25TopKQueries(spark, docs, qC, canon = false)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val rawD = Retrieval.bm25TopKQueries(spark, docs, qD, canon = false)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(rawC == Set(2L, 4L) && rawD == Set(1L, 4L),
      s"un-normalized control must split by byte form: $rawC / $rawD")
  }

  test("keyword candidates always share a query term (core consistency)") {
    import spark.implicits._
    val core = Retrieval.bm25Core(spark, sfDir)
      .select($"query_id", $"doc_id", $"n_terms", $"dl")
      .as[(Long, Long, Long, Long)].collect()
    val texts = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    core.foreach { case (q, d, nt, dl) =>
      val qTerms = tokens(texts(q)).take(Retrieval.QueryTerms).distinct.toSet
      val dToks = tokens(texts(d))
      val shared = dToks.toSet.intersect(qTerms)
      assert(shared.nonEmpty, s"q=$q d=$d matched 0 terms")
      assert(shared.size.toLong == nt, s"q=$q d=$d n_terms $nt != ${shared.size}")
      assert(dl == dToks.size.toLong)
    }
  }
}
