package graft

import graft.ops.TextOps
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkTestBase {

  test("doc chunks tile every document with the declared stride and overlap") {
    import spark.implicits._
    val chunks = TextOps.chunkDocs(spark, sfDir).collect()
    val nChars = Tables.documents(spark, sfDir)
      .select($"doc_id", length($"text").cast("long")).as[(Long, Long)]
      .collect().toMap
    assert(chunks.nonEmpty)
    val byDoc = chunks.groupBy(_.getLong(0))
    assert(byDoc.keySet == nChars.keySet, "every doc must chunk")
    byDoc.foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_.getLong(1))
      // indices are dense from 0; starts follow the stride
      sorted.zipWithIndex.foreach { case (c, i) =>
        assert(c.getLong(1) == i)
        assert(c.getLong(2) == i.toLong * TextOps.ChunkStride)
      }
      val n = nChars(doc)
      // chunks cover the doc: last chunk reaches the end
      val last = sorted.last
      assert(last.getLong(2) + last.getLong(3) == n,
        s"doc $doc: coverage ends at ${last.getLong(2) + last.getLong(3)} of $n")
      // every chunk is the window clipped to the doc end
      sorted.foreach(c => assert(c.getLong(3) ==
        math.min(TextOps.ChunkSize, n - c.getLong(2))))
      // chunk count: one per stride step up to the last covered char
      assert(sorted.size == (math.max(n - 1, 0) / TextOps.ChunkStride + 1).toInt)
    }
  }

  test("doc keywords surface rare-in-corpus, frequent-in-doc tokens") {
    import spark.implicits._
    val kw = TextOps.docKeywords(spark, sfDir)
    val rows = kw.collect()
    assert(rows.nonEmpty)
    // exactly ≤3 per doc, ranks dense from 1
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ranks = rs.map(_.getLong(1)).sorted
      assert(ranks.sameElements(1L to ranks.length))
      assert(ranks.length <= 3)
      // ordering invariant: df ascending, tf descending within df
      val sorted = rs.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val (dfa, dfb) = (a.getLong(4), b.getLong(4))
          val (tfa, tfb) = (a.getLong(3), b.getLong(3))
          assert(dfa < dfb || (dfa == dfb && tfa > tfb) ||
            (dfa == dfb && tfa == tfb && a.getString(2) < b.getString(2)))
        case _ => ()
      }
    }
  }

  test("PII redaction scrubs injected identifiers and counts by type") {
    import spark.implicits._
    val df = Seq(
      (1L, "contact me at jane.doe+x@example.org or call +1 (415) 555-0123 ok"),
      (2L, "server 10.0.42.7 charged card 4111111111111111 twice"),
      (3L, "no pii here at all"),
      (4L, "two mails: a@b.co and c.d@e.info; ip 192.168.1.1")
    ).toDF("id", "text")
    val out = TextOps.redactPii(df, "text").collect()
      .map(r => r.getLong(0) -> r).toMap

    val r1 = out(1L)
    assert(r1.getAs[String]("text_redacted") ==
      "contact me at [email] or call [phone] ok")
    assert(r1.getAs[Long]("n_email") == 1 && r1.getAs[Long]("n_phone") == 1)

    val r2 = out(2L)
    assert(r2.getAs[String]("text_redacted") ==
      "server [ipv4] charged card [card] twice")
    assert(r2.getAs[Long]("n_ipv4") == 1 && r2.getAs[Long]("n_card") == 1)
    assert(r2.getAs[Long]("n_phone") == 0, "card must not double-count as phone")

    val r3 = out(3L)
    assert(r3.getAs[String]("text_redacted") == "no pii here at all")
    assert(Seq("n_email", "n_phone", "n_ipv4", "n_card")
      .forall(c => r3.getAs[Long](c) == 0))

    val r4 = out(4L)
    assert(r4.getAs[Long]("n_email") == 2 && r4.getAs[Long]("n_ipv4") == 1)
    assert(!r4.getAs[String]("text_redacted").contains("@"))
  }

  test("perplexity separates in-distribution text from gibberish") {
    import spark.implicits._
    val ref = Tables.documents(spark, sfDir)
    val corpus = ref.limit(50).select($"doc_id", $"text")
    val gibberish = Seq(
      (900001L, "zxqv wplk jmtr qqzx bnvc xkwz pltj zzzq vvkx qwjz"),
      (900002L, "aaxz bbqy ccwz ddvx eeuz ffty ggxr hhqw iizv jjuy"))
      .toDF("doc_id", "text")
    val scored = TextOps.perplexityScores(ref, corpus.unionByName(gibberish))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val inDist = scored.filter(_._1 < 900000L).values.map(_._3)
    val junk = scored.filter(_._1 >= 900000L).values
    // every gibberish token is OOV, and its perplexity clears every
    // in-distribution doc by a wide margin
    junk.foreach { case (n, oov, ppl) =>
      assert(oov == n, "gibberish must be all-OOV")
      assert(ppl > inDist.max * 10, s"gibberish ppl $ppl not separated")
    }
    // in-distribution scores are finite, positive, vocabulary-bounded
    inDist.foreach(p => assert(p > 1 && p < 1e6))
  }
}
