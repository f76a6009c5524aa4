package graft

import graft.similarity.TextEmbed
import org.apache.spark.sql.functions._

class TextEmbedSpec extends SparkTestBase {

  test("identical texts embed identically; embeddings are integer-valued") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "delta epsilon zeta eta"), (4L, "")).toDF("doc_id", "text")
    val vecs = TextEmbed.embed(docs, "text", dim = 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(vecs(1L) == vecs(2L), "same text must embed to the same vector")
    assert(vecs(1L) != vecs(3L))
    assert(vecs.values.flatten.forall(v => v == math.rint(v)), "integer-valued")
    assert(vecs(1L).size == 16)
    // empty text: no tokens → doc drops out (nothing to embed)
    assert(!vecs.contains(4L))
  }

  test("word order does not matter, word multiplicity does") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d"), (2L, "d c b a"), (3L, "a a b c d"))
      .toDF("doc_id", "text")
    val vecs = TextEmbed.embed(docs, "text", dim = 32).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(vecs(1L) == vecs(2L), "bag-of-words: order-free")
    assert(vecs(1L) != vecs(3L), "counts must register")
  }

  test("text → embed → nearest neighbor recovers planted exact dups") {
    import spark.implicits._
    val base = Tables.documents(spark, sfDir).select($"doc_id", $"text")
    // plant copies of five docs under fresh ids — the planted copy's
    // nearest neighbor must be its original, at cosine exactly 1
    val planted = base.filter($"doc_id".between(100, 104))
      .select(($"doc_id" + 100000L).as("doc_id"), $"text")
    val corpus = base.unionByName(planted)
    val nn = TextEmbed.nearestOf(corpus, col("doc_a") >= 100000L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(nn.size == 5)
    (100L to 104L).foreach { orig =>
      val (nearest, cos) = nn(orig + 100000L)
      assert(nearest == orig, s"planted copy of $orig found $nearest instead")
      assert(math.abs(cos - 1.0) < 1e-9, s"exact copy cosine $cos != 1")
    }
  }
}
