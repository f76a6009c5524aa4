package graft

import org.apache.spark.sql.functions._
import graft.dedup.{Dedup, IncrementalDedup}

class IncrementalDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def freshStore(): String =
    java.nio.file.Files.createTempDirectory("inc_store").toString

  private def docs = Tables.documents(spark, sfDir).select("doc_id", "text")

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) ->
      (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap

  test("sequential incremental admission equals the one-shot global rule") {
    val got = asMap(IncrementalDedup.incrementalAdmit(spark, sfDir))
    // reference: the existing LSH candidate pairs give dup_of = min doc_a
    val expectDup = Dedup.minhashLsh(spark, sfDir)
      .groupBy("doc_b").agg(min("doc_a").as("dup_of"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    assert(got.keySet == ids.toSet)
    ids.foreach { id =>
      val (isDup, dupOf) = got(id)
      expectDup.get(id) match {
        case Some(e) => assert(isDup == 1L && dupOf == e, s"doc $id: got ($isDup,$dupOf) want (1,$e)")
        case None => assert(isDup == 0L && dupOf == -1L, s"doc $id: got ($isDup,$dupOf) want admitted")
      }
    }
  }

  test("admission is batch-split invariant: one batch == three batches") {
    val oneShot = asMap(IncrementalDedup.admitBatch(docs, freshStore()))
    val threeWay = asMap(IncrementalDedup.incrementalAdmit(spark, sfDir))
    assert(oneShot == threeWay)
  }

  test("replaying a batch reproduces its flags and appends nothing") {
    val store = freshStore()
    val maxId = docs.agg(max($"doc_id")).head().getLong(0)
    val b1 = docs.filter($"doc_id" <= maxId / 2)
    val b2 = docs.filter($"doc_id" > maxId / 2)
    IncrementalDedup.admitBatch(b1, store)
    val first = asMap(IncrementalDedup.admitBatch(b2, store))
    val rows = spark.read.parquet(store).count()
    val replay = asMap(IncrementalDedup.admitBatch(b2, store))
    assert(replay == first, "replay must reproduce identical admission flags")
    assert(spark.read.parquet(store).count() == rows,
      "replay must not grow the bucket store")
  }

  test("a half-appended crash window recovers: same flags, store completes") {
    val storeA = freshStore()
    val maxId = docs.agg(max($"doc_id")).head().getLong(0)
    val b1 = docs.filter($"doc_id" <= maxId / 2)
    val b2 = docs.filter($"doc_id" > maxId / 2)
    IncrementalDedup.admitBatch(b1, storeA)
    val afterB1 = spark.read.parquet(storeA).collect().toSet
    val cleanFlags = asMap(IncrementalDedup.admitBatch(b2, storeA))
    val afterB2 = spark.read.parquet(storeA).collect().toSet
    val delta = (afterB2 -- afterB1).toSeq.sortBy(_.getAs[Long]("owner"))
    // crash store: batch 1 complete, only half of batch 2's appends landed
    val storeB = freshStore()
    val half = afterB1.toSeq ++ delta.take(delta.size / 2)
    val schema = spark.read.parquet(storeA).schema
    spark.createDataFrame(
        spark.sparkContext.parallelize(half.toSeq), schema)
      .write.mode("append").partitionBy("bp").parquet(storeB)
    val recovered = asMap(IncrementalDedup.admitBatch(b2, storeB))
    assert(recovered == cleanFlags,
      "admission after a partial append must equal the clean run")
    def keys(dir: String) = spark.read.parquet(dir)
      .drop("owner").collect().toSet
    assert(keys(storeB) == keys(storeA),
      "the replay must complete the bucket store's key set")
  }
}
