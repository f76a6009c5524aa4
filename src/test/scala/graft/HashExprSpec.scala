package graft

import org.apache.spark.sql.functions._
import graft.functions.HashExpressions

class HashExprSpec extends SparkTestBase {

  test("graft_md5_prefix64 equals conv(substring(md5,1,n),16,10) for n=15 and n=8") {
    HashExpressions.register(spark)
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val both = docs.select(
      HashExpressions.md5Prefix64(col("text"), 15).as("native15"),
      expr("CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)").as("ref15"),
      HashExpressions.md5Prefix64(col("text"), 8).as("native8"),
      expr("CAST(conv(substring(md5(text), 1, 8), 16, 10) AS BIGINT)").as("ref8"))
    assert(both.filter(col("native15") =!= col("ref15") ||
      col("native8") =!= col("ref8")).count() == 0)
  }

  test("handles empty string, unicode, and nulls; value is non-negative") {
    HashExpressions.register(spark)
    val r = spark.sql(
      "SELECT graft_md5_prefix64('', 15) AS e, " +
      "graft_md5_prefix64('héllo wörld — ünïcode ✓', 15) AS u, " +
      "CAST(conv(substring(md5(''), 1, 15), 16, 10) AS BIGINT) AS eref, " +
      "CAST(conv(substring(md5('héllo wörld — ünïcode ✓'), 1, 15), 16, 10) AS BIGINT) AS uref, " +
      "graft_md5_prefix64(CAST(NULL AS STRING), 15) AS n").head
    assert(r.getLong(0) == r.getLong(2))
    assert(r.getLong(1) == r.getLong(3))
    assert(r.getLong(0) >= 0L && r.getLong(1) >= 0L)
    assert(r.isNullAt(4))
  }

  test("interpreted eval matches codegen path") {
    HashExpressions.register(spark)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val samples = Seq("", "a", "shingle7", "the quick brown fox", "ünïcode ✓")
    for (s <- samples; n <- Seq(8, 15)) {
      val interpreted = HashExpressions.Md5Prefix64(
        Literal(UTF8String.fromString(s), org.apache.spark.sql.types.StringType), n)
        .eval(null).asInstanceOf[Long]
      val sql = spark.sql(
        s"SELECT CAST(conv(substring(md5('$s'), 1, $n), 16, 10) AS BIGINT)").head.getLong(0)
      assert(interpreted == sql, s"mismatch for '$s' n=$n")
    }
  }
}
