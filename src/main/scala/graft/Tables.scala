package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Explicit-schema loaders for the driver test tables (TESTDATA.md).
  *
  * Schemas are fixed and explicit (SURVEY.md §1.3): the reference infers
  * schemas from CSV (`data_processing/normalize.py:13-15`), which we
  * deliberately replace with declared `StructType`s so scans never pay an
  * inference pass and column pruning is reliable at 100 TB scale.
  */
object Tables {

  val regionSchema = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nationSchema = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customerSchema = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplierSchema = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val partSchema = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitemSchema = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  /** Legacy events layout: `ts` as INT64 nanos (TIMESTAMP_NS), which
    * Spark's vectorized reader cannot decode as TimestampType; we read the
    * raw nanos (spark.sql.legacy.parquet.nanosAsLong=true, set in every
    * graft session) and truncate to a microsecond timestamp in [[events]] —
    * the same truncation DuckDB applies, so oracle timestamps agree. */
  val eventsRawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Native events layout: `ts` already a microsecond TIMESTAMP. */
  val eventsTsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** True when the events parquet at `path` stores `ts` as a raw INT64
    * (the legacy TIMESTAMP_NS layout surfaced as LongType by
    * nanosAsLong=true) rather than a native timestamp. One footer read at
    * plan time — not a data scan — so it is free at any corpus size. */
  def eventsTsIsLong(spark: SparkSession, path: String): Boolean =
    spark.read.parquet(path).schema("ts").dataType == LongType

  val documentsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddingsSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  private def read(spark: SparkSession, dir: String, name: String,
                   schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "region", regionSchema)
  def nation(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "nation", nationSchema)
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer", customerSchema)
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier", supplierSchema)
  def part(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "part", partSchema)
  def orders(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "orders", ordersSchema)
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem", lineitemSchema)
  def events(spark: SparkSession, dir: String): DataFrame =
    eventsAt(spark, s"$dir/events.parquet")

  /** Canonical events reader: `ts` is always a microsecond TimestampType
    * regardless of which physical layout the corpus was generated with
    * (the driver has shipped both INT64-nanos and native timestamp[us]
    * across rounds). The branch is decided by one footer read. */
  def eventsAt(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    if (eventsTsIsLong(spark, path))
      spark.read.schema(eventsRawSchema).parquet(path)
        // integer DIV, not double `/`: epoch-nanos ≈ 1.7e18 exceeds double's
        // 2^53 exact-integer range, so float division would corrupt low bits
        .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else
      spark.read.schema(eventsTsSchema).parquet(path)
  }
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents", documentsSchema)
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings", embeddingsSchema)
}
