package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) sketches for cross-set overlap estimation —
  * "how many users do every pair of event types share?" without a join
  * per pair (Beyer et al., "On Synopses for Distinct-Value Estimation
  * Under Multiset Operations", SIGMOD'07).
  *
  * Per set, the sketch is the k smallest distinct xxhash64 values of its
  * members — mergeable (k-min of an array union) and tiny (k longs), so
  * ALL pairwise overlaps among G groups cost one scan + a G²-row
  * cross of k-long arrays, instead of G² semi-joins over the raw data.
  * With fewer than k distinct members the sketch degenerates to the
  * exact set, estimates and all.
  *
  * Estimators: ndv(S) ≈ (k−1)·2⁶⁴/kth-min (exact when |sketch| < k);
  * |A∩B| ≈ ρ·ndv(A∪B) with ρ = |K(A∪B) ∩ A-sketch ∩ B-sketch| / |K(A∪B)|,
  * where K(A∪B) = the k smallest of the merged sketches.
  *
  * Plan shape: one distinct (event_type, hash) aggregation, per-type
  * top-k ascending through the bounded-heap window rewrite, then the
  * G²/2 pair cross join over G rows — everything after the distinct is
  * model-sized. Sketch output is engine-specific → rows-only gate; the
  * spec bounds estimation error against exact overlaps.
  */
object Sketches {

  val KmvK = 256

  /** Per-type KMV sketch of the distinct-user set, as a sorted array of
    * the k smallest hash values. */
  def kmvSketches(events: DataFrame, k: Int): DataFrame = {
    val hashed = events
      .select(col("event_type"), xxhash64(col("user_id")).as("h"))
      .distinct()
    val w = Window.partitionBy("event_type").orderBy(col("h"))
    hashed.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy("event_type")
      .agg(array_sort(collect_list(col("h"))).as("kmv"))
  }

  /** Normalized position of a signed-64 hash in [0, 1). */
  private def frac(h: org.apache.spark.sql.Column) =
    (h.cast("double") - Long.MinValue.toDouble) / math.pow(2.0, 64)

  /** NDV estimate from a sketch array column. */
  private def ndvEst(kmv: org.apache.spark.sql.Column, k: Int) =
    when(size(kmv) < k, size(kmv).cast("double"))
      .otherwise(lit(k - 1.0) / frac(element_at(kmv, k)))

  /** All pairwise overlap estimates among event types. Output per pair:
    * estimated distinct users of each side and of the intersection. */
  def kmvUserOverlap(spark: SparkSession, dir: String, k: Int = KmvK): DataFrame = {
    val sk = kmvSketches(Tables.events(spark, dir), k)
    val a = sk.select(col("event_type").as("type_a"), col("kmv").as("kmv_a"))
    val b = sk.select(col("event_type").as("type_b"), col("kmv").as("kmv_b"))
    a.crossJoin(b).filter(col("type_a") < col("type_b"))
      .withColumn("kmv_ab", slice(array_sort(array_union(col("kmv_a"), col("kmv_b"))), 1, k))
      .withColumn("n_common",
        size(array_intersect(array_intersect(col("kmv_ab"), col("kmv_a")), col("kmv_b"))))
      .select(col("type_a"), col("type_b"),
        round(ndvEst(col("kmv_a"), k)).cast("long").as("est_users_a"),
        round(ndvEst(col("kmv_b"), k)).cast("long").as("est_users_b"),
        round(col("n_common").cast("double") / size(col("kmv_ab")) *
          ndvEst(col("kmv_ab"), k)).cast("long").as("est_overlap"))
      .orderBy("type_a", "type_b")
  }

  /** Exact twin for the spec's error gate (G² semi-joins — the cost the
    * sketch avoids). */
  def exactUserOverlap(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select("event_type", "user_id").distinct()
    val a = ev.select(col("event_type").as("type_a"), col("user_id"))
    val b = ev.select(col("event_type").as("type_b"), col("user_id"))
    a.join(b, "user_id").filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b")
      .agg(countDistinct("user_id").as("n_overlap"))
      .orderBy("type_a", "type_b")
  }
}
