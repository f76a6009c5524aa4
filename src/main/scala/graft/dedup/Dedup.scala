package graft.dedup

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate detection families for a training-data pipeline:
  * MinHash+LSH, SimHash, and LSH-candidate + exact-Jaccard verification.
  *
  * Design for 100 TB: everything is shingle-explode → hash → band-group —
  * no all-pairs stage ever materializes. The only shuffles are (a) the
  * per-doc signature aggregation and (b) the band-bucket self-join, whose
  * key (band index + signature slice) distributes uniformly by
  * construction. Candidate verification touches only bucket-collision
  * pairs, ~|pairs| << n².
  *
  * Determinism for the DuckDB oracle: shingle hashes come from md5 prefixes
  * (identical bytes in any engine), all arithmetic is 64-bit integer.
  */
object Dedup {

  /** Large prime modulus for the universal-hash family (2^31 - 1). */
  val P = 2147483647L
  /** Number of minhash functions and LSH banding shape (m = bands * r).
    * 3 bands × 4 rows: band-collision probability J⁴ per band — strict
    * enough that near-vocabulary documents (like this corpus) don't flood
    * the candidate set; at 5k docs this yields ~5k candidate pairs vs ~55k
    * with 4×3 banding, which directly bounds the verify-join cost. */
  val NumHashes = 12
  val Bands = 3
  val RowsPerBand = 4
  /** Character shingle width. */
  val K = 7

  /** Per-doc exploded (doc_id, shingle-hash) pairs, lowercased char
    * shingles of width K. The transform(sequence(...)) generator runs
    * inside codegen — no UDF, no driver loop (SURVEY §2.12: grid
    * expansion via built-in generators). Hashing is the codegen
    * graft_md5_prefix64 expression — identical value to
    * `conv(substring(md5(x),1,15),16,10)` (the oracle-side SQL) without
    * the per-shingle hex-string materialization and base-16 parse that
    * made this the round-1 bench hotspot. */
  def shingleHashes(docs: DataFrame): DataFrame = {
    graft.functions.HashExpressions.register(docs.sparkSession)
    shingleTable(docs,
      sh => graft.functions.HashExpressions.md5Prefix64(sh, 15) % P)
  }

  /** Production fast path: xxhash64 (Spark-native, codegen, ~an order of
    * magnitude cheaper than any md5 form) — NOT oracle-comparable (DuckDB
    * has no xxhash64), so it ships as a rows-only-checked query and the
    * documented 100 TB configuration; the md5 form exists for cross-engine
    * hash parity. pmod because xxhash64 is signed. */
  def shingleHashesFast(docs: DataFrame): DataFrame =
    shingleTable(docs, sh => pmod(xxhash64(sh), lit(P)))

  private def shingleTable(docs: DataFrame, hasher: Column => Column): DataFrame =
    docs
      // hoist lower(text) out of the transform lambda: inside it, the
      // expression re-evaluates per element → O(len²) per document
      .withColumn("lt", lower(col("text")))
      .withColumn("shingle", explode(expr(
        s"transform(sequence(1, greatest(length(lt) - ${K - 1}, 1))," +
          s" i -> substring(lt, i, $K))")))
      .select(col("doc_id"), hasher(col("shingle")).as("h"))

  /** MinHash signature column j: min((a_j * h + b_j) mod P) over shingles. */
  private def minhashAgg(j: Int): Column = {
    val a = 2L * j + 1
    val b = 101L * j + 7
    min((col("h") * a + b) % P).as(s"mh$j")
  }

  /** Doc → NumHashes minhash signature values (one aggregation pass). */
  def signatures(docs: DataFrame): DataFrame =
    signaturesFromHashes(shingleHashes(docs))

  /** Same, over a pre-computed (and possibly cached) shingle-hash table. */
  def signaturesFromHashes(sh: DataFrame): DataFrame =
    sh.groupBy("doc_id")
      .agg(minhashAgg(0), (1 until NumHashes).map(minhashAgg): _*)

  /** LSH candidate pairs: docs sharing at least one band of the signature.
    * Emits (doc_a < doc_b, n_shared_bands).
    *
    * The signature table is cached before the band self-join — without it
    * the join's two scans re-evaluate the whole shingle→md5→min-agg
    * subtree per side (at 100 TB this would be a checkpoint to parquet,
    * same idea). Bands explode in a single pass, not a 4-way union. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame =
    bandCandidates(signatures(Tables.documents(spark, dir)))

  /** xxhash64 fast-path twin of [[minhashLsh]] (rows-only check). */
  def minhashLshFast(spark: SparkSession, dir: String): DataFrame =
    bandCandidates(signaturesFromHashes(
      shingleHashesFast(Tables.documents(spark, dir))))

  /** Band-bucket self-join over a signature table → candidate pairs. */
  def bandCandidates(sigs: DataFrame): DataFrame = {
    val keyNames = (0 until RowsPerBand).map(r => s"k$r")
    val bandStructs = (0 until Bands).map { b =>
      val fields = lit(b).as("band") +:
        (0 until RowsPerBand).map(r => col(s"mh${b * RowsPerBand + r}").as(s"k$r"))
      struct(fields: _*)
    }
    val bandRows = sigs
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id") +: col("bs.band").as("band") +:
        keyNames.map(k => col(s"bs.$k").as(k)): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val l = bandRows.select(col("doc_id").as("doc_a") +: col("band").as("band_l") +:
      keyNames.map(k => col(k).as(s"${k}_l")): _*)
    val r = bandRows.select(col("doc_id").as("doc_b") +: col("band").as("band_r") +:
      keyNames.map(k => col(k).as(s"${k}_r")): _*)
    val joinCond = ((col("band_l") === col("band_r")) +: keyNames.map(k =>
      col(s"${k}_l") === col(s"${k}_r"))).reduce(_ && _) && col("doc_a") < col("doc_b")
    l.join(r, joinCond)
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared_bands"))
      .orderBy("doc_a", "doc_b")
  }

  /** Shared SQL fragment: per-doc shingle hashes (mirrors shingleHashes). */
  private def shingleSql: String =
    s"""SELECT doc_id,
       |  (CAST(('0x' || substring(md5(shingle), 1, 15)) AS BIGINT) % $P) AS h
       |FROM (
       |  SELECT doc_id, substring(lower(text), i, $K) AS shingle
       |  FROM documents,
       |       UNNEST(range(1, greatest(len(lower(text)) - ${K - 1}, 1) + 1)) AS t(i))""".stripMargin

  private def sigSql: String = {
    val aggs = (0 until NumHashes).map { j =>
      val a = 2L * j + 1; val b = 101L * j + 7
      s"min((h * $a + $b) % $P) AS mh$j"
    }.mkString(",\n  ")
    s"SELECT doc_id,\n  $aggs\nFROM shingles GROUP BY doc_id"
  }

  private def bandSql: String =
    (0 until Bands).map { b =>
      val ks = (0 until RowsPerBand).zipWithIndex
        .map { case (r, i) => s"mh${b * RowsPerBand + r} AS k$i" }.mkString(", ")
      s"SELECT doc_id, $b AS band, $ks FROM sigs"
    }.mkString("\nUNION ALL\n")

  private def bandJoinSql: String =
    ("l.band = r.band" +: (0 until RowsPerBand).map(i => s"l.k$i = r.k$i"))
      .mkString(" AND ")

  val minhashLshSql: String =
    s"""WITH shingles AS ($shingleSql),
       |sigs AS ($sigSql),
       |bands AS ($bandSql)
       |SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
       |  count(*) AS n_shared_bands
       |FROM bands l JOIN bands r
       |  ON $bandJoinSql
       | AND l.doc_id < r.doc_id
       |GROUP BY 1, 2
       |ORDER BY doc_a, doc_b""".stripMargin

  /** LSH candidates verified with exact shingle-set Jaccard (join-based so
    * Spark and the oracle count the identical distinct-intersection).
    * jaccard_bp = floor(10000 * |A∩B| / |A∪B|); is_dup at 80%. */
  def lshJaccard(spark: SparkSession, dir: String): DataFrame =
    lshJaccardOver(shingleHashes(Tables.documents(spark, dir)))

  /** xxhash64 fast-path twin of [[lshJaccard]] (rows-only check). */
  def lshJaccardFast(spark: SparkSession, dir: String): DataFrame =
    lshJaccardOver(shingleHashesFast(Tables.documents(spark, dir)))

  private def lshJaccardOver(shingles: DataFrame): DataFrame = {
    // ONE shingle-hash pass feeds both the signatures and the verification
    // join: minhash-of-distinct equals minhash-of-multiset, so the cached
    // distinct table serves both
    val sh = shingles.distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = bandCandidates(signaturesFromHashes(sh)).select("doc_a", "doc_b")
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val shA = sh.select(col("doc_id").as("doc_a"), col("h"))
    val shB = sh.select(col("doc_id").as("doc_b2"), col("h").as("h_b"))
    cands
      .join(shA, "doc_a")
      // two-key equi join (doc, shingle-hash) — stated explicitly so the
      // planner can never fall back to a doc-only join with a post-filter,
      // which would materialize |pairs|·|shingles|² rows
      .join(shB, col("doc_b") === col("doc_b2") && col("h") === col("h_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        floor(col("n_inter") * 10000 / (col("n_a") + col("n_b") - col("n_inter")))
          .cast("long").as("jaccard_bp"))
      .withColumn("is_dup", (col("jaccard_bp") >= 8000).cast("int"))
      .orderBy("doc_a", "doc_b")
  }

  val lshJaccardSql: String =
    s"""WITH shingles AS ($shingleSql),
       |sigs AS ($sigSql),
       |bands AS ($bandSql),
       |cands AS (
       |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM bands l JOIN bands r
       |    ON $bandJoinSql
       |   AND l.doc_id < r.doc_id),
       |sh AS (SELECT DISTINCT doc_id, h FROM shingles),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
       |  FROM cands c
       |  JOIN sh a ON a.doc_id = c.doc_a
       |  JOIN sh b ON b.doc_id = c.doc_b AND b.h = a.h
       |  GROUP BY 1, 2)
       |SELECT i.doc_a, i.doc_b,
       |  CAST(floor(n_inter * 10000 / (sa.n + sb.n - n_inter)) AS BIGINT) AS jaccard_bp,
       |  CAST(CAST(floor(n_inter * 10000 / (sa.n + sb.n - n_inter)) AS BIGINT) >= 8000 AS INT) AS is_dup
       |FROM inter i
       |JOIN sizes sa ON sa.doc_id = i.doc_a
       |JOIN sizes sb ON sb.doc_id = i.doc_b
       |ORDER BY doc_a, doc_b""".stripMargin

  /** SimHash: 32-bit signature over word tokens; banded into 4 bytes for
    * candidate generation; hamming distance via bit_count(xor).
    *
    * One aggregation pass with 32 conditional-sum columns instead of a
    * 32× bit-explode — the shuffle carries J rows per doc, not 32·J. */
  def simhash(docs: DataFrame): DataFrame = {
    graft.functions.HashExpressions.register(docs.sparkSession)
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
    tokens.groupBy("doc_id")
      .agg(balances.head, balances.tail: _*)
      .select(col("doc_id"), sigExpr.as("sig"))
  }

  /** SimHash near-dup pairs: share ≥1 of 4 byte-bands, hamming ≤ 6. */
  def simhashDup(spark: SparkSession, dir: String): DataFrame = {
    val sigs = simhash(Tables.documents(spark, dir))
    val banded = sigs.withColumn("band", explode(expr("sequence(0, 3)")))
      .withColumn("bkey", expr("(sig >> (band * 8)) & 255"))
    val l = banded.select(col("band").as("band_l"), col("bkey").as("bkey_l"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band").as("band_r"), col("bkey").as("bkey_r"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    l.join(r, col("band_l") === col("band_r") && col("bkey_l") === col("bkey_r") &&
        col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 6)
      .orderBy("doc_a", "doc_b")
  }

  val simhashDupSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT) AS h32
       |  FROM (SELECT doc_id, UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS tok
       |        FROM documents)),
       |bal AS (
       |  SELECT doc_id, i,
       |    sum(CASE WHEN (h32 >> i) & 1 = 1 THEN 1 ELSE -1 END) AS bal
       |  FROM toks, UNNEST(range(0, 32)) AS t(i)
       |  GROUP BY 1, 2),
       |sigs AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN bal > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS sig
       |  FROM bal GROUP BY doc_id),
       |banded AS (
       |  SELECT doc_id, sig, band, (sig >> (band * 8)) & 255 AS bkey
       |  FROM sigs, UNNEST(range(0, 4)) AS t(band))
       |SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
       |  bit_count(xor(l.sig, r.sig)) AS hamming
       |FROM banded l JOIN banded r
       |  ON l.band = r.band AND l.bkey = r.bkey AND l.doc_id < r.doc_id
       |WHERE bit_count(xor(l.sig, r.sig)) <= 6
       |ORDER BY doc_a, doc_b""".stripMargin
}
