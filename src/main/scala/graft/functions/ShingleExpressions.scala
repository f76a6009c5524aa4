package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels for the per-document dedup expressions. A plain `object`
  * compiles to static forwarders so whole-stage-generated Java calls these
  * directly.
  *
  * Why these exist: the round-1/2 dedup pipeline was
  * explode(shingles) → md5 per row → distinct → groupBy(doc) agg — i.e. two
  * full shuffles of ~n·len rows per query, which dominated the bench
  * (d_lsh_jaccard alone was 47% of round 1, still 27% of round 2). A
  * document's shingle multiset lives entirely inside ONE input row, so the
  * whole shingle → hash → distinct → minhash chain is per-row local work:
  * these kernels do it in a single pass and the queries shuffle only
  * doc-level rows (a signature, an array) — never shingle-level rows.
  * Mirrors the reference's per-doc loop shape (a row at a time) while
  * keeping hash semantics identical to the DuckDB oracle SQL.
  */
object ShingleUtil {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def md5Prefix(dig: MessageDigest, bytes: Array[Byte], start: Int,
                        len: Int, nBits: Int): Long = {
    dig.reset()
    dig.update(bytes, start, len)
    val d = dig.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> (64 - nBits)
  }

  /** Byte offsets of each code-point start (plus the end offset) so shingle
    * windows use CHARACTER positions — the same semantics as
    * `substring(lt, i, k)` in both Spark and DuckDB — at O(n) total. */
  private def codePointOffsets(bytes: Array[Byte]): Array[Int] = {
    val offs = new Array[Int](bytes.length + 1)
    var n = 0
    var i = 0
    while (i < bytes.length) {
      offs(n) = i
      n += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    offs(n) = bytes.length
    java.util.Arrays.copyOf(offs, n + 1)
  }

  private def sortedDistinct(hs: Array[Long]): Array[Long] = {
    java.util.Arrays.sort(hs)
    var w = 0
    var i = 0
    while (i < hs.length) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(hs, w)
  }

  /** Sorted-distinct array of md5-prefix hashes (mod `mod`) of the width-`k`
    * character shingles of `s`. Window count = max(chars - k + 1, 1): texts
    * shorter than k yield one (short) shingle — identical to
    * `transform(sequence(1, greatest(length - k + 1, 1)), i -> substring(s, i, k))`. */
  def md5ShingleSet(s: UTF8String, k: Int, nBits: Int, mod: Long): ArrayData = {
    val bytes = s.getBytes
    val offs = codePointOffsets(bytes)
    val nChars = offs.length - 1
    val count = math.max(nChars - k + 1, 1)
    val dig = digests.get()
    val hs = new Array[Long](count)
    var i = 0
    while (i < count) {
      val start = offs(i)
      val end = offs(math.min(i + k, nChars))
      hs(i) = md5Prefix(dig, bytes, start, end - start, nBits) % mod
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sortedDistinct(hs))
  }

  /** xxhash64 twin of [[md5ShingleSet]] — Spark's `xxhash64(str)` semantics
    * (XXH64 over the UTF-8 bytes, seed 42) then pmod, matching the
    * round-2 fast-path `pmod(xxhash64(shingle), P)`. */
  def xxhShingleSet(s: UTF8String, k: Int, mod: Long): ArrayData = {
    val bytes = s.getBytes
    val offs = codePointOffsets(bytes)
    val nChars = offs.length - 1
    val count = math.max(nChars - k + 1, 1)
    val hs = new Array[Long](count)
    var i = 0
    while (i < count) {
      val start = offs(i)
      val end = offs(math.min(i + k, nChars))
      val h = XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start, end - start, 42L)
      hs(i) = ((h % mod) + mod) % mod
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sortedDistinct(hs))
  }

  /** Reusable per-thread byte buffer for [[md5GramSet]]/[[xxhGramSet]]'s
    * space-joined gram bytes — grams are a few tokens (~tens of bytes), so
    * one growable buffer removes every per-gram allocation the old
    * `concat_ws(' ', slice(toks, i, n))` HOF composition paid (slice array
    * + joined UTF8String per gram, interpreted lambda around both). */
  private val gramBufs = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](256)
  }

  /** Write the space-joined gram `toks[i..i+n)` into the thread buffer and
    * return its byte length. concat_ws semantics: null elements are
    * skipped together with their separator. */
  private def fillGram(toks: ArrayData, i: Int, n: Int): Int = {
    var len = 0
    var cnt = 0
    var j = 0
    while (j < n) {
      if (!toks.isNullAt(i + j)) {
        len += toks.getUTF8String(i + j).numBytes()
        cnt += 1
      }
      j += 1
    }
    if (cnt > 1) len += cnt - 1
    var buf = gramBufs.get()
    if (buf.length < len) {
      buf = new Array[Byte](math.max(len, buf.length * 2))
      gramBufs.set(buf)
    }
    var pos = 0
    var wrote = false
    j = 0
    while (j < n) {
      if (!toks.isNullAt(i + j)) {
        // concat_ws keeps EMPTY strings (with their separator) and skips
        // only nulls — separate on element count, not on bytes written
        // (a leading-empty token from split on untrimmed whitespace must
        // yield the same " tok ..." gram bytes)
        if (wrote) { buf(pos) = ' '.toByte; pos += 1 }
        val t = toks.getUTF8String(i + j)
        t.writeToMemory(buf,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + pos)
        pos += t.numBytes()
        wrote = true
      }
      j += 1
    }
    pos
  }

  private val EmptyLongArray = new Array[Long](0)
  private val SpaceUtf8 = UTF8String.fromString(" ")

  /** Sorted-distinct md5-prefix hashes of the space-joined token n-grams —
    * the [[graft.dedup.Dedup.gramSets]] kernel. Bit-identical to
    * `array_sort(array_distinct(transform(sequence(1, size(toks) - n + 1),
    * i -> graft_md5_prefix64(concat_ws(' ', slice(toks, i, n)), hex))))`
    * guarded by `size(toks) >= n` (empty array otherwise), which ran its
    * lambda INTERPRETED per gram (the r17 HOF trap, measured on the PQ and
    * pair kernels; GramSetKernelSpec pins the equality corpus-wide). */
  def md5GramSet(toks: ArrayData, n: Int, nBits: Int): ArrayData = {
    val sz = toks.numElements()
    val count = sz - n + 1
    if (count <= 0) return UnsafeArrayData.fromPrimitiveArray(EmptyLongArray)
    val dig = digests.get()
    val hs = new Array[Long](count)
    var i = 0
    while (i < count) {
      val len = fillGram(toks, i, n)
      hs(i) = md5Prefix(dig, gramBufs.get(), 0, len, nBits)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sortedDistinct(hs))
  }

  /** xxhash64 twin of [[md5GramSet]] — Spark `xxhash64(str)` semantics
    * (XXH64 over the UTF-8 bytes, seed 42, full signed range), matching
    * `xxhash64(concat_ws(' ', slice(toks, i, n)))`. */
  def xxhGramSet(toks: ArrayData, n: Int): ArrayData = {
    val sz = toks.numElements()
    val count = sz - n + 1
    if (count <= 0) return UnsafeArrayData.fromPrimitiveArray(EmptyLongArray)
    val hs = new Array[Long](count)
    var i = 0
    while (i < count) {
      val len = fillGram(toks, i, n)
      hs(i) = XXH64.hashUnsafeBytes(gramBufs.get(),
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, 42L)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sortedDistinct(hs))
  }

  /** MinHash signature over a hash array: sig_j = min((h·(2j+1) + 101j+7) mod P).
    * One pass over the array for all m functions; h < P < 2³¹ and
    * 2j+1 ≤ 2m so the products stay far below 2⁶³. */
  def minhashSig(hs: ArrayData, m: Int, mod: Long): ArrayData = {
    val n = hs.numElements()
    val sig = new Array[Long](m)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < m) {
        val v = (h * (2L * j + 1) + (101L * j + 7)) % mod
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** |A ∩ B| of two sorted-distinct long arrays (single merge pass). */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Space-joined adjacent-pair bigram strings of a token array — the
    * codegen twin of `transform(sequence(0, size(t) - 2),
    * i -> concat(t[i], ' ', t[i+1]))` (whose lambda evaluates interpreted
    * per element). Fewer than 2 tokens → empty array. concat semantics:
    * a null neighbor makes that bigram null. */
  def bigrams(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val count = math.max(n - 1, 0)
    val out = new Array[UTF8String](count)
    var i = 0
    while (i < count) {
      out(i) =
        if (tokens.isNullAt(i) || tokens.isNullAt(i + 1)) null
        else UTF8String.concat(tokens.getUTF8String(i), SpaceUtf8,
          tokens.getUTF8String(i + 1))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.asInstanceOf[Array[Any]])
  }

  /** One-pass repetition statistics over a token array: (distinct-token
    * count, max bigram multiplicity) — the [[graft.ops.TextOps]]
    * repetitionStats kernel. Bit-identical to the composition it
    * replaces: `size(array_distinct(t))` and the sorted-bigram
    * longest-equal-run fold over `transform(sequence(0, size-2),
    * i -> concat(t[i], ' ', t[i+1]))` (max run of a sorted multiset =
    * max multiplicity; tokens come from a whitespace split so the
    * space-joined bigram is injective in the pair — GramSetKernelSpec's
    * sibling RepetitionKernelSpec assertion pins it corpus-wide). A null
    * token makes its two bigrams null (concat semantics); null is one
    * distinct token and one bigram value, as array_distinct/<=> treat it. */
  def repetitionCounts(tokens: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = tokens.numElements()
    val seen = new java.util.HashSet[UTF8String]()
    var sawNullTok = false
    var i = 0
    while (i < n) {
      if (tokens.isNullAt(i)) sawNullTok = true
      else seen.add(tokens.getUTF8String(i))
      i += 1
    }
    val nDistinct = seen.size.toLong + (if (sawNullTok) 1L else 0L)
    var best = 0L
    var nullRun = 0L
    if (n >= 2) {
      val counts = new java.util.HashMap[UTF8String, Long]()
      i = 0
      while (i < n - 1) {
        if (tokens.isNullAt(i) || tokens.isNullAt(i + 1)) {
          nullRun += 1L
          if (nullRun > best) best = nullRun
        } else {
          // space-joined bigram key: byte-equal to the concat the HOF
          // form sorted and run-counted (one buffer reuse via concat)
          val key = UTF8String.concat(tokens.getUTF8String(i),
            SpaceUtf8, tokens.getUTF8String(i + 1))
          val c = counts.merge(key, 1L, (a, b) => a + b)
          if (c > best) best = c
        }
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nDistinct, best))
  }

  /** SimHash over a token array: per token the 32-bit md5 prefix votes ±1 on
    * each bit; bit i of the result is set when the balance is positive.
    * Identical to the explode → 32-conditional-sum aggregation it replaces. */
  def simhashFromTokens(tokens: ArrayData, nBits: Int): Long = {
    val dig = digests.get()
    val bal = new Array[Int](nBits)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val bytes = tokens.getUTF8String(t).getBytes
        val h = md5Prefix(dig, bytes, 0, bytes.length, nBits)
        var i = 0
        while (i < nBits) {
          if (((h >> i) & 1L) == 1L) bal(i) += 1 else bal(i) -= 1
          i += 1
        }
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < nBits) {
      if (bal(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }
}

/** Codegen Catalyst expressions wrapping [[ShingleUtil]] — the per-document
  * dedup kernels (see graft.dedup.Dedup for the query plans built on them).
  */
object ShingleExpressions {

  /** Sorted-distinct shingle-hash set of a string:
    * `graft_shingle_set(str, k, nHexDigits, mod, algo)` with algo ∈
    * {md5, xxh64}. md5 hashes are `conv(substring(md5(sh),1,n),16,10) % mod`
    * — cross-engine identical (the DuckDB oracle path); xxh64 is the cheap
    * production hash (Spark-only). */
  case class ShingleHashSet(child: Expression, k: Int, nHexDigits: Int,
                            mod: Long, algo: String) extends UnaryExpression {
    require(k >= 1, s"shingle width must be >= 1, got $k")
    require(nHexDigits >= 1 && nHexDigits <= 15,
      s"nHexDigits must be in [1, 15], got $nHexDigits")
    require(algo == "md5" || algo == "xxh64", s"unknown hash algo $algo")

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string argument, got ${other.simpleString}")
      }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_shingle_set"

    private val nBits = 4 * nHexDigits

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String]
      if (algo == "md5") ShingleUtil.md5ShingleSet(s, k, nBits, mod)
      else ShingleUtil.xxhShingleSet(s, k, mod)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        if (algo == "md5")
          s"graft.functions.ShingleUtil.md5ShingleSet($c, $k, $nBits, ${mod}L)"
        else
          s"graft.functions.ShingleUtil.xxhShingleSet($c, $k, ${mod}L)")

    override protected def withNewChildInternal(newChild: Expression): ShingleHashSet =
      copy(child = newChild)
  }

  /** Sorted-distinct n-gram hash set of a token array:
    * `graft_gram_set(toks, n, nHexDigits, algo)` with algo ∈ {md5, xxh64}.
    * The gram string is the space-join of n consecutive tokens; md5 hashes
    * are the first `nHexDigits` hex digits as BIGINT (cross-engine
    * identical — the DuckDB oracle path), xxh64 is Spark's `xxhash64`
    * (seed 42, full signed range — the production fast path). Fewer than
    * n tokens → empty array. */
  case class GramHashSet(child: Expression, n: Int, nHexDigits: Int,
                         algo: String) extends UnaryExpression {
    require(n >= 1, s"gram width must be >= 1, got $n")
    require(nHexDigits >= 1 && nHexDigits <= 15,
      s"nHexDigits must be in [1, 15], got $nHexDigits")
    require(algo == "md5" || algo == "xxh64", s"unknown hash algo $algo")

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<string> argument, got ${other.simpleString}")
      }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_gram_set"

    private val nBits = 4 * nHexDigits

    override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[ArrayData]
      if (algo == "md5") ShingleUtil.md5GramSet(toks, n, nBits)
      else ShingleUtil.xxhGramSet(toks, n)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        if (algo == "md5")
          s"graft.functions.ShingleUtil.md5GramSet($c, $n, $nBits)"
        else
          s"graft.functions.ShingleUtil.xxhGramSet($c, $n)")

    override protected def withNewChildInternal(newChild: Expression): GramHashSet =
      copy(child = newChild)
  }

  /** `graft_minhash_sig(hs, m, mod)` → array<long> of the m minhash values. */
  case class MinhashSignature(child: Expression, m: Int, mod: Long)
      extends UnaryExpression {
    require(m >= 1, s"signature length must be >= 1, got $m")

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<long> argument, got ${other.simpleString}")
      }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_minhash_sig"

    override def nullSafeEval(input: Any): Any =
      ShingleUtil.minhashSig(input.asInstanceOf[ArrayData], m, mod)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.ShingleUtil.minhashSig($c, $m, ${mod}L)")

    override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
      copy(child = newChild)
  }

  /** `graft_sorted_intersect(a, b)` → |A∩B| for sorted-distinct arrays. */
  case class SortedIntersect(left: Expression, right: Expression)
      extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<long> arguments, got " +
            s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
      }
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_sorted_intersect"

    override def nullSafeEval(a: Any, b: Any): Any =
      ShingleUtil.sortedIntersectCount(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.ShingleUtil.sortedIntersectCount($a, $b)")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SortedIntersect =
      copy(left = newLeft, right = newRight)
  }

  /** `graft_bigrams(tokens)` → array<string> of space-joined adjacent
    * pairs (see [[ShingleUtil.bigrams]]). */
  case class Bigrams(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<string> argument, got ${other.simpleString}")
      }
    override def dataType: DataType = ArrayType(StringType, containsNull = true)
    override def prettyName: String = "graft_bigrams"

    override def nullSafeEval(input: Any): Any =
      ShingleUtil.bigrams(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.bigrams($c)")

    override protected def withNewChildInternal(newChild: Expression): Bigrams =
      copy(child = newChild)
  }

  /** `graft_repetition_counts(tokens)` →
    * struct<n_distinct: long, top_bigram_n: long> — one pass instead of
    * the interpreted transform + string-array sort + interpreted
    * aggregate fold (see [[ShingleUtil.repetitionCounts]]). */
  case class RepetitionCounts(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<string> argument, got ${other.simpleString}")
      }
    override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_distinct", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("top_bigram_n", LongType, nullable = false)))
    override def prettyName: String = "graft_repetition_counts"

    override def nullSafeEval(input: Any): Any =
      ShingleUtil.repetitionCounts(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.ShingleUtil.repetitionCounts($c)")

    override protected def withNewChildInternal(newChild: Expression): RepetitionCounts =
      copy(child = newChild)
  }

  /** `graft_simhash(tokens, nBits)` → long simhash signature. */
  case class SimhashFromTokens(child: Expression, nBits: Int)
      extends UnaryExpression {
    require(nBits >= 1 && nBits <= 60, s"nBits must be in [1, 60], got $nBits")

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<string> argument, got ${other.simpleString}")
      }
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_simhash"

    override def nullSafeEval(input: Any): Any =
      ShingleUtil.simhashFromTokens(input.asInstanceOf[ArrayData], nBits)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.ShingleUtil.simhashFromTokens($c, $nBits)")

    override protected def withNewChildInternal(newChild: Expression): SimhashFromTokens =
      copy(child = newChild)
  }

  // ---- Column API (resolved through the function registry) ----

  def shingleSet(str: Column, k: Int, nHexDigits: Int, mod: Long,
                 algo: String): Column =
    call_function("graft_shingle_set", str, lit(k), lit(nHexDigits),
      lit(mod), lit(algo))

  def gramSet(toks: Column, n: Int, nHexDigits: Int, algo: String): Column =
    call_function("graft_gram_set", toks, lit(n), lit(nHexDigits), lit(algo))

  def minhashSig(hs: Column, m: Int, mod: Long): Column =
    call_function("graft_minhash_sig", hs, lit(m), lit(mod))

  def sortedIntersect(a: Column, b: Column): Column =
    call_function("graft_sorted_intersect", a, b)

  def simhash(tokens: Column, nBits: Int): Column =
    call_function("graft_simhash", tokens, lit(nBits))

  def repetitionCounts(tokens: Column): Column =
    call_function("graft_repetition_counts", tokens)

  def bigrams(tokens: Column): Column =
    call_function("graft_bigrams", tokens)

  // ---- registry builders ----

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be a long literal, got $other")
  }
  private def strLit(e: Expression, what: String): String = e match {
    case Literal(v: UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private[functions] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_shingle_set" -> (exprs => ShingleHashSet(exprs(0),
      intLit(exprs(1), "k"), intLit(exprs(2), "nHexDigits"),
      longLit(exprs(3), "mod"), strLit(exprs(4), "algo"))),
    "graft_gram_set" -> (exprs => GramHashSet(exprs(0),
      intLit(exprs(1), "n"), intLit(exprs(2), "nHexDigits"),
      strLit(exprs(3), "algo"))),
    "graft_minhash_sig" -> (exprs => MinhashSignature(exprs(0),
      intLit(exprs(1), "m"), longLit(exprs(2), "mod"))),
    "graft_sorted_intersect" -> (exprs => SortedIntersect(exprs(0), exprs(1))),
    "graft_repetition_counts" -> (exprs => RepetitionCounts(exprs(0))),
    "graft_bigrams" -> (exprs => Bigrams(exprs(0))),
    "graft_simhash" -> (exprs => SimhashFromTokens(exprs(0),
      intLit(exprs(1), "nBits"))))

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      Registration.registerOnce(spark, name, builder)
    }
}

/** Idempotent temp-function registration: skips names already present so
  * repeated `register` calls (one per query construction) don't spam
  * "function replaced a previously registered function" warnings. */
object Registration {
  def registerOnce(spark: SparkSession, name: String,
                   builder: Seq[Expression] => Expression): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
    if (!registry.functionExists(ident))
      registry.createOrReplaceTempFunction(name, builder, "built-in")
  }
}
