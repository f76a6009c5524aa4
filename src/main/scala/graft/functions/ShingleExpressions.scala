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

  def minhashSig(hs: Column, m: Int, mod: Long): Column =
    call_function("graft_minhash_sig", hs, lit(m), lit(mod))

  def sortedIntersect(a: Column, b: Column): Column =
    call_function("graft_sorted_intersect", a, b)

  def simhash(tokens: Column, nBits: Int): Column =
    call_function("graft_simhash", tokens, lit(nBits))

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
    "graft_minhash_sig" -> (exprs => MinhashSignature(exprs(0),
      intLit(exprs(1), "m"), longLit(exprs(2), "mod"))),
    "graft_sorted_intersect" -> (exprs => SortedIntersect(exprs(0), exprs(1))),
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
