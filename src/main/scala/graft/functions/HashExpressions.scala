package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static hash kernels invoked from whole-stage-generated code.
  *
  * A plain `object` (no companion class) compiles to static forwarders, so
  * generated Java can call `graft.functions.HashUtil.md5PrefixBits(...)`
  * directly.
  */
object HashUtil {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Value of the first `nBits` bits of md5(bytes) as an unsigned-fitting
    * long (nBits ≤ 60 so the value is non-negative). Equivalent to
    * `conv(substring(md5(x), 1, nBits/4), 16, 10)` without the 32-char hex
    * string, the substring copy, or the base-16 parse. */
  def md5PrefixBits(bytes: Array[Byte], nBits: Int): Long = {
    val dig = digests.get().digest(bytes) // digest() resets the instance
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    v >>> (64 - nBits)
  }
}

/** Codegen md5-prefix hash used by the dedup family (graft.dedup.Dedup).
  *
  * Why it exists: shingle/token hashing is the per-row hot loop of
  * MinHash/SimHash dedup at 100 TB. The built-in composition
  * `conv(substring(md5(x), 1, 15), 16, 10)` materializes a hex string and
  * re-parses it per shingle — ~10M times per sf0.1 dedup query, 47% of the
  * round-1 bench. This expression produces the identical BIGINT straight
  * from digest bytes (md5 semantics unchanged → DuckDB oracle parity),
  * with a thread-local MessageDigest so no per-row allocation beyond the
  * digest itself.
  */
object HashExpressions {

  /** First `nHexDigits` hex digits of md5(str) as BIGINT (1 ≤ n ≤ 15). */
  case class Md5Prefix64(child: Expression, nHexDigits: Int)
      extends UnaryExpression {
    require(nHexDigits >= 1 && nHexDigits <= 15,
      s"nHexDigits must be in [1, 15], got $nHexDigits")

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string argument, got ${other.simpleString}")
      }
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_md5_prefix64"

    private val nBits = 4 * nHexDigits

    override def nullSafeEval(input: Any): Any =
      HashUtil.md5PrefixBits(input.asInstanceOf[UTF8String].getBytes, nBits)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.HashUtil.md5PrefixBits($c.getBytes(), $nBits)")

    override protected def withNewChildInternal(newChild: Expression): Md5Prefix64 =
      copy(child = newChild)
  }

  /** Column API — requires [[register]] (or GraftExtensions) on the session. */
  def md5Prefix64(str: Column, nHexDigits: Int): Column =
    call_function("graft_md5_prefix64", str,
      org.apache.spark.sql.functions.lit(nHexDigits))

  def register(spark: SparkSession): Unit =
    Registration.registerOnce(spark, "graft_md5_prefix64", exprs => fromExprs(exprs))

  private[functions] def fromExprs(exprs: Seq[Expression]): Md5Prefix64 = {
    val n = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"graft_md5_prefix64 second argument must be an integer literal, got $other")
    }
    Md5Prefix64(exprs(0), n)
  }
}
