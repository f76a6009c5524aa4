package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels for the scrub family's per-document reconstruction
  * (graft.ops.TextOps). The r17 rewrite correctly collapsed the scrub
  * tail to one doc-keyed aggregation + in-row work, but composed that
  * in-row work from nested higher-order built-ins (`transform`/`filter`
  * over gap structs, a `sequence` per flagged window) — whose lambdas
  * evaluate INTERPRETED with per-element allocations, the same r17 HOF
  * trap the PQ/pair kernels fixed. These kernels do the identical work
  * in one compiled pass per document.
  */
object ScrubUtil {

  private def sortedDistinctInts(xs: Array[Int]): Array[Int] = {
    java.util.Arrays.sort(xs)
    var w = 0
    var i = 0
    while (i < xs.length) {
      if (w == 0 || xs(i) != xs(w - 1)) { xs(w) = xs(i); w += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(xs, w)
  }

  /** Sorted-distinct covered token indices of the flagged window starts:
    * each start j covers j..j+g−1. Identical to
    * `array_sort(array_distinct(flatten(transform(js, j ->
    * sequence(j, j + g − 1)))))`. */
  def coveredIdx(js: ArrayData, g: Int): ArrayData = {
    val n = js.numElements()
    val out = new Array[Int](n * g)
    var i = 0
    var w = 0
    while (i < n) {
      val j = js.getInt(i)
      var d = 0
      while (d < g) { out(w) = j + d; w += 1; d += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      sortedDistinctInts(java.util.Arrays.copyOf(out, w)))
  }

  private val SpaceByte = ' '.toByte

  /** The kept text after scrubbing the covered indices: the gap slices
    * between consecutive covered indices (whole doc when `cov` is empty),
    * space-joined in order. Identical bytes to
    * `concat_ws(' ', flatten(transform(filter(transform(
    *   sequence(0, size(cov)), k -> struct(s, e)), g -> g.e >= g.s),
    *   g -> slice(t, g.s + 1, g.e - g.s + 1))))`
    * with s = (k = 0 ? 0 : cov[k−1]+1), e = (k = size(cov) ? n−1 : cov[k]−1)
    * and n = size(t). `cov` must be sorted-distinct within [0, n). */
  def keptText(t: ArrayData, cov: ArrayData): UTF8String = {
    val n = t.numElements()
    val nc = cov.numElements()
    // total kept bytes: tokens outside covered indices + separators
    var len = 0
    var kept = 0
    var k = 0
    var ci = 0
    while (k < n) {
      val covered = ci < nc && cov.getInt(ci) == k
      if (covered) ci += 1
      else if (!t.isNullAt(k)) {
        len += t.getUTF8String(k).numBytes()
        kept += 1
      }
      k += 1
    }
    if (kept > 1) len += kept - 1
    val buf = new Array[Byte](len)
    var pos = 0
    var wrote = false
    k = 0
    ci = 0
    while (k < n) {
      val covered = ci < nc && cov.getInt(ci) == k
      if (covered) ci += 1
      else if (!t.isNullAt(k)) {
        // concat_ws keeps EMPTY kept tokens (with separators) and skips
        // only nulls — separate on element count, not bytes written
        if (wrote) { buf(pos) = SpaceByte; pos += 1 }
        val tok = t.getUTF8String(k)
        tok.writeToMemory(buf,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + pos)
        pos += tok.numBytes()
        wrote = true
      }
      k += 1
    }
    UTF8String.fromBytes(buf)
  }
}

/** Codegen Catalyst expressions wrapping [[ScrubUtil]]. */
object ScrubExpressions {

  /** `graft_covered_idx(js, g)` → sorted-distinct array<int> of covered
    * token indices. */
  case class CoveredIdx(child: Expression, g: Int) extends UnaryExpression {
    require(g >= 1, s"gram width must be >= 1, got $g")
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<int> argument, got ${other.simpleString}")
      }
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "graft_covered_idx"

    override def nullSafeEval(input: Any): Any =
      ScrubUtil.coveredIdx(input.asInstanceOf[ArrayData], g)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.ScrubUtil.coveredIdx($c, $g)")

    override protected def withNewChildInternal(newChild: Expression): CoveredIdx =
      copy(child = newChild)
  }

  /** `graft_scrub_kept(t, cov)` → the space-joined kept text (gap slices
    * between covered indices). */
  case class ScrubKept(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(StringType, _), ArrayType(IntegerType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<string>, array<int>), got $other")
      }
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_scrub_kept"

    override def nullSafeEval(t: Any, cov: Any): Any =
      ScrubUtil.keptText(t.asInstanceOf[ArrayData], cov.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (t, cov) =>
        s"graft.functions.ScrubUtil.keptText($t, $cov)")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): ScrubKept =
      copy(left = newLeft, right = newRight)
  }

  def coveredIdx(js: Column, g: Int): Column =
    call_function("graft_covered_idx", js, org.apache.spark.sql.functions.lit(g))

  def scrubKept(t: Column, cov: Column): Column =
    call_function("graft_scrub_kept", t, cov)

  private[functions] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_covered_idx" -> (exprs => CoveredIdx(exprs(0), exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"graft_covered_idx g must be an integer literal, got $other")
    })),
    "graft_scrub_kept" -> (exprs => ScrubKept(exprs(0), exprs(1))))

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      Registration.registerOnce(spark, name, builder)
    }
}
