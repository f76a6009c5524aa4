package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static Unicode-normalization kernel invoked from generated code (the
  * [[HashUtil]] static-forwarder pattern). */
object NormalizeUtil {
  /** Canonical composition (Unicode NFC). Two fast paths, because at
    * 100 TB the normalizer sits in front of EVERY hash-based dedup stage
    * so the common case IS the cost: (1) pure ASCII — a raw byte scan of
    * the UTF8String, no String ever allocated (all bytes < 0x80 ⇒ NFC by
    * definition); (2) non-ASCII but already composed — one decoded copy
    * for the `isNormalized` probe, returned as-is. Only genuinely
    * decomposed text pays the normalize. */
  def nfc(s: UTF8String): UTF8String = {
    var i = 0
    val n = s.numBytes
    while (i < n && s.getByte(i) >= 0) i += 1
    if (i == n) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Codegen Unicode NFC normalization (`graft_nfc`) — the normalize-
  * before-hash stage every web-corpus pipeline runs (CCNet/RefinedWeb:
  * decomposed "e +  ́" and composed "é" must dedup as the same text, and
  * a hash built over un-normalized bytes silently treats every encoder's
  * composition choice as distinct content).
  *
  * Why an Expression and not a UDF: this runs inside the per-row hot
  * loop ahead of the shingle/gram hashes, so it must stay inside
  * whole-stage codegen with the zero-copy fast path for already-NFC
  * text. Oracle parity: DuckDB's `nfc_normalize` implements the same
  * Unicode canonical composition, so planted decomposed codepoints
  * hash-gate the normalizer end-to-end.
  */
object NormalizeExpressions {

  case class Nfc(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string argument, got ${other.simpleString}")
      }
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_nfc"

    override def nullSafeEval(input: Any): Any =
      NormalizeUtil.nfc(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeUtil.nfc($c)")

    override protected def withNewChildInternal(newChild: Expression): Nfc =
      copy(child = newChild)
  }

  /** Column API — requires [[register]] (or GraftExtensions) on the session. */
  def nfc(str: Column): Column = call_function("graft_nfc", str)

  def register(spark: SparkSession): Unit =
    Registration.registerOnce(spark, "graft_nfc", exprs => Nfc(exprs(0)))
}
