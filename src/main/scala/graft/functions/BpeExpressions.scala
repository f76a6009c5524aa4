package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen kernel for the corpus-wide BPE encode (graft.ops.Bpe).
  *
  * The r17 encode was one literal SQL expression: an interpreted
  * `transform(ts, t -> regexp_replace(t, '(.)', '|$1 '))` (a regex pass
  * per token, inside an interpreted lambda) followed by 16 nested
  * `replace` calls — each a full scan AND a full re-allocation of the
  * document-sized representation string, 17 document copies per row.
  * This kernel produces the identical bytes in one pass: per token,
  * split to single-char symbols, apply the merge list in order with the
  * left-to-right non-overlapping rule (what `replace` does on the
  * delimited representation — symbols are [a-z0-9]-only, so a pattern
  * can never misalign or span the '\n' joiner), then emit "|sym " runs
  * joined by '\n'. BpeSpec pins kernel ≡ replace-chain bit-identity;
  * the unchanged oracle SQL gates the query end-to-end.
  */
object BpeUtil {
  def bpeRep(ts: ArrayData, mergeA: Array[String], mergeB: Array[String])
      : UTF8String = {
    val sb = new java.lang.StringBuilder()
    val nTok = ts.numElements()
    var wrote = false
    var ti = 0
    while (ti < nTok) {
      if (!ts.isNullAt(ti)) { // concat_ws skips null elements + separator
        if (wrote) sb.append('\n')
        wrote = true
        val t = ts.getUTF8String(ti).toString
        var syms = new Array[String](t.length)
        var i = 0
        while (i < t.length) { syms(i) = String.valueOf(t.charAt(i)); i += 1 }
        var len = t.length
        var m = 0
        while (m < mergeA.length) {
          val a = mergeA(m); val b = mergeB(m)
          var r = 0; var w = 0
          var ab: String = null
          while (r < len) {
            if (r < len - 1 && syms(r) == a && syms(r + 1) == b) {
              if (ab == null) ab = a + b
              syms(w) = ab; r += 2
            } else { syms(w) = syms(r); r += 1 }
            w += 1
          }
          len = w
          m += 1
        }
        i = 0
        while (i < len) { sb.append('|').append(syms(i)).append(' '); i += 1 }
      }
      ti += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

object BpeExpressions {

  /** `graft_bpe_rep(ts, as, bs)` → the encoded representation string
    * (see [[BpeUtil.bpeRep]]); `as`/`bs` are the ordered merge halves as
    * string-array literals. */
  case class BpeRep(child: Expression, mergeA: Seq[String], mergeB: Seq[String])
      extends UnaryExpression {
    require(mergeA.length == mergeB.length, "merge halves must align")

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<string> argument, got ${other.simpleString}")
      }
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_bpe_rep"

    @transient private lazy val aArr: Array[String] = mergeA.toArray
    @transient private lazy val bArr: Array[String] = mergeB.toArray

    override def nullSafeEval(input: Any): Any =
      BpeUtil.bpeRep(input.asInstanceOf[ArrayData], aArr, bArr)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val aRef = ctx.addReferenceObj("bpeMergeA", aArr, "java.lang.String[]")
      val bRef = ctx.addReferenceObj("bpeMergeB", bArr, "java.lang.String[]")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.BpeUtil.bpeRep($c, $aRef, $bRef)")
    }

    override protected def withNewChildInternal(newChild: Expression): BpeRep =
      copy(child = newChild)
  }

  def bpeRep(ts: Column, merges: Seq[(String, String)]): Column =
    call_function("graft_bpe_rep", ts,
      lit(merges.map(_._1).toArray), lit(merges.map(_._2).toArray))

  private def strArrLit(e: Expression, what: String): Seq[String] = e match {
    case Literal(v: ArrayData, ArrayType(StringType, _)) =>
      v.toArray[UTF8String](StringType).map(s => if (s == null) null else s.toString).toSeq
    case other => throw new IllegalArgumentException(
      s"$what must be an array<string> literal, got $other")
  }

  private[functions] def fromExprs(exprs: Seq[Expression]): BpeRep =
    BpeRep(exprs(0), strArrLit(exprs(1), "graft_bpe_rep merge a-halves"),
      strArrLit(exprs(2), "graft_bpe_rep merge b-halves"))

  def register(spark: SparkSession): Unit =
    Registration.registerOnce(spark, "graft_bpe_rep", fromExprs)
}
