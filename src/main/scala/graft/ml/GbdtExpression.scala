package graft.ml

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** GBDT expectation as a native Catalyst expression — the "functions, not
  * UDFs" form of model scoring. A ScalaUDF converts every row's ArrayData
  * into a boxed Seq through CatalystTypeConverters before the model sees
  * it; this expression reads the primitive array directly into a reusable
  * buffer and calls the flat-array tree walk, staying inside the
  * whole-stage-codegen pipeline (the generated code calls
  * [[scoreArray]] through a reference object — tree ensembles are far too
  * large to inline as Java source).
  *
  * Null elements score as NaN (XGBoost missing-branch semantics). The
  * buffer is per-instance; each task deserializes its own plan copy, so
  * single-threaded task execution makes it safe (same pattern as
  * nfl.XyacModel.KernelScorer).
  */
case class GbdtExpectation(child: Expression,
                           model: GbdtScorer.Model,
                           values: Array[Double])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_gbdt_expectation"

  @transient private lazy val buf = new Array[Double](model.featureIndex.size)

  def scoreArray(a: ArrayData): Double = {
    val n = a.numElements()
    var i = 0
    while (i < buf.length) {
      buf(i) = if (i < n && !a.isNullAt(i)) a.getDouble(i) else Double.NaN
      i += 1
    }
    model.expectation(buf, values)
  }

  override def nullSafeEval(input: Any): Any =
    scoreArray(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gbdt", this, classOf[GbdtExpectation].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.scoreArray($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): GbdtExpectation =
    copy(child = newChild)
}
