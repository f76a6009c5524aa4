package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for dense-vector math — preference path (b)
  * of the custom-operator ladder (compose built-ins < custom Expression <
  * custom plan node): the built-in composition
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` evaluates its lambda
  * interpreted, per element, with boxing; these emit a primitive loop
  * inside whole-stage codegen. Scoring 100 TB of embeddings is exactly the
  * workload where per-element boxing dominates, so this is the scale path
  * for graft.similarity.Ann.
  *
  * Summation is a strict left-to-right fold — the same order as the HOF
  * composition it replaces, so integer-quantized oracle results are
  * unchanged bit-for-bit.
  */
object VectorExpressions {

  /** Σ aᵢ·bᵢ (null elements contribute 0; null/length-mismatch arrays → null). */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<double> arguments, got " +
            s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
      }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) {
        if (!x.isNullAt(i) && !y.isNullAt(i))
          s += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
           |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
           |    $s += $x.getDouble($i) * $y.getDouble($i);
           |  }
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
  }

  /** cos(a, b) = a·b / (‖a‖·‖b‖); 0.0 when either norm is 0. */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<double> arguments, got " +
            s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
      }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_cosine"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < n) {
        if (!x.isNullAt(i) && !y.isNullAt(i)) {
          val xv = x.getDouble(i); val yv = y.getDouble(i)
          dot += xv * yv; nx += xv * xv; ny += yv * yv
        }
        i += 1
      }
      if (nx == 0.0 || ny == 0.0) 0.0
      else dot / (math.sqrt(nx) * math.sqrt(ny))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val dot = ctx.freshName("dot")
        val nx = ctx.freshName("nx")
        val ny = ctx.freshName("ny")
        val xv = ctx.freshName("xv")
        val yv = ctx.freshName("yv")
        s"""
           |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
           |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
           |    double $xv = $x.getDouble($i);
           |    double $yv = $y.getDouble($i);
           |    $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
           |  }
           |}
           |${ev.value} = ($nx == 0.0 || $ny == 0.0)
           |  ? 0.0 : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): CosineSimilarity =
      copy(left = newLeft, right = newRight)
  }

  /** Column API — resolves through the function registry, so call
    * [[register]] on the session (or install [[GraftExtensions]]) first. */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)
  def cosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)

  /** SQL registration: `SELECT graft_dot(a, b)` after installing
    * [[GraftExtensions]] (or calling this directly on a session). */
  def register(spark: SparkSession): Unit = {
    Registration.registerOnce(spark, "graft_dot",
      exprs => DotProduct(exprs(0), exprs(1)))
    Registration.registerOnce(spark, "graft_cosine",
      exprs => CosineSimilarity(exprs(0), exprs(1)))
  }
}

/** SparkSessionExtensions installer:
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[VectorExpressions.DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => VectorExpressions.DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[VectorExpressions.CosineSimilarity].getName, "graft_cosine"),
      (exprs: Seq[Expression]) => VectorExpressions.CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("graft_md5_prefix64"),
      new ExpressionInfo(classOf[HashExpressions.Md5Prefix64].getName, "graft_md5_prefix64"),
      (exprs: Seq[Expression]) => HashExpressions.fromExprs(exprs)))
    ext.injectFunction((FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NormalizeExpressions.Nfc].getName, "graft_nfc"),
      (exprs: Seq[Expression]) => NormalizeExpressions.Nfc(exprs(0))))
    ext.injectFunction((FunctionIdentifier("graft_bloom_might_contain"),
      new ExpressionInfo(classOf[BloomExpressions.BloomMightContain].getName,
        "graft_bloom_might_contain"),
      (exprs: Seq[Expression]) => BloomExpressions.BloomMightContain(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("graft_pq_code"),
      new ExpressionInfo(classOf[PqExpressions.PqCode].getName, "graft_pq_code"),
      (exprs: Seq[Expression]) => PqExpressions.codeFromExprs(exprs)))
    ext.injectFunction((FunctionIdentifier("graft_pq_adc"),
      new ExpressionInfo(classOf[PqExpressions.PqAdcDot].getName, "graft_pq_adc"),
      (exprs: Seq[Expression]) => PqExpressions.adcFromExprs(exprs)))
    ext.injectFunction((FunctionIdentifier("graft_bpe_rep"),
      new ExpressionInfo(classOf[BpeExpressions.BpeRep].getName, "graft_bpe_rep"),
      (exprs: Seq[Expression]) => BpeExpressions.fromExprs(exprs)))
    ext.injectFunction((FunctionIdentifier("graft_ordered_pairs"),
      new ExpressionInfo(classOf[PairExpressions.OrderedPairs].getName,
        "graft_ordered_pairs"),
      (exprs: Seq[Expression]) => PairExpressions.OrderedPairs(exprs(0))))
    ShingleExpressions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(ShingleExpressions.getClass.getName, name), builder))
    }
    ScrubExpressions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(ScrubExpressions.getClass.getName, name), builder))
    }
    // window row_number-top-k → bounded-heap aggregate (see the rule's
    // scaladoc); every session built with this extension — including the
    // driver's Verify/Bench — runs its window-top-k queries through it
    ext.injectOptimizerRule(_ => graft.plans.RewriteWindowTopK)
    // whole-operator extension point: the native as-of join's planner
    // strategy (logical AsOfJoin node -> sort-merge AsOfJoinExec)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinPlan.Strategy)
  }
}
