package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Static kernel for in-row ordered-pair expansion (see
  * [[PairExpressions.OrderedPairs]]); a plain object compiles to static
  * forwarders callable from generated code, like [[HashUtil]]. */
object PairUtil {
  /** All (ds[i], ds[j]) with i < j, in (i, j) order. */
  def orderedPairs(ds: ArrayData): ArrayData = {
    val n = ds.numElements()
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n - 1) {
      val a = ds.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](a, ds.getLong(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen ordered-pair expansion for the dedup candidate generators
  * (graft.dedup.Dedup.ngramPairsOver).
  *
  * Why it exists (r17, guide §1.2 step 2): the shuffle-removal pass
  * replaced the rare-posting self-join with an in-row expansion of each
  * gram's df-capped doc list — the right plan shape (the second exchange
  * and join operator were never fundamental) — but composed the expansion
  * from nested `transform(sequence(...))` HOFs, whose interpreted lambdas
  * allocate one array + struct per element: measured ×1.4–1.7 on the whole
  * ngram family vs the self-join it replaced (same-session A/B,
  * d_ngram_indexed 2.7 s → 4.5 s). This expression produces the identical
  * pair array with one flat loop per gram row. */
object PairExpressions {

  /** (ds[i], ds[j]) for all i < j over a sorted array<long> — exactly the
    * `flatten(transform(sequence(0, n-2), i -> transform(sequence(i+1,
    * n-1), j -> struct(ds[i], ds[j]))))` composition it replaces, element
    * for element. Null array → null; elements non-null by contract
    * (collect_list output). */
  case class OrderedPairs(child: Expression) extends UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint>, got ${other.simpleString}")
      }
    override def dataType: DataType = ArrayType(
      StructType(Seq(StructField("doc_a", LongType, nullable = false),
        StructField("doc_b", LongType, nullable = false))),
      containsNull = false)
    override def prettyName: String = "graft_ordered_pairs"

    override def nullSafeEval(input: Any): Any =
      PairUtil.orderedPairs(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, ds =>
        s"graft.functions.PairUtil.orderedPairs($ds)")

    override protected def withNewChildInternal(newChild: Expression): OrderedPairs =
      copy(child = newChild)
  }

  def orderedPairs(ds: Column): Column = call_function("graft_ordered_pairs", ds)

  def register(spark: SparkSession): Unit =
    Registration.registerOnce(spark, "graft_ordered_pairs",
      exprs => OrderedPairs(exprs(0)))
}
