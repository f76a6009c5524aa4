package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Runtime bloom-filter membership test — the join-pruning primitive for
  * 100 TB fact/dim joins.
  *
  * A selective dim side is summarized into a driver-sized
  * `org.apache.spark.util.sketch.BloomFilter` (a few MB for tens of
  * millions of keys at 1% fpp), embedded in the plan as a binary literal,
  * and evaluated against the fact side's key BEFORE the shuffle: false →
  * definitely no join partner, row dropped pre-exchange; true → maybe,
  * the join itself removes false positives. Result set is therefore
  * bit-identical to the unpruned join — only the shuffled volume changes.
  * This is the same mechanism as Spark's injected runtime filter
  * (spark.sql.optimizer.runtime.bloomFilter), exposed as an explicit,
  * composable operator so a pipeline can also prune before non-join work
  * (e.g. an expensive decode of payloads whose ids survive a filter).
  *
  * The filter deserializes ONCE per task (transient lazy + codegen
  * reference object), never per row.
  */
object BloomExpressions {

  case class BloomMightContain(left: Expression, right: Expression)
      extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (BinaryType, LongType) if left.foldable =>
          TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (foldable binary, bigint), got " +
            s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
      }
    override def dataType: DataType = BooleanType
    override def prettyName: String = "graft_bloom_might_contain"

    @transient private lazy val bloom: BloomFilter = {
      val bytes = left.eval(null).asInstanceOf[Array[Byte]]
      BloomFilter.readFrom(new ByteArrayInputStream(bytes))
    }

    override def nullSafeEval(b: Any, key: Any): Any =
      bloom.mightContainLong(key.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (_, key) => {
        val bf = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
        s"${ev.value} = $bf.mightContainLong($key);"
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): BloomMightContain =
      copy(left = newLeft, right = newRight)
  }

  /** Column API (needs [[Registration]] / GraftExtensions, like the other
    * graft functions). `filterBytes` must be a binary literal. */
  def mightContain(filterBytes: Column, key: Column): Column =
    call_function("graft_bloom_might_contain", filterBytes, key)

  /** Serialize a sketch BloomFilter for embedding as a plan literal. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  def register(spark: SparkSession): Unit =
    Registration.registerOnce(spark, "graft_bloom_might_contain",
      exprs => BloomMightContain(exprs(0), exprs(1)))
}
