package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Codegen kernels for the product-quantization family
  * (graft.similarity.Ann) — preference path (b) of the custom-operator
  * ladder, same rationale as [[VectorExpressions]].
  *
  * Why they exist (r17, guide §1.2 step 2 "per-task work"): the r17
  * shuffle-removal pass correctly turned PQ assignment/encode/ADC into
  * map-side expressions (the crossJoin + window + join exchanges were
  * never fundamental), but composed them from higher-order built-ins
  * (`transform`/`zip_with`/`aggregate` over a 1024-double literal
  * codebook). HOF lambdas evaluate INTERPRETED, per element, with one
  * array/struct allocation per lambda application — ~800 allocations per
  * corpus row for the M·K·SubDim argmin — and the bench measured the
  * regression: `s_pq_topk.encode` 2.0 s (r16 join form) → 12.2 s (HOF
  * form), train 2.7 s → 53.7 s (the train assignment additionally
  * re-evaluated the argmin once per exploded coordinate — the analyzer
  * places non-generator select expressions ABOVE the Generate). These
  * expressions keep the map-only plan shape and make the per-row work a
  * flat primitive loop inside whole-stage codegen.
  *
  * Bit-identity with the HOF forms they replace (oracle contract):
  * per-subspace distance folds j ascending as `acc + (c*c − (x*c)*2)`,
  * the argmin folds cells ascending keeping the FIRST strict minimum
  * (NaN never wins a `<`; a subspace whose every cell is NaN yields
  * cell −1), and the ADC sum folds subspaces ascending — exactly the
  * association order of the `aggregate(...)` calls they replace, and
  * float +/× on the same operands in the same order is bit-identical.
  */
object PqExpressions {

  /** The PQ code of a quantized vector: for each of `m` subspaces of
    * `subDim = cb.length / (m·k)` coords, the index of the codebook cell
    * minimizing Σ_j (c·c − 2·x·c). `cb` is the flattened
    * [m][cell][j] codebook (missing cells NaN). Null vector → null;
    * vector elements must be non-null (quantized coords by contract).
    * A vector whose LENGTH is not m·subDim is malformed — the kernel
    * returns null rather than reading out of bounds (r17 ADVICE: an
    * UnsafeArrayData getDouble past the end returns garbage silently,
    * which would encode a malformed embedding to wrong-but-plausible
    * codes; the corpus contract is fixed-dim, so no well-formed row ever
    * takes this branch).
    *
    * `cb` is a Seq, not Array, so case-class equality is element-wise —
    * two semantically identical PqCode expressions compare equal and
    * Catalyst canonicalization/subexpression elimination can see it
    * (r17 ADVICE: an Array field made equals reference-based). */
  case class PqCode(child: Expression, cb: Seq[Double], m: Int, k: Int)
      extends UnaryExpression {
    require(m > 0 && k > 0 && cb.length % (m * k) == 0,
      s"codebook length ${cb.length} not divisible by m*k = ${m * k}")

    private val subDim = cb.length / (m * k)
    @transient private lazy val cbArr: Array[Double] = cb.toArray
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<double>, got ${other.simpleString}")
      }
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "graft_pq_code"

    override def nullSafeEval(input: Any): Any = {
      val q = input.asInstanceOf[ArrayData]
      if (q.numElements() != m * subDim) return null
      val out = new Array[Int](m)
      var mi = 0
      while (mi < m) {
        var best = -1
        var bestD = Double.PositiveInfinity
        var c = 0
        while (c < k) {
          var d = 0.0
          val base = (mi * k + c) * subDim
          var j = 0
          while (j < subDim) {
            val cc = cbArr(base + j)
            val x = q.getDouble(mi * subDim + j)
            d += cc * cc - x * cc * 2.0
            j += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        out(mi) = best
        mi += 1
      }
      ArrayData.toArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, q => {
        val cbRef = ctx.addReferenceObj("pqcb", cbArr, "double[]")
        val out = ctx.freshName("out")
        val mi = ctx.freshName("mi")
        val c = ctx.freshName("c")
        val j = ctx.freshName("j")
        val d = ctx.freshName("d")
        val base = ctx.freshName("base")
        val best = ctx.freshName("best")
        val bestD = ctx.freshName("bestD")
        val cc = ctx.freshName("cc")
        val x = ctx.freshName("x")
        s"""
           |if ($q.numElements() != ${m * subDim}) {
           |  ${ev.isNull} = true;
           |} else {
           |int[] $out = new int[$m];
           |for (int $mi = 0; $mi < $m; $mi++) {
           |  int $best = -1;
           |  double $bestD = Double.POSITIVE_INFINITY;
           |  for (int $c = 0; $c < $k; $c++) {
           |    double $d = 0.0;
           |    int $base = ($mi * $k + $c) * $subDim;
           |    for (int $j = 0; $j < $subDim; $j++) {
           |      double $cc = $cbRef[$base + $j];
           |      double $x = $q.getDouble($mi * $subDim + $j);
           |      $d += $cc * $cc - $x * $cc * 2.0D;
           |    }
           |    if ($d < $bestD) { $bestD = $d; $best = $c; }
           |  }
           |  $out[$mi] = $best;
           |}
           |${ev.value} =
           |  org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
           |}
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): PqCode =
      copy(child = newChild)
  }

  /** ADC score of one corpus code against one query lookup table:
    * Σ_m lut[m·k + code[m]], subspaces ascending. `lut` is the flattened
    * per-query (m, cell) → q·centroid table. A code cell outside [0, k)
    * (the all-NaN-subspace sentinel −1) yields null. (Precision note, r17
    * ADVICE: the old `element_at(map, m·k + cell)` form only missed the
    * map — and so produced null — for the sentinel at m = 0; at m > 0 the
    * key m·k − 1 silently read the PREVIOUS subspace's last cell, a wrong
    * value. This kernel deliberately nulls every sentinel; no trained
    * codebook produces one, so the behaviors never diverge in practice.) */
  case class PqAdcDot(left: Expression, right: Expression, k: Int)
      extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<int>, array<double>), got $other")
      }
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_pq_adc"

    override def nullSafeEval(codeAny: Any, lutAny: Any): Any = {
      val code = codeAny.asInstanceOf[ArrayData]
      val lut = lutAny.asInstanceOf[ArrayData]
      val m = code.numElements()
      var s = 0.0
      var mi = 0
      while (mi < m) {
        val c = code.getInt(mi)
        if (c < 0 || c >= k) return null
        s += lut.getDouble(mi * k + c)
        mi += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (code, lut) => {
        val s = ctx.freshName("s")
        val mi = ctx.freshName("mi")
        val c = ctx.freshName("c")
        val n = ctx.freshName("n")
        s"""
           |double $s = 0.0;
           |int $n = $code.numElements();
           |for (int $mi = 0; $mi < $n && !${ev.isNull}; $mi++) {
           |  int $c = $code.getInt($mi);
           |  if ($c < 0 || $c >= $k) { ${ev.isNull} = true; }
           |  else { $s += $lut.getDouble($mi * $k + $c); }
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): PqAdcDot =
      copy(left = newLeft, right = newRight)
  }

  /** Column API — requires [[register]] (or GraftExtensions) first. The
    * codebook/geometry ride as literals and are unpacked once at plan
    * build, never per row. */
  def pqCode(q: Column, cbFlat: Array[Double], m: Int, k: Int): Column =
    call_function("graft_pq_code", q, lit(cbFlat), lit(m), lit(k))

  def pqAdcDot(code: Column, lut: Column, k: Int): Column =
    call_function("graft_pq_adc", code, lut, lit(k))

  def register(spark: SparkSession): Unit = {
    Registration.registerOnce(spark, "graft_pq_code", codeFromExprs)
    Registration.registerOnce(spark, "graft_pq_adc", adcFromExprs)
  }

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private[functions] def codeFromExprs(exprs: Seq[Expression]): PqCode = {
    val cb = exprs(1) match {
      case Literal(v: ArrayData, ArrayType(DoubleType, _)) =>
        scala.collection.immutable.ArraySeq.unsafeWrapArray(v.toDoubleArray())
      case other => throw new IllegalArgumentException(
        s"graft_pq_code codebook must be an array<double> literal, got $other")
    }
    PqCode(exprs(0), cb, intLit(exprs(2), "graft_pq_code m"),
      intLit(exprs(3), "graft_pq_code k"))
  }

  private[functions] def adcFromExprs(exprs: Seq[Expression]): PqAdcDot =
    PqAdcDot(exprs(0), exprs(1), intLit(exprs(2), "graft_pq_adc k"))
}
