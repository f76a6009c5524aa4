package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic-aggregation helpers.
  *
  * Oracle parity requires bit-identical results between Spark and DuckDB.
  * Per-row scalar IEEE-754 expressions are bit-identical across engines, but
  * floating-point SUM is order-dependent, and shuffle/partition order differs.
  * Fix: quantize per-row to integer micro-units (exact in both engines),
  * aggregate as BIGINT (order-independent exact integer arithmetic), convert
  * back once at the end. This also survives AQE re-partitioning at any scale —
  * the same property that makes results reproducible on a 1000-executor
  * cluster.
  */
object Num {
  private val Scale = 1e6

  /** Per-row exact quantization to integer micros.
    *
    * `floor(x * 1e6 + 0.5)` instead of `round(x * 1e6)`: Spark's `round` on
    * DoubleType allocates a java.math.BigDecimal per row (Round#nullSafeEval),
    * which dominated s_math_funcs (9 quantized sums × 600k rows). floor/mul/
    * add are single IEEE-754 instructions, bit-identical across engines as
    * long as BOTH sides use the literally same formula — which sqlMicros
    * does. (Ties round toward +inf here rather than away from zero; parity
    * holds because both engines use the identical expression.)
    */
  def micros(c: Column): Column = floor(c * Scale + lit(0.5)).cast("long")

  /** Order-independent exact sum of a double expression, as a double. */
  def exactSum(c: Column): Column = sum(micros(c)) / Scale

  /** Order-independent exact average of a double expression. */
  def exactAvg(c: Column): Column = (sum(micros(c)) / Scale) / count(lit(1))

  /** DuckDB-side equivalents, for building oracle SQL strings. */
  def sqlMicros(e: String): String =
    s"CAST(floor(($e) * 1000000.0 + 0.5) AS BIGINT)"
  def sqlExactSum(e: String): String = s"(sum(${sqlMicros(e)}) / 1000000.0)"
  def sqlExactAvg(e: String): String =
    s"((sum(${sqlMicros(e)}) / 1000000.0) / count(*))"
}
