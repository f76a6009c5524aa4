package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the §2.12(c) whole-operator path: a custom
  * [[LogicalPlan]] node, a [[SparkStrategy]], and a sort-merge
  * [[SparkPlan]], registered through SparkSessionExtensions.
  *
  * The composed form ([[graft.ops.TemporalJoins.asofJoin]]: union both
  * sides + one ignore-nulls window) is the right shape when only
  * DataFrame operators are allowed — one exchange on the key, zero
  * blow-up. Its cost is structural, not accidental: the union forces
  * BOTH sides through one sort with every column of either side padded
  * with nulls on the other (a (|L|+|R|) × (wL+wR) sort buffer), and the
  * window engine buffers frames generically. This operator is what the
  * semantics actually need: shuffle each side on its OWN key, sort each
  * side (key, time) independently, then a single forward-only merge per
  * partition holding ONE buffered right row — no padded union, no
  * window state, rows stream through untouched.
  *
  * Semantics (= DuckDB `ASOF LEFT JOIN ON l.k = r.k AND l.t >= r.t`):
  * every left row is emitted once, joined to the LATEST right row with
  * the same key and time at-or-before (strictly-before when `strict`)
  * the left time; right columns are null when nothing precedes. Among
  * equal (key, time) right rows the last in sort order wins — callers
  * wanting determinism pre-aggregate to unique (key, time), as
  * `j_asof_last_view` does.
  *
  * At 100 TB: one hash exchange per side (skew-splittable, AQE-visible),
  * per-partition merge is O(|L| + |R|) with O(1) state — the same plan a
  * purpose-built time-series engine runs. The oracle twin
  * (`j_asof_native`) hash-gates it against DuckDB's native ASOF JOIN end
  * to end; a parity spec pins it row-for-row to the composed operator on
  * adversarial fixtures (null keys, null times, ties, strict mode).
  */
object AsOfJoinPlan {

  /** Logical node: left/right resolved children, key attributes per
    * side, one time attribute per side. Output = left columns then right
    * columns (right side forced nullable — it's a LEFT join). */
  case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
                      leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                      leftTime: Expression, rightTime: Expression,
                      strict: Boolean)
      extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
      copy(left = newLeft, right = newRight)
  }

  /** Planner strategy: one physical candidate, children planned later. */
  object Strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoin(l, r, lk, rk, lt, rt, strict) =>
        AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, strict) :: Nil
      case _ => Nil
    }
  }

  /** Sort-merge as-of join: requires each side clustered by its key and
    * sorted (key, time) — EnsureRequirements inserts the exchanges/sorts,
    * AQE sees ordinary shuffles. Per partition: advance a single right
    * cursor monotonically, holding the latest candidate row per key. */
  case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                          leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                          leftTime: Expression, rightTime: Expression,
                          strict: Boolean)
      extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      (leftKeys :+ leftTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)),
      (rightKeys :+ rightTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)))

    override def outputPartitioning: Partitioning = left.outputPartitioning

    override def outputOrdering: Seq[SortOrder] =
      (leftKeys :+ leftTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending))

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)

    override protected def doExecute(): RDD[InternalRow] = {
      val keyTypes = leftKeys.map(_.dataType)
      val timeType = leftTime.dataType
      val lOut = left.output
      val rOut = right.output
      val lKeys = leftKeys; val rKeys = rightKeys
      val lTime = leftTime; val rTime = rightTime
      val strictL = strict
      val outAttrs = output
      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val lKeyProj = UnsafeProjection.create(lKeys, lOut)
        val rKeyProj = UnsafeProjection.create(rKeys, rOut)
        val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
        val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
        val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
        // bind against the NULLABLE right attributes: binding to the
        // child's original (possibly non-null) attrs compiles away the
        // null check and a no-match row would read zeros, not nulls
        val resultProj = UnsafeProjection.create(outAttrs,
          lOut ++ rOut.map(_.withNullability(true)))
        val nullRight = new GenericInternalRow(rOut.length)
        val joined = new JoinedRow

        new Iterator[InternalRow] {
          private var rCur: InternalRow = advanceRight()
          private var held: InternalRow = null     // latest candidate row
          private var heldKey: UnsafeRow = null    // its key (copied)

          private def advanceRight(): InternalRow = {
            while (rIter.hasNext) {
              val r = rIter.next()
              // null keys/times never participate (SQL join semantics)
              if (!rKeyProj(r).anyNull && !rTimeProj(r).isNullAt(0)) return r
            }
            null
          }

          override def hasNext: Boolean = lIter.hasNext

          override def next(): InternalRow = {
            val l = lIter.next()
            val lk = lKeyProj(l)
            val ltRow = lTimeProj(l)
            if (lk.anyNull || ltRow.isNullAt(0))
              return resultProj(joined(l, nullRight))
            val lt = ltRow.copy() // rTimeProj below must not clobber it
            var done = false
            while (!done && rCur != null) {
              val rk = rKeyProj(rCur)
              val c = keyOrd.compare(rk, lk)
              if (c < 0) rCur = advanceRight() // stale key: can never match
              else if (c == 0) {
                val tc = timeOrd.compare(rTimeProj(rCur), lt)
                if (tc < 0 || (!strictL && tc == 0)) {
                  held = rCur.copy()
                  heldKey = rk.copy()
                  rCur = advanceRight()
                } else done = true
              } else done = true
            }
            val m =
              if (held != null && keyOrd.compare(heldKey, lk) == 0) held
              else nullRight
            resultProj(joined(l, m))
          }
        }
      }
    }
  }

  /** Ensure the strategy is installed on this session (idempotent; also
    * injected session-wide by GraftExtensions). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(Strategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ Strategy

  /** DataFrame-level builder: as-of left join `left` to `right` on
    * `leftKeys == rightKeys` with `rightTs` at-or-before (`strict`:
    * strictly before) `leftTs`. Right columns keep their names —
    * pre-rename collisions on the right side (the builder asserts
    * disjointness so the output is unambiguous). */
  def asofJoinNative(left: DataFrame, right: DataFrame,
                     leftKeys: Seq[String], rightKeys: Seq[String],
                     leftTs: String, rightTs: String,
                     strict: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name)}"))
    val overlap = right.columns.toSet.intersect(left.columns.toSet)
    require(overlap.isEmpty,
      s"rename right-side columns before the native as-of join: $overlap")
    GraftSqlBridge.ofRows(spark,
      AsOfJoin(lPlan, rPlan,
        leftKeys.map(attr(lPlan, _)), rightKeys.map(attr(rPlan, _)),
        attr(lPlan, leftTs), attr(rPlan, rightTs), strict))
  }
}
