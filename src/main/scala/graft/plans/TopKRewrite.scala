package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.GraftCollectTopK
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Generate, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the row-number-top-k window pattern
  *
  * {{{ Filter(rn <= k, Window(rn := row_number() over (PARTITION BY p ORDER BY o), child)) }}}
  *
  * into a bounded-heap aggregate
  *
  * {{{ Project(child.* , rn := pos + 1,
  *       Generate(posexplode(sort_array(topk)),
  *         Aggregate(p, collect_top_k(struct(o, struct(child.*)), k), child))) }}}
  *
  * Why: the window form shuffles EVERY input row to its group's reducer
  * and sorts whole groups for a k-row answer; even with Spark's
  * WindowGroupLimit pruning it still locally sorts full partitions. The
  * aggregate form keeps a k-element heap per group per map task — the
  * shuffle carries at most k rows per group per partition and nothing is
  * ever fully sorted. At 100 TB this is the difference between moving the
  * dataset and moving k·partitions rows.
  *
  * Semantics: identical row set; rank ties break arbitrarily, exactly as
  * row_number's own tie order does. Conservative matching — single
  * row_number window expression, plain attribute grouping keys, uniform
  * sort direction with default null ordering, literal bound — anything
  * else keeps the window plan. Disable with
  * `spark.graft.rewriteWindowTopK=false`.
  *
  * Installed by graft.functions.GraftExtensions (injectOptimizerRule);
  * the oracle suite runs THROUGH it (Verify/Bench sessions install the
  * extension), so every window-top-k query's hash gate also gates this
  * rewrite.
  */
object RewriteWindowTopK extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString("spark.graft.rewriteWindowTopK", "true") != "true") plan
    else plan.transformUp {
      case f @ Filter(cond, w: Window) =>
        rewrite(cond, w).getOrElse(f)
      // pass-through projections between the filter and the window (the
      // analyzer emits them for withColumn; the optimizer usually
      // collapses them first, but don't depend on rule order)
      case f @ Filter(cond, p @ Project(projList, w: Window))
          if projList.forall(_.isInstanceOf[Attribute]) =>
        rewrite(cond, w).map(Project(projList, _)).getOrElse(f)
      case f @ Filter(cond, p1 @ Project(l1, p2 @ Project(l2, w: Window)))
          if l1.forall(_.isInstanceOf[Attribute]) && l2.forall(_.isInstanceOf[Attribute]) =>
        rewrite(cond, w).map(r => Project(l1, Project(l2, r))).getOrElse(f)
    }
  }

  /** k such that cond ⇔ rn <= k, for a literal bound. */
  private def bound(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rn) && k == 1 => Some(1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute) if a.semanticEquals(rn) => Some(k)
    case GreaterThan(Literal(k: Int, IntegerType), a: Attribute) if a.semanticEquals(rn) => Some(k - 1)
    case _ => None
  }

  private def rewrite(cond: Expression, w: Window): Option[LogicalPlan] = {
    val (rnAlias, spec) = w.windowExpressions match {
      case Seq(al @ Alias(WindowExpression(RowNumber(), s: WindowSpecDefinition), _)) => (al, s)
      case _ => return None
    }
    val rnAttr = rnAlias.toAttribute
    val k = bound(cond, rnAttr).getOrElse(return None)
    if (k < 1) return None
    val order = spec.orderSpec
    if (order.isEmpty) return None
    // per-key default null ordering only (asc→nulls first, desc→nulls
    // last) — explicit overrides keep the window plan
    if (!order.forall(o => o.nullOrdering == o.direction.defaultNullOrdering))
      return None
    val directions = order.map(_.direction == Ascending)
    val uniform = directions.distinct.size == 1
    // grouping keys must be plain attributes so they pass through the
    // aggregate with their original exprIds
    val partAttrs = spec.partitionSpec.map {
      case a: Attribute => a
      case _ => return None
    }
    val child = w.child

    // aggregate: per group, bounded heap of struct(orderKeys..., payload)
    val payload = CreateStruct(child.output)
    val item = CreateStruct(order.map(_.child) :+ payload)
    val aggFunc =
      if (uniform)
        // built-in CollectTopK handles uniform orderings; reverse = false
        // keeps the LARGEST items (TopKSpec pins the orientation), so
        // ascending row_number wants reverse = true
        GraftCollectTopK(item, k, reverse = directions.head)
      else
        // mixed directions need the comparator-owning aggregate
        graft.functions.TopKOrdered(item, k, directions)
    val topkAlias = Alias(aggFunc.toAggregateExpression(), "__graft_topk")()
    val agg = Aggregate(partAttrs, partAttrs :+ topkAlias, child)

    // explode in rank order: CollectTopK's array is heap-ordered so sort
    // it (ascending iff the ranking is); TopKOrdered evals already sorted
    val sorted =
      if (uniform) SortArray(topkAlias.toAttribute, Literal(directions.head))
      else topkAlias.toAttribute
    val generator = PosExplode(sorted)
    val genOutput = generator.elementSchema.map(f =>
      AttributeReference(f.name, f.dataType, f.nullable)())
    val gen = Generate(generator,
      unrequiredChildIndex = Seq(partAttrs.size), // the raw array column
      outer = false, qualifier = None, generatorOutput = genOutput, child = agg)
    val posAttr = genOutput.head
    val itemAttr = genOutput(1)

    // unpack the payload, pinning the ORIGINAL exprIds so every operator
    // above the filter keeps resolving; grouping attrs pass straight through
    val partSet = AttributeSet(partAttrs)
    val payloadField = GetStructField(itemAttr, order.size)
    val childProjs: Seq[NamedExpression] = child.output.zipWithIndex.map {
      case (a, _) if partSet.contains(a) => a
      case (a, i) =>
        Alias(GetStructField(payloadField, i, Some(a.name)), a.name)(
          exprId = a.exprId, qualifier = a.qualifier)
    }
    val rnProj = Alias(Add(posAttr, Literal(1)), rnAttr.name)(
      exprId = rnAttr.exprId, qualifier = rnAttr.qualifier)
    Some(Project(childProjs :+ rnProj, gen))
  }
}
