package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access bridge: [[CollectTopK]] (the bounded-heap top-k aggregate
  * behind Spark's pandas-API nlargest) is `private[aggregate]`, so the
  * graft top-k operator reaches it from inside the package. Only this
  * constructor is exposed; everything else stays internal.
  */
object GraftCollectTopK {
  def apply(child: Expression, num: Int, reverse: Boolean): AggregateFunction =
    CollectTopK(child, num, reverse)
}
