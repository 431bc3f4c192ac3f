package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access shim: Spark's bounded-heap top-k aggregate (`CollectTopK`,
  * catalyst collect.scala) is `private[aggregate]`; graft's bounded
  * per-group ranking (`graft.ext.Similarity.rankTopK` via
  * `graftfn.VectorFunctions.collect_top_k`) constructs it through this
  * object. No behavior is added — this exists only to open the
  * constructor to the graftfn function registry.
  */
object GraftCollectTopK {
  def apply(child: Expression, num: Int, reverse: Boolean): AggregateFunction =
    CollectTopK(child, num, reverse)
}
