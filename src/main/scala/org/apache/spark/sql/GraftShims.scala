package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` helpers so graft's custom Catalyst expressions
  * can be wrapped as user-facing `Column`s (Spark 4 moved the
  * Expression<->Column constructors behind the classic module).
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Whether `df`'s plan is currently registered in the session's
    * CacheManager — lets a memoized handle to a persisted result detect
    * eviction (`unpersist()` / `clearCache()`) and recompute instead of
    * handing out a dead reference (checkpoint-lineage results cannot be
    * lazily rebuilt once evicted).
    */
  def isCached(df: Dataset[_]): Boolean = df match {
    case d: classic.Dataset[_] =>
      d.sparkSession.sharedState.cacheManager.lookupCachedData(d).isDefined
    case _ => false
  }
}
