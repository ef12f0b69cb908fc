package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for graft's broadcast-carrying expressions.
  *
  * Spark 4 moved the classic Column-from-Expression constructor behind
  * `private[sql]` (`classic.ExpressionUtils`); every expression a USER
  * constructs is supposed to arrive via the function registry. That path
  * works for value arguments only — [[graft.plans.SetMemberCountBc]]
  * must carry a `Broadcast` HANDLE, which no Column argument can smuggle
  * through a registry builder. This one-hop shim (the standard pattern
  * for libraries extending Catalyst) re-exports exactly the two
  * conversions, nothing else.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
