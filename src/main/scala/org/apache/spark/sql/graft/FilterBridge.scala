package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.DataSourceStrategy
import org.apache.spark.sql.sources.Filter

/** The `private[sql]` catalyst→v1-filter bridge, exposed for the graft
  * catalog's manifest pruning: translating pushed-down conjuncts through
  * Spark's OWN translation (the one every file source uses) means the
  * manifest probes see exactly the predicates the parquet footers see —
  * no second, subtly-different predicate grammar to maintain. */
object FilterBridge {

  /** Catalyst conjunct → v1 filter; None for anything untranslatable
    * (which the caller must treat as "prune nothing"). */
  def translate(e: Expression): Option[Filter] =
    DataSourceStrategy.translateFilter(e, supportNestedPredicatePushdown = true)
}
