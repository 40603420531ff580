package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.{FieldReference, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.execution.datasources.DataSourceStrategy
import org.apache.spark.sql.internal.connector.PredicateUtils
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

  /** V2 runtime-filter predicate → v1 filter, through the same
    * `private[sql]` conversion BatchScanExec's peers use (values come
    * back as EXTERNAL Scala types — strings, not UTF8String — matching
    * what [[translate]] produces, so one probe grammar serves both the
    * static and the runtime pruning path). */
  def predicateToV1(p: Predicate): Option[Filter] = PredicateUtils.toV1(p)

  /** A top-level column reference, for advertising runtime-filterable
    * attributes (the `FieldReference` companion is `private[sql]`). */
  def fieldRef(name: String): NamedReference = FieldReference.column(name)
}
