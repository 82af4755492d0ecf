package org.apache.spark.sql.graft

import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.internal.connector.PredicateUtils
import org.apache.spark.sql.sources.Filter

/** Access bridge to Spark's own V2→V1 predicate conversion.
  *
  * `PredicateUtils.toV1` is `private[sql]` — public bytecode, sealed
  * Scala signature — so a DSv2 connector that implements
  * [[org.apache.spark.sql.connector.read.SupportsPushDownV2Filters]]
  * and wants to reuse its existing V1 `Filter` machinery has two
  * choices: re-implement the conversion (and risk drifting from
  * Spark's literal-conversion semantics — catalyst-internal values
  * like UTF8String/epoch-days must convert to the external types V1
  * filters carry), or bridge into the `org.apache.spark.sql` package
  * the way Spark's own ecosystem connectors do. This object is that
  * bridge and nothing else: one forwarding method, no state, no
  * behavior. */
object PredicateBridge {
  def toV1(p: Predicate): Option[Filter] = PredicateUtils.toV1(p)
}
