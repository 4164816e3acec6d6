package org.apache.spark.sql.vps

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column<->Expression conversion `private[sql]`; this shim (in an
  * org.apache.spark.sql subpackage) re-exposes it for our expression wrappers.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** `AbstractDataType` is `private[sql]`, so expressions outside the spark.sql
  * package cannot declare `ExpectsInputTypes.inputTypes` directly; this trait
  * (living in the shim package) lets them state expected input types with
  * public `DataType`s and still get the analyzer's implicit casts — which is
  * what makes `SELECT st_point(12.5, ...)` coerce the Decimal literal instead
  * of blowing up at eval time.
  */
trait VpsImplicitCasts extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  self: org.apache.spark.sql.catalyst.expressions.Expression =>
  protected def coerceTo: Seq[org.apache.spark.sql.types.DataType]
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] = coerceTo
}
