package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/** Data-layout expressions: Z-order (Morton) interleaving for
  * multi-dimensional clustering. Sorting a table by the interleaved key
  * makes BOTH dimensions range-local within any contiguous slice — the
  * property that lets a 100 TB scan prune files on either predicate
  * column from parquet min/max footers, where a single-column sort only
  * prunes its own column. Native codegen'd expression (one static JVM
  * loop per row) for the same reason as [[HashImpl]]: the key is computed
  * corpus-wide in the write path.
  */
object LayoutImpl {
  /** Interleave the low 16 bits of x (even bit positions) and y (odd):
    * z = Σᵢ ((x>>i)&1)·2^(2i) + ((y>>i)&1)·2^(2i+1). Total order over the
    * 32-bit Morton curve of (x mod 2¹⁶, y mod 2¹⁶).
    */
  def interleave16(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}

/** `zorder16(x, y)` → bigint Morton key of the two low-16-bit values. */
case class ZOrder16(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder16"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two bigint inputs, got $other")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    LayoutImpl.interleave16(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.LayoutImpl.interleave16($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder16 =
    copy(left = newLeft, right = newRight)
}

object LayoutExprs {
  def zorder16(x: Column, y: Column): Column =
    ColumnShim.column(ZOrder16(ColumnShim.expression(x), ColumnShim.expression(y)))
}
