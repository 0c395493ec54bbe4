package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleaving for MULTI-dimensional clustering
  * (Delta's OPTIMIZE ZORDER BY): a 1-D `clusterBy` sorts each bucket
  * linearly, so only the FIRST column's file ranges are narrow — a range
  * read on any other column still opens every file. Sorting by the
  * Z-value instead interleaves the bits of two dimensions, giving every
  * indexed column locality: each file covers a small rectangle of the
  * (a, b) space, so per-file min/max stats prune range reads on EITHER
  * column. Codegen'd (static call, no boxing) like the other kernels in
  * this package.
  */
object ZOrder {

  /** Spread the low 32 bits of `x` to the even bit positions. */
  def spread(x0: Long): Long = {
    var x = x0 & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** The full 128-bit Morton code of two 64-bit inputs is the PAIR
    * (high, low): `high` interleaves the top 32 bits of each input,
    * `low` the bottom 32, and lexicographic (high, low) order equals
    * true Z-order over the complete values — no normalization or
    * range assumption (small ints live entirely in `low`; epoch micros
    * span both halves). Each half is sign-flipped so SIGNED long
    * comparison follows unsigned bit order.
    */
  def interleave2High(a: Long, b: Long): Long = {
    val ua = (a ^ Long.MinValue) >>> 32 // unsigned order, top 32 bits
    val ub = (b ^ Long.MinValue) >>> 32
    ((spread(ua) << 1) | spread(ub)) ^ Long.MinValue
  }

  def interleave2Low(a: Long, b: Long): Long = {
    val la = a & 0xFFFFFFFFL // low halves: sign bit already in High
    val lb = b & 0xFFFFFFFFL
    ((spread(la) << 1) | spread(lb)) ^ Long.MinValue
  }

  /** One half of the Z-value of two long columns (cast/normalize
    * upstream — see [[zorder2]]).
    */
  case class ZOrder2Part(left: Expression, right: Expression, high: Boolean)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    private val fn = if (high) "interleave2High" else "interleave2Low"
    override def nullSafeEval(a: Any, b: Any): Any =
      if (high) interleave2High(a.asInstanceOf[Long], b.asInstanceOf[Long])
      else interleave2Low(a.asInstanceOf[Long], b.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.ZOrder.$fn($a, $b)")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  /** Column wrappers: sort by BOTH, in order, for true Z-order. Callers
    * normalize non-long inputs first (dates via `unix_date`, timestamps
    * via an epoch cast) — [[graft.sources.MergeWriter]]'s cluster-sort
    * path does this from the table schema.
    */
  def zorder2(a: Column, b: Column): Seq[Column] = {
    import org.apache.spark.sql.GraftColumnShim.{column, expression}
    Seq(column(ZOrder2Part(expression(a), expression(b), high = true)),
      column(ZOrder2Part(expression(a), expression(b), high = false)))
  }
}
