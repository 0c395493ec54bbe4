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

  /** Word `word` (0-based, most significant first) of the full N·64-bit
    * Morton code of `vals`: the interleaved bit stream takes one bit
    * from each input in turn, MSB first — bit `i` of the stream comes
    * from input `i mod n`, bit `63 - i/n`. Inputs are sign-flipped on
    * the way in and each output word on the way out, so SIGNED
    * lexicographic comparison of the word sequence equals true Z-order
    * over the signed inputs — exact for arbitrary 64-bit values, any
    * dimension count (the N-ary generalization of
    * [[interleave2High]]/[[interleave2Low]]'s bit-twiddled 2-D pair).
    * A 64-step loop per word instead of the 2-D spread trick: this
    * runs on the WRITE/rewrite path only (layout, never query), where
    * ~N·64 simple ops per row is noise against the parquet encode.
    */
  def interleaveWord(vals: Array[Long], word: Int): Long = {
    val n = vals.length
    var out = 0L
    var i = 0
    while (i < 64) {
      val streamPos = word.toLong * 64 + i
      val src = (streamPos % n).toInt
      val bit = 63 - (streamPos / n).toInt
      val u = vals(src) ^ Long.MinValue
      out = (out << 1) | ((u >>> bit) & 1L)
      i += 1
    }
    out ^ Long.MinValue
  }

  /** One word of the N-dimensional Z-value — N long children, evaluated
    * null-intolerantly (any null input → null word, which sorts
    * together: nulls cluster into their own file range, same behavior
    * as the 2-D part). Codegen'd: a static call over a literal array
    * the JIT scalar-replaces.
    */
  case class ZOrderNPart(children: Seq[Expression], word: Int)
      extends Expression {
    require(children.size >= 2, "zorderN needs at least two columns")
    override def nullable: Boolean = children.exists(_.nullable)
    override def dataType: DataType = LongType

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow)
        : Any = {
      val vals = new Array[Long](children.size)
      var i = 0
      while (i < children.size) {
        val v = children(i).eval(input)
        if (v == null) return null
        vals(i) = v.asInstanceOf[Long]
        i += 1
      }
      interleaveWord(vals, word)
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val evals = children.map(_.genCode(ctx))
      val arr = ctx.freshName("zvals")
      val nullExpr =
        if (nullable) evals.map(_.isNull).mkString(" || ") else "false"
      ev.copy(code =
        code"""
           |${evals.map(_.code).mkString("\n")}
           |boolean ${ev.isNull} = $nullExpr;
           |long ${ev.value} = 0L;
           |if (!${ev.isNull}) {
           |  long[] $arr = new long[]{${evals.map(_.value).mkString(", ")}};
           |  ${ev.value} = graft.functions.ZOrder.interleaveWord($arr, $word);
           |}
         """.stripMargin)
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(children = newChildren)
  }

  /** N-dimensional Z-order sort columns: the N words of the full Morton
    * code, in significance order. `n = 2` delegates to the bit-twiddled
    * [[zorder2]] (identical ordering, cheaper kernel).
    */
  def zorderN(cols: Seq[Column]): Seq[Column] = {
    import org.apache.spark.sql.GraftColumnShim.{column, expression}
    require(cols.size >= 2, "zorderN needs at least two columns")
    if (cols.size == 2) zorder2(cols(0), cols(1))
    else {
      val exprs = cols.map(expression)
      cols.indices.map(w => column(ZOrderNPart(exprs, w)))
    }
  }
}
