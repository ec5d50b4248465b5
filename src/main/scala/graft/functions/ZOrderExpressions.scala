package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleaving — the multi-column generalization of
  * the range-sorted layout (`Sources.writeRangeSorted`): sorting by the
  * interleaved bits of two columns clusters rows so that a range filter
  * on EITHER column maps to a bounded set of Z ranges, and parquet
  * footer min/max stats skip the rest. One clustered layout serves two
  * filter dimensions, where a plain sort serves one.
  *
  * The bit-spreading uses the public-domain magic-mask construction
  * (Stanford Bit Twiddling Hacks). [[ZValue]] interleaves the low 32
  * bits of each input (left column on even bits, right on odd);
  * callers that want equal weight per dimension should first scale
  * both inputs to a common bucket range — `Sources.writeZOrdered`
  * does min/max scaling to 16-bit buckets, so the Z value fits in 32
  * bits and both columns contribute alternating significant bits.
  */
object ZOrder {

  /** Spread the low 32 bits of x one position apart (into even bits). */
  def spread(x0: Long): Long = {
    var x = x0 & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8))  & 0x00ff00ff00ff00ffL
    x = (x | (x << 4))  & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2))  & 0x3333333333333333L
    x = (x | (x << 1))  & 0x5555555555555555L
    x
  }

  /** Morton code of (a, b): a's bits on even positions, b's on odd.
    * The full 64-bit code orders correctly only as UNSIGNED — b ≥ 2³¹
    * sets the sign bit. Layouts that sort the code with Spark's signed
    * long comparison must keep inputs below 2³¹ (writeZOrdered scales
    * to 16-bit buckets, so its codes stay in 32 bits). */
  def interleave(a: Long, b: Long): Long =
    spread(a) | (spread(b) << 1)

  def zvalue(a: Column, b: Column): Column =
    ColumnBridge.column(ZValue(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Children must be LongType (callers cast — `AbstractDataType` is
  * private[sql], so ExpectsInputTypes isn't available out here; same
  * contract as the other graft kernels). */
case class ZValue(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zvalue"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // ctx.freshName, not fixed names: two ZValue expressions in one
      // codegen scope (non-nullable inputs emit resultCode unbraced)
      // would otherwise declare duplicate locals and fail janino,
      // silently dropping the plan out of whole-stage codegen.
      val za = ctx.freshName("graftZa")
      val zb = ctx.freshName("graftZb")
      def spreadJava(in: String, out: String): String =
        s"""
           |long $out = $in & 0xffffffffL;
           |$out = ($out | ($out << 16)) & 0x0000ffff0000ffffL;
           |$out = ($out | ($out << 8))  & 0x00ff00ff00ff00ffL;
           |$out = ($out | ($out << 4))  & 0x0f0f0f0f0f0f0f0fL;
           |$out = ($out | ($out << 2))  & 0x3333333333333333L;
           |$out = ($out | ($out << 1))  & 0x5555555555555555L;
         """.stripMargin
      s"""
         |${spreadJava(a, za)}
         |${spreadJava(b, zb)}
         |${ev.value} = $za | ($zb << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZValue =
    copy(left = l, right = r)
}
