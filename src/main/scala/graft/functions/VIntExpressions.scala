package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Gap + LEB128-varint codec for sorted postings lists.
  *
  * Reference counterpart: a3/BuildInvertedIndexCompressed.java — VInt
  * gap-encoded postings in a MapFile. Here the ENCODING itself is a
  * pair of codegen-friendly Catalyst expressions over columnar data:
  * `vint_pack(sorted array<long>) → binary` stores the first id
  * absolute and every subsequent id as a varint-encoded gap (ascending
  * postings make gaps small, so most take 1 byte); `vint_unpack`
  * inverts it exactly. Parquet already applies general-purpose
  * encodings to flat postings; this is the explicit, per-row form for
  * payloads that must stay compact end-to-end (index shipping, network
  * hand-off).
  */
object VIntCodec extends Serializable {
  /** Encode an ascending non-negative long array (first absolute, then
    * gaps; LEB128, 7 bits per byte, high bit = continuation). */
  def pack(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val out = new java.io.ByteArrayOutputStream(math.max(16, n * 2))
    var prev = 0L
    var i = 0
    while (i < n) {
      // getLong on a null slot silently unboxes to 0 — that would
      // corrupt the encoding with no error, so reject nulls loudly
      if (a.isNullAt(i)) throw new IllegalArgumentException(
        s"vint_pack: null element at index $i")
      val v = a.getLong(i)
      var g = if (i == 0) v else v - prev
      if (g < 0) throw new IllegalArgumentException(
        "vint_pack requires a sorted non-negative array")
      prev = v
      while ((g & ~0x7FL) != 0L) { out.write(((g & 0x7FL) | 0x80L).toInt); g >>>= 7 }
      out.write(g.toInt)
      i += 1
    }
    out.toByteArray
  }

  def unpack(b: Array[Byte]): ArrayData = {
    val buf = scala.collection.mutable.ArrayBuilder.make[Long]
    var i = 0
    var prev = 0L
    var first = true
    while (i < b.length) {
      var shift = 0
      var g = 0L
      var more = true
      while (more) {
        if (i >= b.length) throw new IllegalArgumentException(
          "vint_unpack: truncated varint (continuation bit set at end of input)")
        val x = b(i); i += 1
        g |= (x & 0x7FL) << shift
        shift += 7
        more = (x & 0x80) != 0
      }
      prev = if (first) g else prev + g
      first = false
      buf += prev
    }
    new GenericArrayData(buf.result())
  }
}

case class VIntPack(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "vint_pack"

  override def nullSafeEval(a: Any): Any =
    VIntCodec.pack(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VIntCodec$$.MODULE$$.pack($a);")

  override protected def withNewChildInternal(c: Expression): VIntPack = copy(child = c)
}

case class VIntUnpack(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vint_unpack"

  override def nullSafeEval(a: Any): Any =
    VIntCodec.unpack(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VIntCodec$$.MODULE$$.unpack($a);")

  override protected def withNewChildInternal(c: Expression): VIntUnpack = copy(child = c)
}
