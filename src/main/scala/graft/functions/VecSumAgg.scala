package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise sum of array<double> rows: `vec_sum(v)`.
  *
  * The centroid-update primitive for distributed k-means: partial sums
  * combine map-side, so a groupBy(cluster).agg(vec_sum(v), count(*))
  * shuffles ONE length-d array per cluster per partition instead of
  * N×d exploded (cluster, pos, val) rows — the shape that makes Lloyd
  * iterations scan-bound at 100 TB. Rows of differing length are
  * summed over the common prefix with the longer tail carried
  * (mirrors CosineSim's min-length fold); empty groups yield an empty
  * array.
  */
case class VecSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSum.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): VecSum.Buf = new VecSum.Buf

  override def update(buf: VecSum.Buf, input: InternalRow): VecSum.Buf = {
    val a = child.eval(input)
    if (a != null) {
      val arr = a.asInstanceOf[ArrayData]
      buf.add(arr.toDoubleArray())
    }
    buf
  }

  override def merge(a: VecSum.Buf, b: VecSum.Buf): VecSum.Buf = {
    if (b.sums != null) a.add(b.sums)
    a
  }

  override def eval(buf: VecSum.Buf): Any =
    new GenericArrayData(if (buf.sums == null) Array.empty[Double] else buf.sums)

  override def serialize(buf: VecSum.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val s = if (buf.sums == null) Array.empty[Double] else buf.sums
    out.writeInt(s.length)
    s.foreach(out.writeDouble)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecSum.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new VecSum.Buf
    val n = in.readInt()
    if (n > 0) buf.add(Array.fill(n)(in.readDouble()))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): VecSum = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecSum = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): VecSum =
    copy(child = c(0))
  override def prettyName: String = "vec_sum"
}

object VecSum {
  /** Growable element-wise accumulator (null until the first row). */
  final class Buf {
    var sums: Array[Double] = null
    def add(v: Array[Double]): Unit = {
      if (sums == null) sums = v.clone()
      else {
        if (v.length > sums.length) {
          val grown = java.util.Arrays.copyOf(sums, v.length)
          sums = grown
        }
        var i = 0
        while (i < v.length) { sums(i) += v(i); i += 1 }
      }
    }
  }
}
