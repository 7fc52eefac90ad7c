package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded k-minimum-values aggregate: `kmin_distinct(arr, k)` merges
  * array<bigint> inputs into the k smallest DISTINCT values per group,
  * ascending — the KMV sketch merge (set-union then k-min truncation)
  * as one native aggregate.
  *
  * The scalable alternative to collect_list → flatten → array_distinct
  * → array_sort → slice: that chain materializes every input array per
  * group before truncating (O(Σ|arr|) rows through the shuffle and a
  * full sort), where this buffer never exceeds k longs, combines
  * map-side, and ships ≤ k values per group per partition — exactly the
  * [[TopKPairs]] discipline, plus the DISTINCT semantics KMV needs
  * (duplicate values collapse instead of crowding the sketch).
  */
case class KMinDistinct(
    arrExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Long]] {

  override def children: Seq[Expression] = Seq(arrExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long]()

  private def add(buf: java.util.TreeSet[Long], x: Long): Unit =
    if (buf.size < k) { buf.add(x); () }
    else if (x < buf.last) { if (buf.add(x)) { buf.remove(buf.last); () } }

  override def update(buf: java.util.TreeSet[Long], input: InternalRow): java.util.TreeSet[Long] = {
    val a = arrExpr.eval(input)
    if (a != null) {
      val arr = a.asInstanceOf[ArrayData]
      var i = 0
      while (i < arr.numElements()) { add(buf, arr.getLong(i)); i += 1 }
    }
    buf
  }

  override def merge(a: java.util.TreeSet[Long], b: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    val it = b.iterator()
    while (it.hasNext) add(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new java.util.TreeSet[Long]()
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KMinDistinct = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KMinDistinct = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KMinDistinct =
    copy(arrExpr = c(0))
  override def prettyName: String = "kmin_distinct"
}
