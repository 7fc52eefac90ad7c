package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded-heap top-k aggregate: `top_k_pairs(ord, payload, k)` keeps the
  * k largest (ord: double, payload: long) pairs per group.
  *
  * The scalable alternative to `row_number() OVER (PARTITION BY g ORDER
  * BY ord)` + filter: the window form SORTS every group in full (O(n log
  * n) and a full shuffle of all rows); this aggregate keeps a k-element
  * min-heap per group, combines map-side (partial aggregation), and
  * shuffles at most k rows per group per partition — top-k over 100 TB
  * moves k·|groups|·|partitions| rows instead of everything.
  *
  * Output: array<struct<ord double, payload bigint>> sorted descending
  * by ord, ties broken by ascending payload (deterministic).
  */
case class TopKPairs(
    ordExpr: Expression,
    payloadExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPairs.Buf] {

  override def children: Seq[Expression] = Seq(ordExpr, payloadExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(TopKPairs.entryType, containsNull = false)

  override def createAggregationBuffer(): TopKPairs.Buf = new TopKPairs.Buf(k)

  override def update(buf: TopKPairs.Buf, input: InternalRow): TopKPairs.Buf = {
    val o = ordExpr.eval(input)
    val p = payloadExpr.eval(input)
    if (o != null && p != null)
      buf.add(o.asInstanceOf[Double], p.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKPairs.Buf, b: TopKPairs.Buf): TopKPairs.Buf = {
    b.foreach(a.add)
    a
  }

  override def eval(buf: TopKPairs.Buf): Any = {
    val sorted = buf.toArray.sortBy { case (o, p) => (-o, p) }
    new GenericArrayData(sorted.map { case (o, p) => InternalRow(o, p) })
  }

  override def serialize(buf: TopKPairs.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val arr = buf.toArray
    out.writeInt(arr.length)
    arr.foreach { case (o, p) => out.writeDouble(o); out.writeLong(p) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKPairs.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKPairs.Buf(k)
    val n = in.readInt()
    (0 until n).foreach(_ => buf.add(in.readDouble(), in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKPairs = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPairs = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKPairs =
    copy(ordExpr = c(0), payloadExpr = c(1))
  override def prettyName: String = "top_k_pairs"
}

object TopKPairs {
  val entryType: StructType = StructType(Seq(
    StructField("ord", DoubleType, nullable = false),
    StructField("payload", LongType, nullable = false)))

  /** k-bounded min-heap over (ord, payload); eviction order matches the
    * output order (smallest ord / largest payload evicted first). */
  final class Buf(k: Int) {
    // max-heap under "worseness": head = worst kept element (smallest
    // ord; among equal ord, largest payload), so head is what a better
    // incoming element displaces
    private val worstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }
    private val heap = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](worstFirst)
    def add(o: Double, p: Long): Unit = add((o, p))
    def add(e: (Double, Long)): Unit = {
      if (heap.size < k) heap.enqueue(e)
      else {
        val worst = heap.head
        // keep e if it beats the current worst (higher ord, or equal ord
        // with smaller payload)
        if (e._1 > worst._1 || (e._1 == worst._1 && e._2 < worst._2)) {
          heap.dequeue(); heap.enqueue(e)
        }
      }
    }
    def foreach(f: ((Double, Long)) => Unit): Unit = heap.foreach(f)
    def toArray: Array[(Double, Long)] = heap.toArray
  }
}
