package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst predicate `bf.mightContainLong(child)` over a
  * BROADCAST Bloom filter — the guide §3.2 "reduce the big side before
  * shuffling it" probe, kept inside whole-stage codegen (the guide's
  * own example uses a Python UDF; this repo's hot paths are UDF-free).
  *
  * The expression serializes only the Broadcast HANDLE (bytes, not the
  * filter): a multi-GB-graph filter ships to each executor once via
  * TorrentBroadcast instead of riding every task closure the way a
  * codegen reference object would. False positives cost only the
  * shuffle bytes they fail to drop; the exact join downstream decides
  * membership, so the query result is INDEPENDENT of the filter — any
  * fpp, any insertion order, even a corrupt filter changes bytes
  * moved, never rows returned (TriangleBloomSpec asserts the count
  * equality both ways).
  */
case class BloomMightContain(bf: Broadcast[BloomFilter], child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(a: Any): Any =
    bf.value.mightContainLong(a.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("bfb", bf, classOf[Broadcast[BloomFilter]].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = ((org.apache.spark.util.sketch.BloomFilter) $b.value()).mightContainLong($a);")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}

object BloomProbe {
  /** Register `name(h)` = mightContainLong(h) on the session, the
    * MatVec closure-registration pattern (the broadcast handle rides
    * the builder closure; SQL text stays tiny). Idempotent per
    * (session, name). */
  def register(spark: SparkSession, name: String,
               bf: Broadcast[BloomFilter]): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => BloomMightContain(bf, exprs.head),
      "built-in")
}
