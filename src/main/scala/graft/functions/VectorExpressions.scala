package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity over array<double>.
  *
  * Replaces the `aggregate(zip_with(...))` fold in the similarity
  * operators' hot path: one fused loop computes dot, |a|² and |b|² in a
  * single pass, and `doGenCode` emits straight-line Java that stays
  * inside whole-stage codegen (the higher-order-function fold allocates
  * lambda frames per element; this does not). Accumulation order is
  * element-sequential — identical to both the fold and DuckDB's
  * list_dot_product — so oracle results are bit-identical.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  // callers pass array<double> (see Similarity.emb's explicit cast)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** Native dot product over array<double> — CosineSim minus the
  * normalization. The L2 k-means / product-quantization primitives rank
  * by 2·(x·c) − (c·c) (argmin squared distance with the x·x term
  * dropped — it is constant per row), so a raw fused-loop dot is the
  * kernel. Accumulation order is element-sequential, identical to
  * DuckDB's list_dot_product, keeping oracle doubles bit-identical. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $dot += $a.getDouble($i) * $b.getDouble($i); }
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** Random-hyperplane LSH bucket of an array<double> vector: bit j of the
  * result is the sign of the dot product with deterministic pseudo-random
  * hyperplane j. The plane matrix is md5-derived (±1 components), baked
  * into the expression via a codegen reference object — a tight Java
  * loop instead of the 512-term folded SQL expression it replaces.
  */
case class LshBucket(child: Expression, numPlanes: Int, dims: Int, seed: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "lsh_bucket"

  @transient lazy val planes: Array[Array[Double]] = LshBucket.planes(numPlanes, dims, seed)

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = math.min(dims, v.numElements())
    var bucket = 0
    var j = 0
    while (j < numPlanes) {
      var dot = 0.0
      var d = 0
      while (d < n) { dot += v.getDouble(d) * planes(j)(d); d += 1 }
      if (dot > 0) bucket |= (1 << j)
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val p = ctx.addReferenceObj("planes", planes, "double[][]")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val dot = ctx.freshName("dot")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $n = java.lang.Math.min($dims, $a.numElements());
         |int $bucket = 0;
         |for (int $j = 0; $j < $numPlanes; $j++) {
         |  double $dot = 0.0;
         |  for (int $d = 0; $d < $n; $d++) { $dot += $a.getDouble($d) * $p[$j][$d]; }
         |  if ($dot > 0) $bucket |= (1 << $j);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): LshBucket = copy(child = c)
}

/** Dense matrix–vector product y = M·v over array<double> — the OPQ
  * rotation kernel. The matrix is MODEL-sized (d×d, learned driver-side
  * via Procrustes) and is baked into the expression instance — shipped
  * once per task via a codegen reference object like [[LshBucket]]'s
  * plane matrix, never joined or shuffled. Codegen calls the same
  * static kernel the interpreted path uses: one tight nested loop, no
  * per-element lambda frames (the `transform(sequence(...))` higher-
  * order form this replaces allocates one closure frame per output
  * element). Exposed per-session under a closure-registered function
  * name (the matrix rides the builder closure, not the SQL text). */
case class MatVec(matrix: Array[Array[Double]], child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "mat_vec"

  override def nullSafeEval(a: Any): Any =
    MatVec.multiply(matrix, a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("matrix", matrix, "double[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MatVec$$.MODULE$$.multiply($m, $a);")
  }

  override protected def withNewChildInternal(c: Expression): MatVec = copy(child = c)
}

object MatVec {
  def multiply(m: Array[Array[Double]], v: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val out = new Array[Double](m.length)
    var i = 0
    while (i < m.length) {
      val r = m(i)
      val n = math.min(r.length, v.numElements())
      var s = 0.0
      var j = 0
      while (j < n) { s += r(j) * v.getDouble(j); j += 1 }
      out(i) = s
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Register `name(v)` = M·v on the session — the matrix is captured
    * in the builder CLOSURE (SQL text stays tiny; no 4096-double
    * literal to parse). Idempotent per (session, name). */
  def registerRotation(spark: SparkSession, name: String,
                       matrix: Array[Array[Double]]): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => MatVec(matrix, VectorExpressions.toDoubleArray(exprs.head)),
      "built-in")
}

/** Multiprobe probe-bucket set for random-hyperplane LSH (Lv et al.,
  * VLDB'07 — query-directed probing restricted to single-bit flips):
  * the [[LshBucket]] base bucket plus the `nprobe` buckets reached by
  * flipping the bits whose hyperplane margin |v·wⱼ| is SMALLEST (ties
  * by bit index ascending) — exactly the buckets a near-miss neighbor
  * most likely hashed into. Query-side only: the corpus is still
  * hashed once per table, so recall rises at ZERO extra tables and
  * zero extra corpus shuffle; only the (tiny) query side fans out
  * 1+nprobe rows per table. Margins accumulate element-sequentially,
  * so a SQL oracle ranking DuckDB's list_dot_product margins makes
  * the identical flip choices bit-for-bit. */
case class LshProbes(child: Expression, numPlanes: Int, dims: Int,
                     seed: Int, nprobe: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "lsh_probes"

  @transient lazy val planes: Array[Array[Double]] = LshBucket.planes(numPlanes, dims, seed)

  override def nullSafeEval(a: Any): Any =
    LshProbes.probes(planes, a.asInstanceOf[ArrayData], dims, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.LshProbes$$.MODULE$$.probes($p, $a, $dims, $nprobe);")
  }

  override protected def withNewChildInternal(c: Expression): LshProbes = copy(child = c)
}

object LshProbes {
  def probes(planes: Array[Array[Double]], v: ArrayData, dims: Int,
             nprobe: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val numPlanes = planes.length
    val n = math.min(dims, v.numElements())
    val margin = new Array[Double](numPlanes)
    var bucket = 0
    var j = 0
    while (j < numPlanes) {
      var dot = 0.0
      var d = 0
      while (d < n) { dot += v.getDouble(d) * planes(j)(d); d += 1 }
      if (dot > 0) bucket |= (1 << j)
      margin(j) = math.abs(dot)
      j += 1
    }
    val k = math.min(nprobe, numPlanes)
    val order = (0 until numPlanes).sortBy(j => (margin(j), j))
    val out = new Array[Int](1 + k)
    out(0) = bucket
    var i = 0
    while (i < k) { out(i + 1) = bucket ^ (1 << order(i)); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object LshBucket {
  /** ±1 plane components from md5("plane_<seed>_<j>_<d>") — the same
    * derivation a SQL oracle can reproduce with md5/substr/hex-cast. */
  def planes(numPlanes: Int, dims: Int, seed: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(numPlanes, dims) { (j, d) =>
      val hex = md.digest(s"plane_${seed}_${j}_$d".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16) % 2) * 2.0 - 1.0
    }
  }
}

object VectorExpressions {
  import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}

  /** Coerce a vector argument to array<double> at the builder so SQL
    * callers can pass the natural array<float> column directly — without
    * this, getDouble(i) over float-element ArrayData silently reads
    * garbage (UnsafeArrayData) or throws mid-job. */
  private def asDoubleArray(e: Expression): Expression = e.dataType match {
    case ArrayType(DoubleType, _) => e
    case _ => Cast(e, ArrayType(DoubleType))
  }

  /** [[asDoubleArray]] for builders outside this object (MatVec). */
  private[graft] def toDoubleArray(e: Expression): Expression = asDoubleArray(e)

  private[graft] def cosineBuilder(exprs: Seq[Expression]): Expression =
    CosineSim(asDoubleArray(exprs.head), asDoubleArray(exprs(1)))

  private[graft] def dotBuilder(exprs: Seq[Expression]): Expression =
    DotProduct(asDoubleArray(exprs.head), asDoubleArray(exprs(1)))

  private[graft] def lshBuilder(exprs: Seq[Expression]): Expression =
    LshBucket(asDoubleArray(exprs.head),
      exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int],
      if (exprs.length > 3) exprs(3).eval().asInstanceOf[Int] else 0)

  private[graft] def lshProbesBuilder(exprs: Seq[Expression]): Expression =
    LshProbes(asDoubleArray(exprs.head),
      exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int],
      exprs(3).eval().asInstanceOf[Int], exprs(4).eval().asInstanceOf[Int])

  private[graft] def vintPackBuilder(exprs: Seq[Expression]): Expression = {
    val arr = exprs.head.dataType match {
      case ArrayType(LongType, _) => exprs.head
      case _ => Cast(exprs.head, ArrayType(LongType))
    }
    VIntPack(arr)
  }

  private[graft] def vintUnpackBuilder(exprs: Seq[Expression]): Expression = {
    // coerce at the builder so a non-binary argument either casts
    // cleanly or fails analysis — never a codegen ClassCastException
    val bin = exprs.head.dataType match {
      case BinaryType => exprs.head
      case _ => Cast(exprs.head, BinaryType)
    }
    VIntUnpack(bin)
  }

  private[graft] def vecSumBuilder(exprs: Seq[Expression]): Expression =
    VecSum(asDoubleArray(exprs.head))

  private[graft] def commonPrefixBuilder(exprs: Seq[Expression]): Expression = {
    def asString(e: Expression): Expression = e.dataType match {
      case StringType => e
      case _ => Cast(e, StringType)
    }
    CommonPrefixLength(asString(exprs.head), asString(exprs(1)))
  }

  private[graft] def topKBuilder(exprs: Seq[Expression]): Expression = {
    val ord = if (exprs(0).dataType == DoubleType) exprs(0) else Cast(exprs(0), DoubleType)
    val payload = if (exprs(1).dataType == LongType) exprs(1) else Cast(exprs(1), LongType)
    TopKPairs(ord, payload, exprs(2).eval().asInstanceOf[Int])
  }

  private[graft] def kminBuilder(exprs: Seq[Expression]): Expression = {
    val arr = exprs(0).dataType match {
      case ArrayType(LongType, _) => exprs(0)
      case _ => Cast(exprs(0), ArrayType(LongType))
    }
    KMinDistinct(arr, exprs(1).eval().asInstanceOf[Int])
  }

  /** Idempotently register graft's native functions on a session so
    * plans can reference them via `expr("cosine_sim(a, b)")` / SQL. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", cosineBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", dotBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lsh_bucket", lshBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lsh_probes", lshProbesBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "top_k_pairs", topKBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmin_distinct", kminBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_sum", vecSumBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vint_pack", vintPackBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vint_unpack", vintUnpackBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "common_prefix_length", commonPrefixBuilder, "built-in")
  }
}
