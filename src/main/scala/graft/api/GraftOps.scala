package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.HashingScheme._

/** Column-parameterized operator cores: the user-facing library surface.
  *
  * Every operator works on ANY DataFrame — callers name the id/text/
  * vector columns. `graft.operators.*` binds these to the driver's test
  * tables; a user of the engine imports `graft.api.implicits._` and
  * chains them on their own data:
  *
  * {{{
  * import graft.api.implicits._
  * corpus.dedupMinhashCandidates("doc_id", "text")
  * corpus.sessionize("user_id", "ts_us", gapUs = 30 * 60 * 1000000L)
  * vectors.cosineTopK("vec_id", "embedding", queries, k = 5)
  * }}}
  */
object GraftOps {

  /** (id, shingle) distinct pairs for n-gram shingling of a text column.
    * Docs shorter than n tokens yield no shingles (the CASE guard
    * matters: Spark's sequence(1, 0) is the DESCENDING [1, 0], not
    * empty, and would feed slice() an invalid 0 index). */
  def shingleSet(df: DataFrame, id: String, text: String, n: Int): DataFrame =
    df.select(col(id), split(col(text), " ").as("__toks"))
      .select(col(id), explode(expr(
        s"CASE WHEN size(__toks) >= $n THEN transform(sequence(1, size(__toks) - ${n - 1}), " +
        s"i -> array_join(slice(__toks, i, $n), ' ')) ELSE array() END")).as("sh"))
      .distinct()

  /** Exact dedup groups: content hash → (keep_id = min id, group size). */
  def dedupExact(df: DataFrame, id: String, content: String): DataFrame =
    df.groupBy(md5(col(content)).as("content_hash"))
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Exact n-gram Jaccard near-dup pairs at/above a threshold. Quadratic
    * in docs-per-shared-shingle — ground truth for the LSH tiers. */
  def ngramJaccardPairs(df: DataFrame, id: String, text: String,
                        n: Int = 3, threshold: Double = 0.5): DataFrame = {
    // consumed 3× (sizes + both join sides); materialized once
    val sh = shingleSet(df, id, text, n).localCheckpoint()
    val sizes = sh.groupBy(id).agg(count(lit(1)).as("sz"))
    sh.select(col(id).as("a"), col("sh"))
      .join(sh.select(col(id).as("b"), col("sh")), Seq("sh"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col(id).as("a"), col("sz").as("sza")), "a")
      .join(sizes.select(col(id).as("b"), col("sz").as("szb")), "b")
      .withColumn("jaccard",
        round(col("inter") / (col("sza") + col("szb") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  /** MinHash signature per id: NumHashes min-aggregated permutations of
    * the md5-derived shingle hashes, one groupBy pass. */
  def minhashSignatures(df: DataFrame, id: String, text: String, n: Int = 3): DataFrame = {
    val hashed = shingleSet(df, id, text, n)
      .select(col(id), graft.functions.TextFns.hash32(col("sh")).as("h"))
    val mins = (0 until NumHashes).map(i => expr(minhashExpr("h", i)).as(s"mh$i"))
    hashed.groupBy(id).agg(mins.head, mins.tail: _*)
  }

  /** MinHash+LSH near-dup candidate pairs with estimated Jaccard.
    * Shuffle volume is bands×|docs| — the at-scale dedup path. */
  def minhashCandidates(df: DataFrame, id: String, text: String, n: Int = 3): DataFrame = {
    // one row per doc, consumed 3× (banding + both pair-join sides):
    // materialize once rather than recompute the shingle pass each time
    val sigs = minhashSignatures(df, id, text, n).localCheckpoint()
    val bandCols = (0 until Bands).map { j =>
      val parts = (0 until RowsPerBand).map(r => s"mh${j * RowsPerBand + r}").mkString(", ")
      s"concat_ws('_', $parts) AS band$j"
    }
    val banded = sigs.selectExpr(Seq(id) ++ bandCols: _*)
    val cand = (0 until Bands).map { j =>
      banded.select(col(id), lit(j).as("bj"), col(s"band$j").as("bv"))
    }.reduce(_ unionAll _)
    val pairs = cand.select(col(id).as("a"), col("bj"), col("bv"))
      .join(cand.select(col(id).as("b"), col("bj"), col("bv")), Seq("bj", "bv"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    val matchSum = (0 until NumHashes)
      .map(i => s"CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    pairs.alias("p")
      .join(sigs.alias("sa"), col("p.a") === col(s"sa.$id"))
      .join(sigs.alias("sb"), col("p.b") === col(s"sb.$id"))
      .selectExpr("p.a AS a", "p.b AS b",
        s"round(($matchSum) / CAST($NumHashes AS DOUBLE), 6) AS est_jaccard")
  }

  /** SimHash signature per id: tf-weighted bit votes over token hashes. */
  def simhashSignatures(df: DataFrame, id: String, text: String): DataFrame = {
    val tf = df.select(col(id), explode(split(col(text), " ")).as("t"))
      .filter(col("t") =!= "")
      .groupBy(col(id), col("t"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("h", graft.functions.TextFns.hash32(col("t")))
    val votes = (0 until SimHashBits).map(j =>
      sum(when(expr(s"(h div ${1L << j}) % 2 = 1"), col("tf")).otherwise(-col("tf"))).as(s"v$j"))
    val sigExpr = (0 until SimHashBits)
      .map(j => s"CASE WHEN v$j > 0 THEN ${1L << j} ELSE 0 END")
      .mkString(" + ")
    tf.groupBy(id).agg(votes.head, votes.tail: _*)
      .selectExpr(id, s"CAST($sigExpr AS BIGINT) AS sig")
  }

  /** SimHash near-dup pairs within a Hamming radius, via byte-banding
    * (radius ≤ 3 over 4 bytes ⇒ some byte equal: exact by pigeonhole). */
  def simhashCandidates(df: DataFrame, id: String, text: String,
                        maxHamming: Int = 3): DataFrame = {
    // 4 byte-bands are exhaustive only up to Hamming 3 (pigeonhole);
    // a larger radius would silently drop in-radius pairs
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming must be in [0, 3] for 4-band exhaustive search, got $maxHamming")
    val sigs = simhashSignatures(df, id, text).localCheckpoint()
    val bands = (0 until 4).map(j =>
      sigs.selectExpr(id, "sig", s"$j AS bj", s"(sig div ${1L << (8 * j)}) % 256 AS bv"))
      .reduce(_ unionAll _)
    bands.select(col(id).as("a"), col("sig").as("siga"), col("bj"), col("bv"))
      .join(bands.select(col(id).as("b"), col("sig").as("sigb"), col("bj"), col("bv")),
        Seq("bj", "bv"))
      .filter(col("a") < col("b"))
      .select("a", "b", "siga", "sigb").distinct()
      .withColumn("hamming", expr("bit_count(siga ^ sigb)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming").cast("long").as("hamming"))
  }

  /** Exact cosine top-k of each query vector against the corpus (query
    * side broadcast; native codegen'd cosine_sim; per-query window). */
  def cosineTopK(df: DataFrame, id: String, vec: String,
                 queries: DataFrame, k: Int = 5): DataFrame = {
    graft.functions.VectorExpressions.register(df.sparkSession)
    val e = df.select(col(id), expr(s"transform($vec, x -> CAST(x AS DOUBLE))").as("v"))
    val q = queries.select(col(id).as("qid"),
      expr(s"transform($vec, x -> CAST(x AS DOUBLE))").as("qv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col(id))
    e.join(broadcast(q), col(id) =!= col("qid"))
      .withColumn("cos", expr("cosine_sim(qv, v)"))
      .withColumn("rnk", row_number().over(w).cast("long")) // bigint: DuckDB parity
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col(id).as("neighbor"), round(col("cos"), 6).as("cos"))
  }

  /** Per-key sessionization on an epoch-micros column: split on gaps. */
  def sessionize(df: DataFrame, key: String, tsUs: String, gapUs: Long,
                 valueCol: Option[String] = None): DataFrame = {
    val byKey = Window.partitionBy(col(key)).orderBy(col(tsUs))
    val base = df
      .withColumn("__prev", lag(col(tsUs), 1).over(byKey))
      .withColumn("__brk",
        when(col("__prev").isNull || col(tsUs) - col("__prev") > gapUs, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("__brk")).over(byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
    val aggs = Seq(
      count(lit(1)).as("n_events"),
      expr(s"min($tsUs) div 1000").as("start_ms"),
      expr(s"max($tsUs) div 1000").as("end_ms")) ++
      valueCol.map(v => round(sum(col(v)), 2).as("sum_value")).toSeq
    base.groupBy(col(key), col("session_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Top-k rows per group by an ordering column (window row_number). */
  def topKPerGroup(df: DataFrame, part: String, order: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(col(part)).orderBy(order)
    df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** Data-profiling: per-column null count, distinct count, min/max
    * (stringified for type uniformity) in ONE aggregation pass over the
    * table + an in-row `stack` unpivot — schema-driven, works on any
    * DataFrame, the standard first look at an unfamiliar 100 TB table. */
  def profile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields.map(_.name)
    val aggs = fields.flatMap { f =>
      Seq(
        sum(when(col(f).isNull, 1L).otherwise(0L)).as(s"${f}__nulls"),
        countDistinct(col(f)).as(s"${f}__distinct"),
        min(col(f)).cast("string").as(s"${f}__min"),
        max(col(f)).cast("string").as(s"${f}__max"))
    } :+ count(lit(1)).as("__n")
    val stacked = fields.map(f =>
      s"'$f', ${f}__nulls, ${f}__distinct, ${f}__min, ${f}__max").mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr("__n",
        s"stack(${fields.length}, $stacked) AS (column, n_nulls, n_distinct, min_val, max_val)")
      .select(col("column"), col("__n").as("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_val"), col("max_val"))
  }

  /** Heap-based top-k per group via the `top_k_pairs` TypedImperative-
    * Aggregate: map-side k-bounded heaps combine before the shuffle, so
    * at most k·|groups| rows move per partition — the at-scale form of
    * `topKPerGroup` (whose window sorts every group in full).
    * Output: (part, rnk bigint, payload, ord), rnk 1..k by ord desc. */
  def topKPerGroupAgg(df: DataFrame, part: String, ordCol: String,
                      payloadCol: String, k: Int): DataFrame = {
    graft.functions.VectorExpressions.register(df.sparkSession)
    df.groupBy(part)
      .agg(expr(s"top_k_pairs(CAST($ordCol AS DOUBLE), CAST($payloadCol AS BIGINT), $k)").as("__tk"))
      .select(col(part), posexplode(col("__tk")).as(Seq("__pos", "__e")))
      .select(col(part), (col("__pos") + 1).cast("long").as("rnk"),
        col("__e.payload").as(payloadCol), col("__e.ord").as(ordCol))
  }

  /** Skew-safe equi-join: salt the (skewed) left side's key with a
    * random suffix in [0, salt) and replicate each right-side row salt
    * times, so one hot key spreads over `salt` reducers instead of one.
    * AQE's skew-join handles moderate skew automatically; this is the
    * explicit tool for pathological keys (and for engines/configs where
    * AQE is off). Output columns = left ++ right (join key deduped).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salt: Int = 8): DataFrame = {
    val saltedL = left.withColumn("__salt",
      (rand(seed = 42) * salt).cast("int"))
    val saltedR = right.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    saltedL.join(saltedR, Seq(key, "__salt")).drop("__salt")
  }

  object implicits {
    implicit class GraftDataFrameOps(private val df: DataFrame) {
      def dedupExact(id: String, content: String): DataFrame =
        GraftOps.dedupExact(df, id, content)
      def ngramJaccardPairs(id: String, text: String, n: Int = 3,
                            threshold: Double = 0.5): DataFrame =
        GraftOps.ngramJaccardPairs(df, id, text, n, threshold)
      def minhashCandidates(id: String, text: String, n: Int = 3): DataFrame =
        GraftOps.minhashCandidates(df, id, text, n)
      def simhashCandidates(id: String, text: String, maxHamming: Int = 3): DataFrame =
        GraftOps.simhashCandidates(df, id, text, maxHamming)
      def cosineTopK(id: String, vec: String, queries: DataFrame, k: Int = 5): DataFrame =
        GraftOps.cosineTopK(df, id, vec, queries, k)
      def sessionize(key: String, tsUs: String, gapUs: Long,
                     valueCol: Option[String] = None): DataFrame =
        GraftOps.sessionize(df, key, tsUs, gapUs, valueCol)
      def topKPerGroup(part: String, order: Column, k: Int): DataFrame =
        GraftOps.topKPerGroup(df, part, order, k)
      def saltedJoin(right: DataFrame, key: String, salt: Int = 8): DataFrame =
        GraftOps.saltedJoin(df, right, key, salt)
      def profile(): DataFrame = GraftOps.profile(df)
    }
  }
}
