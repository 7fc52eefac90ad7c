package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.QueryDef
import graft.sources.Tables

/** Multimodal-column plumbing: treat media as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The container has no image/audio codecs, so `StubDecoder` is a
  * clearly-marked deterministic fake; the Spark-side plumbing — schema,
  * binary column, per-partition batched decode via mapPartitions, typed
  * output Encoder — is real and tested, and is exactly where a JNI/
  * native decoder would plug in. Batch shape matters at scale: the
  * decode loop amortizes per-batch setup (model load, codec init)
  * across a whole partition instead of per-row.
  */
object Multimodal {

  /** Decoder contract. A real implementation would wrap e.g. a JPEG or
    * audio codec; init() is called once per PARTITION (not per row). */
  trait Decoder extends Serializable {
    def init(): Unit
    def decode(bytes: Array[Byte]): (Int, Int, Int) // (width, height, frames)
  }

  /** STUB: deterministic fake decode derived from the byte length only.
    * Replace with a real codec when one is available in the runtime. */
  object StubDecoder extends Decoder {
    def init(): Unit = ()
    def decode(bytes: Array[Byte]): (Int, Int, Int) = {
      val n = bytes.length
      (n % 640, n % 480, n % 16)
    }
  }

  val outSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("byte_len", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("frames", IntegerType)))

  /** Binary-column pipeline: text bytes stand in for media payloads. */
  def metadata(spark: SparkSession, dir: String,
               decoder: Decoder = StubDecoder): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val bin = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    bin.mapPartitions { rows =>
      decoder.init() // once per partition: codec/model setup amortized
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (w, h, f) = decoder.decode(bytes)
        Row(id, bytes.length.toLong, w, h, f)
      }
    }(enc).orderBy("doc_id")
  }

  /** Frame sampling: expand each payload into its (stub-)decoded frame
    * rows with a stable per-frame key — the one-to-many media expansion
    * (video → frames, audio → chunks) a training pipeline feeds to
    * feature extraction. In-row `sequence` + `explode`: no shuffle. */
  def frames(spark: SparkSession, dir: String): DataFrame =
    metadata(spark, dir)
      .withColumn("frame_no", explode(expr(
        "CASE WHEN frames > 0 THEN sequence(0L, CAST(frames - 1 AS LONG)) ELSE array() END")))
      .select(col("doc_id"), col("frame_no"),
        md5(concat(col("doc_id").cast("string"), lit("_"), col("frame_no").cast("string")))
          .as("frame_key"))
      .orderBy("doc_id", "frame_no")

  /** Feature-extractor contract: init() once per partition (model
    * load), extract() per payload — the mapPartitions batch shape that
    * amortizes setup at 100 TB. The stub derives a deterministic
    * 8-dim vector from md5 so the oracle reproduces it exactly. */
  trait FeatureExtractor extends Serializable {
    def init(): Unit
    def extract(bytes: Array[Byte]): Array[Double]
  }

  val FeatureDims = 8

  /** STUB: feature j = round(int(md5(md5(payload) ++ "_j")[0:8]) / 2^32, 6).
    * Replace with a real (e.g. image-embedding) kernel; everything
    * around it — batching, schema, explode shape — stays. */
  object StubFeatureExtractor extends FeatureExtractor {
    def init(): Unit = ()
    private def md5hex(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(b).map("%02x".format(_)).mkString
    def extract(bytes: Array[Byte]): Array[Double] = {
      val h = md5hex(bytes)
      Array.tabulate(FeatureDims) { j =>
        val hj = md5hex(s"${h}_$j".getBytes("UTF-8")).substring(0, 8)
        val v = java.lang.Long.parseLong(hj, 16) / 4294967296.0
        // HALF_UP on the exact decimal expansion == DuckDB round()
        // (half away from zero for positives); rint would be half-even
        BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
  }

  private val featSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("feat_no", IntegerType),
    StructField("value", DoubleType)))

  /** Batched feature extraction over the binary column, exploded to
    * (doc_id, feat_no, value) scalar rows. */
  def features(spark: SparkSession, dir: String,
               fx: FeatureExtractor = StubFeatureExtractor): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featSchema)
    val bin = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    bin.mapPartitions { rows =>
      fx.init()
      rows.flatMap { r =>
        val id = r.getLong(0)
        val fs = fx.extract(r.getAs[Array[Byte]](1))
        fs.iterator.zipWithIndex.map { case (v, j) => Row(id, j, v) }
      }
    }(enc).orderBy("doc_id", "feat_no")
  }

  /** Resize planning: fit each (width, height) into a target square
    * box, aspect ratio preserved, INTEGER arithmetic only (identical
    * on any engine — no float rounding drift). est_bytes is the RGB
    * buffer the resized payload would occupy — the number a pipeline
    * uses to budget shuffle/memory before running the real kernel. */
  val ResizeTarget = 224
  def resizePlan(spark: SparkSession, dir: String): DataFrame =
    metadata(spark, dir)
      .filter(col("width") > 0 && col("height") > 0)
      .withColumn("out_w",
        expr(s"CAST(width * $ResizeTarget div greatest(width, height) AS INT)"))
      .withColumn("out_h",
        expr(s"CAST(height * $ResizeTarget div greatest(width, height) AS INT)"))
      .select(col("doc_id"), col("width"), col("height"),
        col("out_w"), col("out_h"),
        (col("out_w").cast("long") * col("out_h") * 3L).as("est_bytes"))
      .orderBy("doc_id")

  /** COMPOSED multimodal near-dup pipeline — the mm analog of
    * cur_pipeline: binary payloads → per-partition batched feature
    * extraction (the StubFeatureExtractor seam, as vectors) →
    * LSH-bucketed cosine near-dup pairs over the 8-dim feature space
    * (GraftOps.embeddingNearDupPairs — 8 tables × 4 sign bits, exact
    * cosine only within buckets) → connected components on the pair
    * graph → min-id keeper per cluster. ONE oracle replays the whole
    * chain: stub features, plane projections, bucket collisions,
    * cosine filter, CC rounds, keepers. */
  val MmThreshold = 0.97
  val MmTables = 8
  // 6 bits: at the 0.97 cosine threshold the per-plane agreement is
  // ≈0.92, so recall ≈ 1-(1-0.92^6)^8 ≈ 0.9995 while 64 buckets/table
  // cut candidate pairs 4× vs 4 bits (the dominant pipeline cost)
  val MmBits = 6
  val MmCcIters = 6

  private val vecSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("fv", ArrayType(DoubleType, containsNull = false))))

  /** Feature vectors per payload (the array form of `features`). */
  def featureVectors(spark: SparkSession, dir: String,
                     fx: FeatureExtractor = StubFeatureExtractor): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(vecSchema)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .mapPartitions { rows =>
        fx.init() // once per partition: model load amortized
        rows.map(r => Row(r.getLong(0), fx.extract(r.getAs[Array[Byte]](1))))
      }(enc)
  }

  def mmPipeline(spark: SparkSession, dir: String): DataFrame = {
    // checkpoint: the extracted vectors feed the LSH banding AND the
    // final keeper join — without this the mapPartitions extraction
    // re-runs for every consumer
    val vecs = featureVectors(spark, dir).localCheckpoint()
    val pairs = graft.api.GraftOps.embeddingNearDupPairs(
        vecs, "doc_id", "fv", MmThreshold, MmTables, MmBits, FeatureDims)
      .select(col("a"), col("b"))
    val cc = graft.api.GraftOps.connectedComponents(pairs, "a", "b", MmCcIters)
    vecs.select(col("doc_id"))
      .join(cc, col("doc_id") === cc("v"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("keeper"))
      .withColumn("is_keep", col("doc_id") === col("keeper"))
      .orderBy("doc_id")
  }

  private lazy val mmPipelineOracle: String = {
    val planeRows = (0 until MmTables).flatMap { t =>
      val ps = graft.functions.LshBucket.planes(MmBits, FeatureDims, t)
      (0 until MmBits).map { j =>
        s"($t, $j, [${ps(j).map(w => if (w > 0) "1.0" else "-1.0").mkString(",")}]::DOUBLE[])"
      }
    }.mkString(",\n            ")
    s"""WITH f AS MATERIALIZED (
            SELECT doc_id, CAST(j AS INT) AS feat_no,
                   round(('0x' || substr(md5(md5(text) || '_' || CAST(j AS VARCHAR)), 1, 8))::BIGINT
                         / 4294967296.0, 6) AS v
            FROM documents, unnest(generate_series(0, ${FeatureDims - 1})) AS u(j)),
          vec AS MATERIALIZED (SELECT doc_id, list(v ORDER BY feat_no) AS fv FROM f GROUP BY 1),
          planes(t, j, w) AS (VALUES
            $planeRows),
          proj AS (SELECT vec.doc_id, p.t,
                          CASE WHEN list_dot_product(vec.fv, p.w) > 0 THEN 1 << p.j ELSE 0 END AS bit
                   FROM vec, planes p),
          buck AS (SELECT doc_id, t, sum(bit) AS bv FROM proj GROUP BY 1, 2),
          cand AS (SELECT DISTINCT ba.doc_id AS a, bb.doc_id AS b
                   FROM buck ba JOIN buck bb ON ba.t = bb.t AND ba.bv = bb.bv
                   WHERE ba.doc_id < bb.doc_id),
          pairs AS MATERIALIZED (
            SELECT c.a, c.b FROM cand c
            JOIN vec va ON c.a = va.doc_id JOIN vec vb ON c.b = vb.doc_id
            WHERE round(list_dot_product(va.fv, vb.fv) /
                    (sqrt(list_dot_product(va.fv, va.fv)) * sqrt(list_dot_product(vb.fv, vb.fv))), 6)
                  >= $MmThreshold),
          edges AS MATERIALIZED (SELECT a AS src, b AS dst FROM pairs
                    UNION ALL SELECT b, a FROM pairs),
          l0 AS MATERIALIZED (SELECT DISTINCT src AS v, src AS comp FROM edges),
          ${Graph.ccUnrolledCtes(MmCcIters)}
        SELECT d.doc_id, coalesce(l.comp, d.doc_id) AS keeper,
               (d.doc_id = coalesce(l.comp, d.doc_id)) AS is_keep
        FROM documents d LEFT JOIN l$MmCcIters l ON d.doc_id = l.v
        ORDER BY d.doc_id"""
  }

  /** Perceptual-hash near-dup detection over the binary payloads — the
    * blockhash discipline (Yang et al. / blockhash.org): the payload's
    * byte stream is cut into 64 equal blocks; bit j = "block j's byte
    * sum exceeds the payload mean" (compared as blocksum·64 > total —
    * EXACT integer arithmetic, no division). Similar payloads share
    * most block statistics, so near-identical media collide in hash
    * space — the production image-dedup shape, on the stub payloads.
    *
    * Candidate generation is the dedup_simhash pigeonhole: 8 bands of
    * 8 bits; hamming ≤ 7 GUARANTEES a shared band, so the banded join
    * is an exact candidate filter at shuffle cost 8·N, never N². The
    * whole hash computes IN-ROW (codegen'd transform/slice/aggregate
    * — zero shuffle before the band explode). */
  val PhashBands = 8
  val PhashBits = 8
  val PhashMaxHamming: Long = PhashBands - 1L
  def mmDedupPhash(spark: SparkSession, dir: String): DataFrame = {
    val bandCols = (0 until PhashBands).map { b =>
      val bits = (0 until PhashBits).map { k =>
        val j = PhashBits * b + k
        s"""(CASE WHEN aggregate(slice(cs, CAST(($j * n) div 64 AS INT) + 1,
                     CAST((${j + 1} * n) div 64 AS INT) - CAST(($j * n) div 64 AS INT)),
                   0L, (a, x) -> a + x) * 64 > total THEN ${1L << k} ELSE 0 END)"""
      }.mkString("(", " + ", ")")
      expr(bits).as(s"band$b")
    }
    val codes = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .withColumn("n", length(col("text")).cast("long"))
      .withColumn("cs", expr("transform(split(text, ''), c -> CAST(ascii(c) AS LONG))"))
      .withColumn("total", expr("aggregate(slice(cs, 1, CAST(n AS INT)), 0L, (a, x) -> a + x)"))
      .select(col("doc_id") +: bandCols: _*)
      .localCheckpoint() // feeds the band explode AND both verify sides
    val cand = (0 until PhashBands).map(b =>
        codes.select(col("doc_id"), lit(b).as("bj"), col(s"band$b").as("bv")))
      .reduce(_ unionAll _)
    val pairs = cand.as("x").join(cand.as("y"),
        col("x.bj") === col("y.bj") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
    val ham = (0 until PhashBands)
      .map(b => bit_count(expr(s"ca$b ^ cb$b")).cast("long"))
      .reduceLeft(_ + _)
    val ca = codes.select(col("doc_id").as("a") +:
      (0 until PhashBands).map(b => col(s"band$b").as(s"ca$b")): _*)
    val cb = codes.select(col("doc_id").as("b") +:
      (0 until PhashBands).map(b => col(s"band$b").as(s"cb$b")): _*)
    pairs.join(ca, "a").join(cb, "b")
      .withColumn("hamming", ham)
      .filter(col("hamming") <= PhashMaxHamming)
      .select(col("a"), col("b"), col("hamming"))
      .orderBy("a", "b")
  }

  private lazy val phashHamSql: String = (0 until PhashBands)
    .map(b => s"bit_count(xor(ca.band$b, cb.band$b))")
    .mkString(" + ")

  /** Shared CTE chain up to the banded candidate `pairs` — consumed by
    * the pair report and the cluster-resolution oracle. */
  private lazy val phashCtes: String = {
    val bandSql = (0 until PhashBands).map { b =>
      val bits = (0 until PhashBits).map { k =>
        val j = PhashBits * b + k
        s"""(CASE WHEN coalesce(list_sum(cs[($j * n) // 64 + 1 : (${j + 1} * n) // 64]), 0) * 64 > total
                  THEN ${1L << k} ELSE 0 END)"""
      }.mkString("(", " + ", ")")
      s"$bits AS band$b"
    }.mkString(",\n                 ")
    val bandUnion = (0 until PhashBands)
      .map(b => s"SELECT doc_id, $b AS bj, band$b AS bv FROM codes")
      .mkString("\n                 UNION ALL ")
    s"""d AS (SELECT doc_id, length(text) AS n,
                          [CAST(ascii(text[i]) AS BIGINT) for i in generate_series(1, length(text))] AS cs
                   FROM documents),
          t AS (SELECT doc_id, n, cs, list_sum(cs) AS total FROM d),
          codes AS MATERIALIZED (SELECT doc_id,
                 $bandSql
                 FROM t),
          cand AS ($bandUnion),
          pairs AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
                    FROM cand x JOIN cand y ON x.bj = y.bj AND x.bv = y.bv
                    WHERE x.doc_id < y.doc_id)"""
  }

  private lazy val phashOracle: String =
    s"""WITH $phashCtes
        SELECT p.a, p.b, CAST($phashHamSql AS BIGINT) AS hamming
        FROM pairs p JOIN codes ca ON p.a = ca.doc_id JOIN codes cb ON p.b = cb.doc_id
        WHERE $phashHamSql <= $PhashMaxHamming
        ORDER BY p.a, p.b"""

  /** End-to-end media near-dup RESOLUTION: the blockhash pairs
    * collapsed to clusters (min-label CC) with one keeper each — the
    * mm-tier mirror of dedup_cluster (pairs alone don't dedup; a
    * payload chained A≈B≈C must collapse even when A,C never pair
    * directly). Singletons keep themselves. */
  val PhashCcIters = 8
  def mmPhashCluster(spark: SparkSession, dir: String): DataFrame = {
    val pairs = mmDedupPhash(spark, dir).select("a", "b")
    val cc = graft.api.GraftOps.connectedComponents(pairs, "a", "b", PhashCcIters)
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(cc, col("doc_id") === cc("v"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("cluster"))
      .withColumn("is_keep", col("doc_id") === col("cluster"))
      .orderBy("doc_id")
  }

  private lazy val phashClusterOracle: String = {
    s"""WITH $phashCtes,
          hpairs AS MATERIALIZED (
            SELECT p.a, p.b
            FROM pairs p JOIN codes ca ON p.a = ca.doc_id JOIN codes cb ON p.b = cb.doc_id
            WHERE $phashHamSql <= $PhashMaxHamming),
          edges AS MATERIALIZED (SELECT a AS src, b AS dst FROM hpairs
                    UNION ALL SELECT b, a FROM hpairs),
          l0 AS MATERIALIZED (SELECT DISTINCT src AS v, src AS comp FROM edges),
          ${Graph.ccUnrolledCtes(PhashCcIters)}
        SELECT d.doc_id, coalesce(l.comp, d.doc_id) AS cluster,
               (d.doc_id = coalesce(l.comp, d.doc_id)) AS is_keep
        FROM documents d LEFT JOIN l$PhashCcIters l ON d.doc_id = l.v
        ORDER BY d.doc_id"""
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("mm_dedup_phash", mmDedupPhash, Some(phashOracle)),
    QueryDef("mm_phash_cluster", mmPhashCluster, Some(phashClusterOracle)),
    QueryDef("mm_pipeline", mmPipeline, Some(mmPipelineOracle)),
    // Oracle covers the deterministic stub arithmetic; the decode seam
    // itself is the part a real codec would replace.
    QueryDef("mm_metadata", (s, d) => metadata(s, d), Some(
      """SELECT doc_id,
                CAST(octet_length(text::BLOB) AS BIGINT) AS byte_len,
                CAST(octet_length(text::BLOB) % 640 AS INT) AS width,
                CAST(octet_length(text::BLOB) % 480 AS INT) AS height,
                CAST(octet_length(text::BLOB) % 16 AS INT) AS frames
         FROM documents ORDER BY doc_id""")),
    QueryDef("mm_frames", (s, d) => frames(s, d), Some(
      """SELECT doc_id, f AS frame_no,
                md5(CAST(doc_id AS VARCHAR) || '_' || CAST(f AS VARCHAR)) AS frame_key
         FROM (SELECT doc_id, octet_length(text::BLOB) % 16 AS nf FROM documents),
              unnest(generate_series(0, CAST(nf - 1 AS BIGINT))) AS u(f)
         ORDER BY doc_id, frame_no""")),
    QueryDef("mm_features", (s, d) => features(s, d), Some(
      s"""SELECT doc_id, CAST(j AS INT) AS feat_no,
                 round(('0x' || substr(md5(md5(text) || '_' || CAST(j AS VARCHAR)), 1, 8))::BIGINT
                       / 4294967296.0, 6) AS value
          FROM documents, unnest(generate_series(0, ${FeatureDims - 1})) AS u(j)
          ORDER BY doc_id, feat_no""")),
    QueryDef("mm_resize", (s, d) => resizePlan(s, d), Some(
      s"""WITH m AS (SELECT doc_id,
                            CAST(octet_length(text::BLOB) % 640 AS INT) AS width,
                            CAST(octet_length(text::BLOB) % 480 AS INT) AS height
                     FROM documents)
          SELECT doc_id, width, height,
                 CAST(width * $ResizeTarget // greatest(width, height) AS INT) AS out_w,
                 CAST(height * $ResizeTarget // greatest(width, height) AS INT) AS out_h,
                 CAST(CAST(width * $ResizeTarget // greatest(width, height) AS BIGINT) *
                      CAST(height * $ResizeTarget // greatest(width, height) AS BIGINT) * 3 AS BIGINT) AS est_bytes
          FROM m WHERE width > 0 AND height > 0 ORDER BY doc_id""")),
  )
}
