package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.QueryDef
import graft.api.Memo.MemoOps
import graft.sources.Tables

/** Multimodal-column plumbing: treat media as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The container ships no media FILES, so payloads are synthesized
  * deterministically from each document's text bytes as multi-frame
  * binary P6 PPM images ([[PpmPayload.build]] — a real, public image
  * format). The decode path is then an honest byte-format parse:
  * [[PpmDecoder]] walks magic / ASCII dimensions / maxval / pixel
  * planes frame by frame and would reject malformed bytes, and
  * [[PpmFeatureExtractor]] computes its features from the PARSED
  * pixel values, not from the construction recipe. The oracle never
  * parses — it recomputes the expected stats from the (public)
  * synthesis arithmetic, so the parser is verified against an
  * independent derivation. The Spark-side batch shape — binary
  * column, per-partition init() via mapPartitions, typed output
  * Encoder — is where a JPEG/audio codec would plug in unchanged.
  */
object Multimodal {

  /** Deterministic payload synthesis: `1 + n%4` concatenated binary
    * P6 PPM frames (header `P6\n<w> <h>\n255\n`, then w·h·3 pixel
    * bytes), w = 8 + n%9, h = 8 + n%7, with frame f's pixel k set to
    * text byte (f + k) mod n — real image bytes whose pixel stats a
    * SQL oracle can recompute in closed form (cycle counts + prefix
    * sums) without a parser. */
  object PpmPayload {
    def dims(n: Int): (Int, Int, Int) = (8 + n % 9, 8 + n % 7, 1 + n % 4)

    def build(text: Array[Byte]): Array[Byte] = {
      val n = text.length
      val (w, h, frames) = dims(n)
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      val npix = w * h * 3
      val out = new Array[Byte](frames * (header.length + npix))
      var pos = 0
      var f = 0
      while (f < frames) {
        System.arraycopy(header, 0, out, pos, header.length)
        pos += header.length
        var k = 0
        while (k < npix) {
          out(pos) = if (n == 0) 0 else text((f + k) % n)
          pos += 1; k += 1
        }
        f += 1
      }
      out
    }
  }

  /** Decoder contract. A real implementation would wrap e.g. a JPEG or
    * audio codec; init() is called once per PARTITION (not per row). */
  trait Decoder extends Serializable {
    def init(): Unit
    def decode(bytes: Array[Byte]): (Int, Int, Int) // (width, height, frames)
  }

  /** REAL byte-format parse of (possibly multi-frame) binary P6 PPM:
    * validates the magic, reads the ASCII dimensions and maxval,
    * skips each frame's pixel plane, requires consistent dimensions
    * across frames and an exact byte count — malformed input throws
    * rather than returning garbage. */
  object PpmDecoder extends Decoder {
    def init(): Unit = ()

    private[operators] def readInt(b: Array[Byte], start: Int): (Int, Int) = {
      var p = start; var v = 0
      require(p < b.length && b(p) >= '0' && b(p) <= '9', s"expected digit at $p")
      while (p < b.length && b(p) >= '0' && b(p) <= '9') { v = v * 10 + (b(p) - '0'); p += 1 }
      (v, p)
    }

    def decode(bytes: Array[Byte]): (Int, Int, Int) = {
      var pos = 0; var frames = 0; var w0 = 0; var h0 = 0
      while (pos < bytes.length) {
        require(pos + 3 <= bytes.length &&
          bytes(pos) == 'P' && bytes(pos + 1) == '6' && bytes(pos + 2) == '\n',
          s"bad PPM magic at $pos")
        val (w, p1) = readInt(bytes, pos + 3)
        require(p1 < bytes.length && bytes(p1) == ' ', "bad dims separator")
        val (h, p2) = readInt(bytes, p1 + 1)
        require(p2 < bytes.length && bytes(p2) == '\n', "bad dims terminator")
        val (mx, p3) = readInt(bytes, p2 + 1)
        require(mx == 255 && p3 < bytes.length && bytes(p3) == '\n', "bad maxval")
        pos = p3 + 1 + w * h * 3
        require(pos <= bytes.length, "truncated pixel plane")
        if (frames == 0) { w0 = w; h0 = h }
        else require(w == w0 && h == h0, "inconsistent frame dims")
        frames += 1
      }
      (w0, h0, frames)
    }
  }

  val outSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("byte_len", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("frames", IntegerType)))

  /** Binary-column pipeline: synthesized PPM payloads, REALLY parsed.
    * Payload construction and decode both happen partition-local (one
    * pass, no shuffle); the decoder sees only bytes. */
  def metadata(spark: SparkSession, dir: String,
               decoder: Decoder = PpmDecoder): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val bin = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    bin.mapPartitions { rows =>
      decoder.init() // once per partition: codec/model setup amortized
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = PpmPayload.build(r.getAs[Array[Byte]](1))
        val (w, h, f) = decoder.decode(bytes)
        Row(id, bytes.length.toLong, w, h, f)
      }
    }(enc).orderBy("doc_id")
  }

  /** Frame sampling: expand each payload into its parsed frame
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
    * amortizes setup at 100 TB. [[PpmFeatureExtractor]] computes an
    * 8-dim pixel-statistic vector from the parsed payload. */
  trait FeatureExtractor extends Serializable {
    def init(): Unit
    def extract(bytes: Array[Byte]): Array[Double]
  }

  val FeatureDims = 8

  /** REAL pixel-statistic features from the PARSED first frame: the
    * pixel plane splits into [[FeatureDims]] contiguous slices and
    * feature j = round((mean(slice j) − mean(frame)) / 255, 6) — the
    * centered slice-luminance profile, a classic cheap image
    * descriptor (centering keeps the vectors directional instead of
    * all-positive-near-parallel, so cosine discriminates). Everything
    * derives from pixel bytes the parser read, never from the payload
    * recipe; the oracle recomputes the same stats in closed form from
    * the synthesis arithmetic, so parse bugs surface as value
    * mismatches. HALF_UP on the exact decimal expansion == DuckDB
    * round() (half away from zero); rint would be half-even. */
  object PpmFeatureExtractor extends FeatureExtractor {
    def init(): Unit = ()
    def extract(bytes: Array[Byte]): Array[Double] = {
      // parse frame-0 header with the shared reader
      require(bytes.length >= 3 && bytes(0) == 'P' && bytes(1) == '6' && bytes(2) == '\n',
        "bad PPM magic")
      val (w, p1) = PpmDecoder.readInt(bytes, 3)
      require(bytes(p1) == ' ', "bad dims separator")
      val (h, p2) = PpmDecoder.readInt(bytes, p1 + 1)
      require(bytes(p2) == '\n', "bad dims terminator")
      val (mx, p3) = PpmDecoder.readInt(bytes, p2 + 1)
      require(mx == 255 && bytes(p3) == '\n', "bad maxval")
      val base = p3 + 1
      val npix = w * h * 3
      require(base + npix <= bytes.length, "truncated pixel plane")
      val sums = new Array[Long](FeatureDims)
      var all = 0L
      var j = 0
      while (j < FeatureDims) {
        val s = j * npix / FeatureDims
        val e = (j + 1) * npix / FeatureDims
        var k = s
        var acc = 0L
        while (k < e) { acc += bytes(base + k) & 0xff; k += 1 }
        sums(j) = acc; all += acc
        j += 1
      }
      val g = all.toDouble / npix
      Array.tabulate(FeatureDims) { j =>
        val s = j * npix / FeatureDims
        val e = (j + 1) * npix / FeatureDims
        val mean = sums(j).toDouble / (e - s)
        BigDecimal((mean - g) / 255.0)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
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
               fx: FeatureExtractor = PpmFeatureExtractor): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featSchema)
    val bin = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    bin.mapPartitions { rows =>
      fx.init()
      rows.flatMap { r =>
        val id = r.getLong(0)
        val fs = fx.extract(PpmPayload.build(r.getAs[Array[Byte]](1)))
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
    * extraction (the PpmFeatureExtractor seam, as vectors) →
    * LSH-bucketed cosine near-dup pairs over the 8-dim feature space
    * (GraftOps.embeddingNearDupPairs — 8 tables × 4 sign bits, exact
    * cosine only within buckets) → connected components on the pair
    * graph → min-id keeper per cluster. ONE oracle replays the whole
    * chain: closed-form features, plane projections, bucket collisions,
    * cosine filter, CC rounds, keepers. */
  val MmThreshold = 0.97
  val MmTables = 8
  // 6 bits: at the 0.97 cosine threshold the per-plane agreement is
  // ≈0.92, so recall ≈ 1-(1-0.92^6)^8 ≈ 0.9995 while 64 buckets/table
  // cut candidate pairs 4× vs 4 bits (the dominant pipeline cost)
  val MmBits = 6
  val MmCcIters = 6
  /** Corpus-adaptive bit floor (r13, after the sf1 soak measured the
    * fixed-bit pipeline at 27x-of-linear): bits = max(MmBits,
    * ⌈log₂N⌉ − 6) — the dedup_embedding lever with the TIGHT
    * budget, because the 0.97 threshold tolerates narrow buckets
    * (p ≈ 0.92/plane: even 10 bits keep recall ≈ 0.99 at 8 tables).
    * sf0.01 stays on 6 bits; sf0.1 takes 7; sf1 takes 9. */
  val MmBudgetLog2 = 6
  def mmSuggestedBits(n: Long): Int = {
    val ceilLog2 = if (n <= 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(n - 1)
    math.max(MmBits, ceilLog2 - MmBudgetLog2)
  }

  private val vecSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("fv", ArrayType(DoubleType, containsNull = false))))

  /** Feature vectors per payload (the array form of `features`). */
  def featureVectors(spark: SparkSession, dir: String,
                     fx: FeatureExtractor = PpmFeatureExtractor): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(vecSchema)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .mapPartitions { rows =>
        fx.init() // once per partition: model load amortized
        rows.map(r => Row(r.getLong(0), fx.extract(PpmPayload.build(r.getAs[Array[Byte]](1)))))
      }(enc)
  }

  def mmPipeline(spark: SparkSession, dir: String): DataFrame = {
    // checkpoint: the extracted vectors feed the LSH banding AND the
    // final keeper join — without this the mapPartitions extraction
    // re-runs for every consumer
    val vecs = featureVectors(spark, dir).memoized()
    val bits = mmSuggestedBits(Tables.documents(spark, dir).count())
    val pairs = graft.api.GraftOps.embeddingNearDupPairs(
        vecs, "doc_id", "fv", MmThreshold, MmTables, bits, FeatureDims,
        hotThreshold = graft.functions.EmbLsh.SaltHotBucket,
        salt = graft.functions.EmbLsh.SaltWays)
      .select(col("a"), col("b"))
    val cc = graft.api.GraftOps.connectedComponents(pairs, "a", "b", MmCcIters)
    vecs.select(col("doc_id"))
      .join(cc, col("doc_id") === cc("v"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("keeper"))
      .withColumn("is_keep", col("doc_id") === col("keeper"))
      .orderBy("doc_id")
  }

  /** DuckDB byte-list extraction shared by every payload oracle: the
    * UTF-8 BYTES of `text` as a BIGINT list (two-nibble parse of
    * hex(text::BLOB)) — matching the Spark side's `text.cast("binary")`
    * byte semantics exactly; `ascii(text[i])` code points would
    * silently diverge on any non-ASCII document. Expects CTE columns
    * `hx` (hex string) and `n` (octet_length). */
  private val byteListSql: String =
    """[CAST(strpos('0123456789ABCDEF', substr(hx, 2 * i - 1, 1)) * 16
             + strpos('0123456789ABCDEF', substr(hx, 2 * i, 1)) - 17 AS BIGINT)
       for i in generate_series(1, n)]"""

  /** Closed-form recomputation of the PPM slice features — NO parser:
    * frame-0 pixel k is text byte k mod n, so every slice sum is
    * (full cycles)·total + a prefix sum, and the oracle derives the
    * identical doubles the parser-side extractor produced from the
    * actual pixel bytes. Ends with `f` (doc_id, j, v). */
  private lazy val featCtes: String =
    s"""fd0 AS (SELECT doc_id, octet_length(text::BLOB) AS n,
                       hex(text::BLOB) AS hx FROM documents),
          fd AS (SELECT doc_id, n, $byteListSql AS cs FROM fd0),
          ft AS (SELECT doc_id, n, cs, list_sum(cs) AS total,
                 (8 + n % 9) * (8 + n % 7) * 3 AS npix FROM fd),
          fs AS (SELECT doc_id, n, cs, total, npix, j,
                 (j * npix) // $FeatureDims AS sj,
                 ((j + 1) * npix) // $FeatureDims AS ej
          FROM ft, unnest(generate_series(0, ${FeatureDims - 1})) AS u(j)),
          fv0 AS (SELECT doc_id, j,
                 ((ej // n) * total + coalesce(list_sum(cs[1 : ej % n]), 0)) -
                 ((sj // n) * total + coalesce(list_sum(cs[1 : sj % n]), 0)) AS sum_j,
                 ej - sj AS cnt,
                 (npix // n) * total + coalesce(list_sum(cs[1 : npix % n]), 0) AS sum_all,
                 npix
          FROM fs),
          f AS MATERIALIZED (SELECT doc_id, j,
                 round((sum_j::DOUBLE / cnt - sum_all::DOUBLE / npix) / 255.0, 6) AS v
          FROM fv0)"""

  private lazy val mmPipelineOracle: String = {
    // dynamic-plane arm (the dedup_embedding oracle technique):
    // bits derive from the corpus size in SQL, planes regenerate for
    // whatever they yield — one text, exact at every SF
    s"""WITH $featCtes,
          vec AS MATERIALIZED (SELECT doc_id, list(v ORDER BY j) AS fv FROM f GROUP BY 1),
          bb AS (SELECT greatest($MmBits,
                   length(bin((count(*) - 1)::BIGINT)) - $MmBudgetLog2) AS bits FROM vec),
          planes AS MATERIALIZED (
            SELECT t.t, j.j,
                   list(CASE WHEN ('0x' || substr(md5('plane_' || t.t::VARCHAR || '_' ||
                          j.j::VARCHAR || '_' || d.d::VARCHAR), 1, 8))::BIGINT % 2 = 1
                        THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END ORDER BY d.d) AS w
            FROM range($MmTables) t(t),
                 (SELECT j FROM range(64) r(j), bb WHERE j < bits) j,
                 range($FeatureDims) d(d)
            GROUP BY 1, 2),
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
    * space — the production image-dedup shape, on the synthesized payloads.
    *
    * Candidate generation is the dedup_simhash pigeonhole: 8 bands of
    * 8 bits; hamming ≤ 7 GUARANTEES a shared band, so the banded join
    * is an exact candidate filter at shuffle cost 8·N, never N². The
    * whole hash computes IN-ROW (codegen'd transform/slice/aggregate
    * — zero shuffle before the band explode). */
  val PhashBands = 8
  val PhashBits = 8
  val PhashMaxHamming: Long = PhashBands - 1L
  /** Same-hash families above this size spread their pair enumeration
    * across salt slots (GraftOps.sameKeyPairs); families at bench SFs
    * sit far under it, so the slot column is constant-0 there. */
  val PhashSameHotThreshold = 100000L
  // CONTRACT: the phash tier's "byte stream" is the text's CODE POINTS
  // (split + ascii on the Spark side, ascii(text[i]) in the oracle) —
  // both engines share the same domain, so the hash is exact on any
  // corpus; this differs from the audio/feature tiers, whose Spark
  // sides parse text.cast("binary") and whose oracles therefore use
  // UTF-8 BYTE extraction. blockhash is representation-agnostic —
  // either domain is a valid block statistic, matching is what matters.
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
    // the banded join runs on the DISTINCT-HASH dictionary, never on
    // per-doc multiplicity (r14, the simhashCandidates fix): on a
    // dup-heavy corpus whole media families share ONE perceptual hash
    // and doc-keyed banding multiplies every bucket by family size —
    // the sf3 soak measured this tier 6.1x over its linear envelope.
    // Hash pairs expand back to doc pairs afterwards; identical-hash
    // docs pair directly at hamming 0. Result set identical (one hash
    // per doc), oracle unchanged.
    val codes = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .withColumn("n", length(col("text")).cast("long"))
      .withColumn("cs", expr("transform(split(text, ''), c -> CAST(ascii(c) AS LONG))"))
      .withColumn("total", expr("aggregate(slice(cs, 1, CAST(n AS INT)), 0L, (a, x) -> a + x)"))
      .select(col("doc_id") +: bandCols: _*)
      // string key: the 8 bands would overflow a 64-bit shift-combine
      // under ANSI; a join key only needs identity, not arithmetic
      .withColumn("sig", concat_ws(",",
        (0 until PhashBands).map(b => col(s"band$b")): _*))
      .memoized() // feeds the band explode AND both verify sides
    val sigD = codes.select(col("sig") +:
        (0 until PhashBands).map(b => col(s"band$b")): _*)
      .distinct().memoized()
    val cand = (0 until PhashBands).map(b =>
        sigD.select(col("sig"), lit(b).as("bj"), col(s"band$b").as("bv")))
      .reduce(_ unionAll _)
    val sigPairsRaw = cand.as("x").join(cand.as("y"),
        col("x.bj") === col("y.bj") && col("x.bv") === col("y.bv") &&
          col("x.sig") < col("y.sig"))
      .select(col("x.sig").as("sa"), col("y.sig").as("sb")).distinct()
    val ham = (0 until PhashBands)
      .map(b => bit_count(expr(s"ca$b ^ cb$b")).cast("long"))
      .reduceLeft(_ + _)
    val sa = sigD.select(col("sig").as("sa") +:
      (0 until PhashBands).map(b => col(s"band$b").as(s"ca$b")): _*)
    val sb = sigD.select(col("sig").as("sb") +:
      (0 until PhashBands).map(b => col(s"band$b").as(s"cb$b")): _*)
    val sigPairs = sigPairsRaw.join(sa, "sa").join(sb, "sb")
      .withColumn("hamming", ham)
      .filter(col("hamming") <= PhashMaxHamming)
      .select(col("sa"), col("sb"), col("hamming"))
    val docSig = codes.select(col("doc_id"), col("sig"))
    val cross = sigPairs
      .join(docSig.select(col("doc_id").as("da"), col("sig").as("sa")), "sa")
      .join(docSig.select(col("doc_id").as("db"), col("sig").as("sb")), "sb")
      .select(least(col("da"), col("db")).as("a"),
        greatest(col("da"), col("db")).as("b"), col("hamming"))
    // salt-slotted same-hash expansion (GraftOps.sameKeyPairs): one
    // giant media family must not enumerate its f²/2 pairs in a
    // single reducer (r14 advice)
    val same = graft.api.GraftOps.sameKeyPairs(docSig, "doc_id", "sig",
        hotThreshold = PhashSameHotThreshold)
      .withColumn("hamming", lit(0L))
    cross.unionAll(same)
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
                  [CAST(ascii(text[i]) AS BIGINT)
                   for i in generate_series(1, length(text))] AS cs
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

  // ---- audio tier (r12): WAV payloads through the same seam ----

  /** Deterministic audio synthesis: a VALID single-chunk PCM WAV file
    * (RIFF/WAVE, fmt 16-byte PCM header, 8-bit mono @ 8 kHz) with
    * 64 + n%193 samples, sample k = text byte (2k+1) mod n — a real
    * container format whose sample stream a SQL oracle recomputes in
    * closed form, exactly like [[PpmPayload]] for images. */
  object WavPayload {
    val SampleRate = 8000
    def nSamples(n: Int): Int = 64 + n % 193

    private def u32(out: Array[Byte], pos: Int, v: Int): Unit = {
      out(pos) = (v & 0xff).toByte; out(pos + 1) = ((v >> 8) & 0xff).toByte
      out(pos + 2) = ((v >> 16) & 0xff).toByte; out(pos + 3) = ((v >> 24) & 0xff).toByte
    }
    private def u16(out: Array[Byte], pos: Int, v: Int): Unit = {
      out(pos) = (v & 0xff).toByte; out(pos + 1) = ((v >> 8) & 0xff).toByte
    }

    def build(text: Array[Byte]): Array[Byte] = {
      val n = text.length
      val ns = nSamples(n)
      val pad = ns % 2 // RIFF chunks pad to even length; size field stays ns
      val out = new Array[Byte](44 + ns + pad)
      "RIFF".getBytes("US-ASCII").copyToArray(out, 0)
      u32(out, 4, 36 + ns + pad)
      "WAVE".getBytes("US-ASCII").copyToArray(out, 8)
      "fmt ".getBytes("US-ASCII").copyToArray(out, 12)
      u32(out, 16, 16); u16(out, 20, 1); u16(out, 22, 1) // PCM, mono
      u32(out, 24, SampleRate); u32(out, 28, SampleRate) // byte rate = rate (8-bit mono)
      u16(out, 32, 1); u16(out, 34, 8)                   // block align, bits
      "data".getBytes("US-ASCII").copyToArray(out, 36)
      u32(out, 40, ns)
      var k = 0
      while (k < ns) {
        out(44 + k) = if (n == 0) 0 else text((2 * k + 1) % n)
        k += 1
      }
      out
    }
  }

  /** REAL RIFF/WAVE chunk walk: validates the RIFF magic and size,
    * requires a 16-byte PCM fmt chunk (mono, 8-bit, 8 kHz) before the
    * data chunk, and an exact byte count (odd chunks consume their
    * RIFF pad byte) — malformed input throws.
    * Returns (sample_rate, n_samples, data_offset). */
  object WavDecoder extends Serializable {
    private def u32(b: Array[Byte], p: Int): Int =
      (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) | ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
    private def u16(b: Array[Byte], p: Int): Int =
      (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
    private def tag(b: Array[Byte], p: Int): String =
      new String(b, p, 4, "US-ASCII")

    def decode(bytes: Array[Byte]): (Int, Int, Int) = {
      require(bytes.length >= 44 && tag(bytes, 0) == "RIFF", "bad RIFF magic")
      require(u32(bytes, 4) == bytes.length - 8, "RIFF size mismatch")
      require(tag(bytes, 8) == "WAVE", "not a WAVE file")
      var pos = 12
      var rate = -1
      var ns = -1
      var off = -1
      while (pos + 8 <= bytes.length) {
        val id = tag(bytes, pos)
        val sz = u32(bytes, pos + 4)
        require(pos + 8 + sz <= bytes.length, s"chunk $id overruns the file")
        id match {
          case "fmt " =>
            require(sz == 16 && u16(bytes, pos + 8) == 1, "not 16-byte PCM fmt")
            require(u16(bytes, pos + 10) == 1, "not mono")
            rate = u32(bytes, pos + 12)
            require(u16(bytes, pos + 22) == 8, "not 8-bit")
          case "data" =>
            require(rate > 0, "data chunk before fmt")
            ns = sz
            off = pos + 8
          case other => throw new IllegalArgumentException(s"unexpected chunk $other")
        }
        pos += 8 + sz + (sz % 2) // RIFF: odd chunks are padded to even
      }
      require(pos == bytes.length, "trailing bytes after last chunk")
      require(ns >= 0, "no data chunk")
      (rate, ns, off)
    }
  }

  private val audioMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("byte_len", LongType),
    StructField("sample_rate", IntegerType),
    StructField("n_samples", LongType),
    StructField("duration_ms", LongType)))

  /** Audio metadata through the binary-column seam: synthesized WAV
    * payloads REALLY parsed (chunk walk, not the recipe); duration in
    * integer milliseconds. */
  def audioMetadata(spark: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(audioMetaSchema)
    val bin = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    bin.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = WavPayload.build(r.getAs[Array[Byte]](1))
        val (rate, ns, _) = WavDecoder.decode(bytes)
        Row(id, bytes.length.toLong, rate, ns.toLong, ns.toLong * 1000L / rate)
      }
    }(enc).orderBy("doc_id")
  }

  /** Windowed audio features from the PARSED sample stream, in the
    * [[PpmFeatureExtractor]] slice discipline: [[AudioWindows]]
    * contiguous windows, per window the midline zero-crossing count,
    * exact integer energy Σ(s−128)², and the 6-dp mean absolute
    * amplitude — the classic cheap audio descriptors (VAD/silence
    * gates run on exactly these), every one integer or one-division
    * arithmetic so DuckDB replays bit-for-bit from the synthesis. */
  val AudioWindows = 4
  private val audioFeatSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("win", IntegerType),
    StructField("n_samples", LongType),
    StructField("zero_crossings", LongType),
    StructField("energy", LongType),
    StructField("mean_abs", DoubleType)))

  def audioFeatures(spark: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(audioFeatSchema)
    val bin = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    bin.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = WavPayload.build(r.getAs[Array[Byte]](1))
        val (_, ns, off) = WavDecoder.decode(bytes)
        (0 until AudioWindows).iterator.map { j =>
          val s = j * ns / AudioWindows
          val e = (j + 1) * ns / AudioWindows
          var zc = 0L; var energy = 0L; var absSum = 0L
          var k = s
          while (k < e) {
            val v = (bytes(off + k) & 0xff) - 128
            energy += v.toLong * v; absSum += math.abs(v).toLong
            if (k + 1 < e) {
              val w = (bytes(off + k + 1) & 0xff) - 128
              if ((v < 0) != (w < 0)) zc += 1
            }
            k += 1
          }
          val mean = BigDecimal(absSum.toDouble / (e - s) / 127.0)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          Row(id, j, (e - s).toLong, zc, energy, mean)
        }
      }
    }(enc).orderBy("doc_id", "win")
  }

  /** Shared oracle CTEs: the WAV sample stream recomputed from the
    * synthesis arithmetic — text UTF-8 BYTES at (2k+1) mod n, matching
    * the Spark side's `text.cast("binary")` exactly (bytes, never code
    * points: a non-ASCII document diverges under character semantics),
    * windowed by the integer slice boundaries. Bytes are extracted via
    * hex(text::BLOB) two-nibble parsing; n = 0 yields the synthesizer's
    * all-zero sample stream instead of a (2k+1) % 0 division. */
  private lazy val audioCtes: String =
    s"""h AS (SELECT doc_id, hex(text::BLOB) AS hx,
                     octet_length(text::BLOB) AS n FROM documents),
        d AS (SELECT doc_id, n, $byteListSql AS cs FROM h),
        p AS (SELECT doc_id, n, 64 + n % 193 AS ns, cs FROM d),
        smp AS (SELECT doc_id, ns, k.k AS k,
                       (CASE WHEN n = 0 THEN 0
                             ELSE cs[((2 * k.k + 1) % n) + 1] END) - 128 AS v,
                       (CASE WHEN k.k >= (1 * ns) // $AudioWindows THEN 1 ELSE 0 END +
                        CASE WHEN k.k >= (2 * ns) // $AudioWindows THEN 1 ELSE 0 END +
                        CASE WHEN k.k >= (3 * ns) // $AudioWindows THEN 1 ELSE 0 END) AS win
                FROM p, unnest(generate_series(0, CAST(ns - 1 AS BIGINT))) k(k))"""

  private lazy val audioMetaOracle: String =
    s"""WITH m AS (SELECT doc_id, octet_length(text::BLOB) AS n FROM documents),
          p AS (SELECT doc_id, 64 + n % 193 AS ns FROM m)
        SELECT doc_id, CAST(44 + ns + ns % 2 AS BIGINT) AS byte_len,
               CAST(${WavPayload.SampleRate} AS INT) AS sample_rate,
               CAST(ns AS BIGINT) AS n_samples,
               CAST(ns * 1000 // ${WavPayload.SampleRate} AS BIGINT) AS duration_ms
        FROM p ORDER BY doc_id"""

  private lazy val audioFeatOracle: String =
    s"""WITH $audioCtes,
          zc AS (SELECT a.doc_id, a.win, count(*) AS z
                 FROM smp a JOIN smp b ON a.doc_id = b.doc_id
                   AND b.k = a.k + 1 AND b.win = a.win
                 WHERE (a.v < 0) <> (b.v < 0) GROUP BY 1, 2)
        SELECT s.doc_id, CAST(s.win AS INT) AS win,
               count(*)::BIGINT AS n_samples,
               coalesce(any_value(zc.z), 0)::BIGINT AS zero_crossings,
               sum(s.v * s.v)::BIGINT AS energy,
               round(sum(abs(s.v))::DOUBLE / count(*) / 127.0, 6) AS mean_abs
        FROM smp s LEFT JOIN zc ON s.doc_id = zc.doc_id AND s.win = zc.win
        GROUP BY s.doc_id, s.win ORDER BY s.doc_id, s.win"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("mm_dedup_phash", mmDedupPhash, Some(phashOracle)),
    QueryDef("mm_audio_metadata", audioMetadata, Some(audioMetaOracle)),
    QueryDef("mm_audio_features", audioFeatures, Some(audioFeatOracle)),
    QueryDef("mm_phash_cluster", mmPhashCluster, Some(phashClusterOracle)),
    QueryDef("mm_pipeline", mmPipeline, Some(mmPipelineOracle)),
    // Oracles recompute the expected values from the public payload-
    // synthesis arithmetic (never by parsing), so the Spark side's
    // REAL byte-format parse is verified against an independent
    // derivation.
    QueryDef("mm_metadata", (s, d) => metadata(s, d), Some(
      """WITH m AS (SELECT doc_id, octet_length(text::BLOB) AS n FROM documents),
             d AS (SELECT doc_id, 8 + n % 9 AS w, 8 + n % 7 AS h, 1 + n % 4 AS nf FROM m)
         SELECT doc_id,
                CAST(nf * (9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR)) + w * h * 3) AS BIGINT) AS byte_len,
                CAST(w AS INT) AS width, CAST(h AS INT) AS height,
                CAST(nf AS INT) AS frames
         FROM d ORDER BY doc_id""")),
    QueryDef("mm_frames", (s, d) => frames(s, d), Some(
      """SELECT doc_id, f AS frame_no,
                md5(CAST(doc_id AS VARCHAR) || '_' || CAST(f AS VARCHAR)) AS frame_key
         FROM (SELECT doc_id, 1 + octet_length(text::BLOB) % 4 AS nf FROM documents),
              unnest(generate_series(0, CAST(nf - 1 AS BIGINT))) AS u(f)
         ORDER BY doc_id, frame_no""")),
    QueryDef("mm_features", (s, d) => features(s, d), Some(
      s"""WITH $featCtes
          SELECT doc_id, CAST(j AS INT) AS feat_no, v AS value
          FROM f ORDER BY doc_id, feat_no""")),
    QueryDef("mm_resize", (s, d) => resizePlan(s, d), Some(
      s"""WITH m AS (SELECT doc_id,
                            CAST(8 + octet_length(text::BLOB) % 9 AS INT) AS width,
                            CAST(8 + octet_length(text::BLOB) % 7 AS INT) AS height
                     FROM documents)
          SELECT doc_id, width, height,
                 CAST(width * $ResizeTarget // greatest(width, height) AS INT) AS out_w,
                 CAST(height * $ResizeTarget // greatest(width, height) AS INT) AS out_h,
                 CAST(CAST(width * $ResizeTarget // greatest(width, height) AS BIGINT) *
                      CAST(height * $ResizeTarget // greatest(width, height) AS BIGINT) * 3 AS BIGINT) AS est_bytes
          FROM m WHERE width > 0 AND height > 0 ORDER BY doc_id""")),
  )
}
