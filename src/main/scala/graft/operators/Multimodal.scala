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

  val defs: Seq[QueryDef] = Seq(
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
  )
}
