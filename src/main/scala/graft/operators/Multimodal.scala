package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.QueryDef
import graft.sources.Tables

/** Multimodal-column operators: image/audio/video handled as opaque
  * `binary` payloads plus typed metadata, with decode / feature-extract /
  * frame-sample stages (LLM-pipeline north star; no media tables ship in
  * the testdata, so payloads are derived deterministically from
  * `documents.text` — the Spark-side plumbing is real, the codec is a
  * clearly-marked stub).
  *
  * Scale posture: payload bytes stay in executors end to end (binary
  * column → substring/hex expressions or mapPartitions); nothing decodes
  * on the driver, and per-frame explosion is a generator (`explode` of a
  * bounded sequence), not a shuffle.
  */
object Multimodal {
  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** The opaque-media frame: binary payload + typed metadata, the schema a
    * real ingest (S3 image tarballs, audio shards) would carry. */
  def mediaFrame(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(
        element_at(array(lit("png"), lit("jpeg"), lit("wav")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("format"),
        (pmod(col("doc_id"), lit(64)) * 16 + 16).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) * 16 + 16).cast("int").as("height"))
        .as("meta"))

  /** Per-media deterministic fake features — the mapPartitions stage a
    * real pipeline would run a codec in (batched per partition, executor
    * side). The decode itself is a STUB: real byte decoding would replace
    * `fakeDecode`; schema, batching and partitioning are the real thing. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_bytes", IntegerType),
      StructField("checksum", LongType),
      StructField("feature", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (checksum, feature) = fakeDecode(bytes)
        Row(id, bytes.length, checksum, feature)
      }
    }(enc)
  }

  /** STUB codec: a real implementation would parse the container format
    * and run the image/audio decoder here (libs absent in this
    * environment). Deterministic stand-in: FNV-1a checksum + an 8-dim
    * "embedding" derived from byte histogram buckets. */
  private def fakeDecode(bytes: Array[Byte]): (Long, Array[Float]) = {
    var h = 0xcbf29ce484222325L
    val hist = new Array[Float](8)
    bytes.foreach { b =>
      h = (h ^ (b & 0xff)) * 0x100000001b3L
      hist((b & 0xff) % 8) += 1f
    }
    val n = math.max(bytes.length, 1).toFloat
    (h, hist.map(_ / n))
  }

  val queries: Seq[QueryDef] = Seq(

    /** Metadata + header extraction over the binary payload. Byte access
      * is via hex-string slicing, identical in both engines. */
    QueryDef("q50_multimodal_meta",
      """SELECT doc_id AS media_id,
        |octet_length(text::BLOB) AS n_bytes,
        |lower(substr(hex(text::BLOB), 1, 16)) AS header_hex,
        |(octet_length(text::BLOB) + 255) // 256 AS n_frames
        |FROM documents""".stripMargin.replace("\n", " ")) { (s, dir) =>
      mediaFrame(s, dir).select(
        col("media_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        lower(substring(hex(col("payload")), 1, 16)).as("header_hex"),
        floor((length(col("payload")) + 255) / 256).as("n_frames"))
    },

    /** Frame sampling: every 4th 256-byte frame, emitted with a 16-byte
      * frame fingerprint — the shape of video frame-sampling / audio
      * windowing, as a generator explode (no shuffle). */
    QueryDef("q51_frame_sample",
      """SELECT doc_id AS media_id, CAST(f AS BIGINT) AS frame_idx,
        |lower(substr(hex(text::BLOB), CAST(f*512+1 AS BIGINT), 32)) AS frame_hex
        |FROM documents, unnest(range(0, (octet_length(text::BLOB)+255)//256, 4)) AS u(f)
        |""".stripMargin.replace("\n", " ")) { (s, dir) =>
      mediaFrame(s, dir)
        .withColumn("hexp", lower(hex(col("payload"))))
        .withColumn("n_frames",
          floor((length(col("payload")) + 255) / 256).cast("int"))
        .select(col("media_id"), col("hexp"),
          explode(sequence(lit(0), col("n_frames") - 1, lit(4)))
            .as("frame_idx"))
        .select(col("media_id"),
          col("frame_idx").cast("long").as("frame_idx"),
          col("hexp").substr(col("frame_idx") * 512 + 1, lit(32))
            .as("frame_hex"))
    }
  )
}
