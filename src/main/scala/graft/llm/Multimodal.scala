package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal column handling (driver mandate SURVEY.md §7.5): media
  * payloads ride as opaque `binary` columns with a typed metadata struct;
  * decode / feature-extract / frame-sample run as partition-wise batch
  * functions over a typed Dataset (the Scala analog of `mapInPandas` —
  * one function call per partition iterator, vectorizable batch shape).
  *
  * The actual codec is STUBBED (no image/audio libraries in this
  * environment): `decodeStub` derives deterministic fake features from the
  * raw bytes. Everything around it — the binary column, the metadata
  * struct, the Encoder-typed partition mapping, the frame-sampling
  * geometry — is real and oracle-checked.
  *
  * Scale: payloads stay opaque bytes end-to-end (no driver collect); the
  * partition function is pipelined with the scan; at 100 TB the media
  * table is size-partitioned so a partition's batch fits executor memory
  * (`spark.sql.files.maxPartitionBytes`).
  */
object Multimodal {

  case class MediaRow(doc_id: Long, content: Array[Byte],
      width: Int, format: String)
  case class MediaFeatures(doc_id: Long, n_bytes: Long, head_hex: String,
      byte_sum: Long, width: Int, format: String)
  case class Frame(doc_id: Long, frame_idx: Int, frame_text: String)

  /** The media table: documents' text bytes standing in for an encoded
    * payload, with typed metadata (what a real pipeline would carry as
    * parquet columns next to the blob). */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      // ASCII contract, enforced not assumed (ADVICE r1): the oracle SQL
      // below is character-based while the decode path is byte-based, so
      // both engines restrict to docs where the two units coincide
      // (byte length == char length ⇔ pure ASCII). A non-ASCII fixture
      // row is excluded on BOTH sides instead of silently hash-diverging.
      .filter(octet_length(col("text")) === length(col("text")))
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("content"),
        col("n_chars").cast(IntegerType).as("width"),
        col("lang").as("format"))
      .as[MediaRow]
  }

  /** ??? in a real deployment: the codec call (JNI image decode, etc.).
    * Here: deterministic fake features over the raw bytes so the plumbing
    * is testable end-to-end. */
  private def decodeStub(r: MediaRow): MediaFeatures = {
    val headHex = r.content.take(8).map("%02x".format(_)).mkString
    var s = 0L
    var i = 0
    while (i < r.content.length) { s += r.content(i) & 0xff; i += 1 }
    MediaFeatures(r.doc_id, r.content.length.toLong, headHex, s, r.width, r.format)
  }

  /** m01 — partition-wise batch decode + feature extraction. */
  def m01DecodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .mapPartitions(_.map(decodeStub))
      .toDF()
      .orderBy(col("doc_id"))
  }

  // Oracle reproduces the fake decode in SQL: byte length, first-8-bytes
  // hex, byte sum (ASCII corpus → unicode code point = byte value).
  val m01Sql: String =
    """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
      |       lower(hex(CAST(substr(text, 1, 8) AS BLOB))) AS head_hex,
      |       CAST((SELECT COALESCE(SUM(unicode(c)), 0)
      |             FROM (SELECT unnest(string_split_regex(text, '')) AS c)
      |             WHERE c <> '') AS BIGINT) AS byte_sum,
      |       CAST(n_chars AS INTEGER) AS width, lang AS format
      |FROM documents WHERE strlen(text) = length(text)
      |ORDER BY doc_id""".stripMargin

  /** m02 — frame sampling: the payload is treated as fixed-size frames
    * (32 bytes); every 3rd frame is materialized — the shape of a video
    * frame-sampler (decode stub: the frame bytes as text). One output row
    * per sampled frame, flatMap'd partition-wise. */
  private val FrameSize = 32
  private val FrameStep = 3

  def m02FrameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .flatMap { r =>
        val nFrames = (r.content.length + FrameSize - 1) / FrameSize
        (0 until nFrames by FrameStep).map { i =>
          val from = i * FrameSize
          val until = math.min(from + FrameSize, r.content.length)
          Frame(r.doc_id, i, new String(r.content.slice(from, until), "UTF-8"))
        }
      }
      .toDF()
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  val m02Sql: String =
    s"""SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
       |       substr(text, i * $FrameSize + 1, $FrameSize) AS frame_text
       |FROM documents, (SELECT unnest(range(0, (SELECT COALESCE(MAX(length(text)), 1) FROM documents) // $FrameSize + 1, $FrameStep)) AS i) r
       |WHERE i * $FrameSize < length(text) AND strlen(text) = length(text)
       |ORDER BY doc_id, frame_idx""".stripMargin
}
