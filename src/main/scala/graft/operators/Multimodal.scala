package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.textops

/** Training-data multimodal plumbing (SURVEY §2, m1–m3).
  *
  * Models the reference's wide LAION row — opaque payload bytes plus
  * typed metadata (`process.py` carries width/height/exif beside the
  * embedding) — as Spark columns: payload is `binary`, metadata is a
  * typed struct, and "decode" is a clearly-marked deterministic STUB
  * (no image libs in this environment). What is real and load-bearing
  * for 100 TB: the schema (binary + struct), the per-partition batch
  * decode path ([[decodeImages]] — the Scala twin of a
  * `mapInPandas` decode), and the fact that metadata extraction is pure
  * codegen'd column work that never materialises the payload twice.
  */
object Multimodal {

  /** Typed metadata the "decoder" yields. */
  case class ImageMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
    channels: Int, format: String)

  /** Scala twin of [[textops.hash60]] (md5 hex prefix → 60-bit long)
    * for use outside the expression tree. */
  private def hash60(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString.substring(0, 15), 16)

  /** STUB decode: derives deterministic fake dimensions from
    * hash60(payload‖suffix) — the SAME formulas as [[binaryMeta]]'s
    * expression path, so the two paths agree bit for bit (unit-tested).
    * A real deployment swaps `decodeOne` for an actual image decode
    * (e.g. javax.imageio / JNI) — the partition-batched call pattern,
    * schema and shuffle behavior stay identical. */
  private[operators] def decodeOne(docId: Long, payload: Array[Byte]): ImageMeta = {
    // ??? <- real decode goes here; deterministic fake below
    val text = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
    ImageMeta(docId, payload.length,
      width = (64 + hash60(text + "|w") % 1856).toInt,
      height = (64 + hash60(text + "|h") % 1016).toInt,
      channels = (1 + hash60(text + "|c") % 4).toInt,
      format = if (docId % 3 == 0) "png" else if (docId % 3 == 1) "jpeg" else "webp")
  }

  /** Batch decode over (doc_id, payload) rows — one decoder instance
    * per partition, rows streamed through it (the mapInPandas shape:
    * amortised per-batch setup, no per-row driver involvement). */
  def decodeImages(payloads: Dataset[(Long, Array[Byte])]): Dataset[ImageMeta] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      // per-partition decoder setup would go here (model load, etc.)
      it.map { case (id, bytes) => decodeOne(id, bytes) }
    }
  }

  /** m1: binary payload + typed metadata extraction, all-expression
    * form (the driver-gated, oracle-checked path). The payload is the
    * utf-8 bytes of the text (a stand-in for image bytes); metadata is
    * hash-derived via [[textops.hash60]] with the SAME formulas as
    * [[decodeOne]], so DuckDB reproduces it and the mapPartitions
    * decode path yields identical rows (unit-tested). */
  def binaryMeta(docs: DataFrame): DataFrame = {
    val payload = col("text").cast("binary")
    docs
      .select(col("doc_id"), payload.as("payload"))
      .withColumn("meta", struct(
        length(col("payload")).as("n_bytes"),
        (lit(64) + textops.hash60(concat(col("payload").cast("string"), lit("|w"))) % 1856).as("width"),
        (lit(64) + textops.hash60(concat(col("payload").cast("string"), lit("|h"))) % 1016).as("height"),
        (lit(1) + textops.hash60(concat(col("payload").cast("string"), lit("|c"))) % 4).as("channels"),
        when(col("doc_id") % 3 === 0, "png")
          .when(col("doc_id") % 3 === 1, "jpeg")
          .otherwise("webp").as("format")))
      .select(col("doc_id"),
        col("meta.n_bytes").as("n_bytes"),
        col("meta.width").as("width"),
        col("meta.height").as("height"),
        col("meta.channels").as("channels"),
        col("meta.format").as("format"))
      .orderBy(col("doc_id"))
  }

  def m1Query(s: SparkSession, d: String): DataFrame =
    binaryMeta(Tables.documents(s, d))

  /** Resize target: longest side capped at this, aspect preserved. */
  val ResizeMax = 256

  /** m2: resize planning — the pure-metadata half of an image resize
    * (the pixel work is the stubbed decode's concern; the SHAPE math —
    * aspect-preserving integer scaling, which partition the work rides
    * in, the output schema — is engine-side and exact). Downscale only:
    * images already within bounds pass through. Integer arithmetic
    * (`new_w = w·256 div longest`) so both engines agree bit-for-bit. */
  def resizePlan(docs: DataFrame): DataFrame =
    binaryMeta(docs)
      .select(col("doc_id"), col("width"), col("height"))
      .withColumn("longest", greatest(col("width"), col("height")))
      .select(col("doc_id"), col("width"), col("height"),
        when(col("longest") <= ResizeMax, col("width"))
          .otherwise(expr(s"(width * $ResizeMax) div longest")).as("new_w"),
        when(col("longest") <= ResizeMax, col("height"))
          .otherwise(expr(s"(height * $ResizeMax) div longest")).as("new_h"))
      .orderBy(col("doc_id"))

  def m2Query(s: SparkSession, d: String): DataFrame =
    resizePlan(Tables.documents(s, d))

  /** Frame-sampling stride (every Nth frame of the fake "video"). */
  val FrameStride = 30

  /** m3: frame sampling — treat the payload as an opaque video whose
    * frame count derives from the content hash (stub, like m1's
    * decode), emit one row per sampled frame index. The plumbing that
    * matters at 100 TB is real: a generator (explode of a computed
    * `sequence`) that multiplies rows WITHOUT materialising frames,
    * keyed so downstream per-frame decode work partitions evenly. */
  def frameSample(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        (lit(1) + textops.hash60(concat(col("text"), lit("|frames"))) % 300)
          .as("n_frames"))
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1,
          lit(FrameStride))).as("frame_idx"))
      .orderBy(col("doc_id"), col("frame_idx"))

  def m3Query(s: SparkSession, d: String): DataFrame =
    frameSample(Tables.documents(s, d))

  val oracles: Map[String, String] = Map(
    "m1_binary_meta" ->
      s"""SELECT doc_id,
         |  octet_length(text::BLOB)::INTEGER AS n_bytes,
         |  64 + ${textops.hash60Sql("text || '|w'")} % 1856 AS width,
         |  64 + ${textops.hash60Sql("text || '|h'")} % 1016 AS height,
         |  1 + ${textops.hash60Sql("text || '|c'")} % 4 AS channels,
         |  CASE WHEN doc_id % 3 = 0 THEN 'png'
         |       WHEN doc_id % 3 = 1 THEN 'jpeg'
         |       ELSE 'webp' END AS format
         |FROM documents ORDER BY doc_id""".stripMargin,
    "m2_resize" ->
      s"""WITH m AS (
         |  SELECT doc_id,
         |    64 + ${textops.hash60Sql("text || '|w'")} % 1856 AS width,
         |    64 + ${textops.hash60Sql("text || '|h'")} % 1016 AS height
         |  FROM documents),
         |g AS (SELECT *, greatest(width, height) AS longest FROM m)
         |SELECT doc_id, width, height,
         |  CASE WHEN longest <= $ResizeMax THEN width
         |       ELSE (width * $ResizeMax) // longest END AS new_w,
         |  CASE WHEN longest <= $ResizeMax THEN height
         |       ELSE (height * $ResizeMax) // longest END AS new_h
         |FROM g ORDER BY doc_id""".stripMargin,
    "m3_frame_sample" ->
      s"""WITH f AS (
         |  SELECT doc_id,
         |    1 + ${textops.hash60Sql("text || '|frames'")} % 300 AS n_frames
         |  FROM documents)
         |SELECT doc_id, n_frames, unnest(range(0, n_frames, $FrameStride)) AS frame_idx
         |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
