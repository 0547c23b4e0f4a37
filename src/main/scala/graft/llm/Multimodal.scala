package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Multimodal-column plumbing: media payloads as opaque `binary`
  * columns with typed metadata, decoded per-partition in typed Scala.
  *
  * The container has no image/audio codecs, so the decode /
  * feature-extract steps are clearly-marked deterministic STUBs
  * (`fakeDecode`, `sampleFrames`) — what is REAL and tested is the
  * Spark-side plumbing a 100 TB media pipeline needs: binary column
  * schema, per-partition batched processing via `mapPartitions` on a
  * typed Dataset (one decoder init per partition, not per row — the
  * pattern a JNI codec requires), and explicit output schemas carried
  * by case-class Encoders.
  *
  * The stubs are pure arithmetic on the payload bytes, so both
  * pipelines still have DuckDB oracles — the plumbing is verified
  * end-to-end even though no real codec runs.
  */
object Multimodal {

  /** Typed metadata record produced by the decode+resize stage. */
  final case class MediaMeta(
      doc_id: Long, n_bytes: Long, width: Long, height: Long,
      resized_w: Long, resized_h: Long, format: String)

  /** Sampled-frame record: k evenly-spaced payload probes (stands in
    * for video frame extraction). */
  final case class FrameSample(
      doc_id: Long, f0: Long, f1: Long, f2: Long, f3: Long)

  /** STUB decoder — stands in for e.g. an image codec. Deterministic
    * arithmetic on payload length + first byte; the resize step fits
    * width to 224 preserving aspect ratio (integer math). Replace
    * with a real codec binding in production. */
  def fakeDecode(docId: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    val first = if (payload.isEmpty) 0L else (payload(0) & 0xFFL)
    val w = 64L + n % 577L
    val h = 64L + first % 481L
    val fmt = (n % 3) match {
      case 0 => "png"
      case 1 => "jpeg"
      case _ => "webp"
    }
    MediaMeta(docId, n, w, h, 224L, math.max(1L, h * 224L / w), fmt)
  }

  /** STUB frame sampler — probes 4 evenly spaced payload bytes (a
    * real implementation would decode k frames per video). */
  def sampleFrames(docId: Long, payload: Array[Byte]): FrameSample = {
    val n = payload.length
    def at(i: Int): Long =
      if (n == 0) 0L else (payload((i * n) / 4) & 0xFFL)
    FrameSample(docId, at(0), at(1), at(2), at(3))
  }

  private def payloads(s: SparkSession, dir: String) =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** documents.text reinterpreted as a binary media payload →
    * per-partition decode+resize → typed metadata table. */
  def decodePipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    payloads(s, dir)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init point (real codecs allocate here, once)
        it.map { case (id, payload) => fakeDecode(id, payload) }
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** Frame-sampling pipeline over the same payload column. */
  def framePipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    payloads(s, dir)
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, p) => sampleFrames(id, p) })
      .toDF()
      .orderBy("doc_id")
  }

  val decode: Q = Q(
    "q_multimodal_decode",
    (s, dir) => decodePipeline(s, dir),
    // ascii corpus → octet length == char length; mirror of fakeDecode
    Some("""
      SELECT doc_id,
             CAST(n AS BIGINT) AS n_bytes,
             CAST(w AS BIGINT) AS width,
             CAST(h AS BIGINT) AS height,
             CAST(224 AS BIGINT) AS resized_w,
             CAST(greatest(1, (h * 224) // w) AS BIGINT) AS resized_h,
             CASE CAST(n % 3 AS INT) WHEN 0 THEN 'png'
                  WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format
      FROM (
        SELECT doc_id, strlen(text) AS n,
               64 + strlen(text) % 577 AS w,
               64 + (CASE WHEN strlen(text) = 0 THEN 0
                          ELSE ascii(substr(text, 1, 1)) END) % 481 AS h
        FROM documents
      ) ORDER BY doc_id"""))

  val frames: Q = Q(
    "q_multimodal_frames",
    (s, dir) => framePipeline(s, dir),
    Some("""
      SELECT doc_id,
             CAST(CASE WHEN n = 0 THEN 0 ELSE ascii(substr(text, 1 + (0 * n) // 4, 1)) END AS BIGINT) AS f0,
             CAST(CASE WHEN n = 0 THEN 0 ELSE ascii(substr(text, 1 + (1 * n) // 4, 1)) END AS BIGINT) AS f1,
             CAST(CASE WHEN n = 0 THEN 0 ELSE ascii(substr(text, 1 + (2 * n) // 4, 1)) END AS BIGINT) AS f2,
             CAST(CASE WHEN n = 0 THEN 0 ELSE ascii(substr(text, 1 + (3 * n) // 4, 1)) END AS BIGINT) AS f3
      FROM (SELECT doc_id, text, strlen(text) AS n FROM documents)
      ORDER BY doc_id"""))

  val all: Seq[Q] = Seq(decode, frames)
}
