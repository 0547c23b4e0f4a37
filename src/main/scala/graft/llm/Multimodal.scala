package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Multimodal-column plumbing: media payloads as opaque `binary`
  * columns with typed metadata, decoded per-partition in typed Scala.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB (`fakeDecode`) — what is REAL and
  * tested is the Spark-side plumbing a 100 TB media pipeline needs:
  * binary column schema, per-partition batched processing via
  * `mapPartitions` on a typed Dataset (one decoder init per partition,
  * not per row — the pattern a JNI codec would require), and an
  * explicit output schema carried by case-class Encoders.
  *
  * `fakeDecode` is pure arithmetic on the payload bytes, so the whole
  * pipeline still has a DuckDB oracle — the stub is verified
  * end-to-end even though no real codec runs.
  */
object Multimodal {

  /** Typed metadata record produced by the decode stage. */
  final case class MediaMeta(
      doc_id: Long, n_bytes: Long, width: Long, height: Long, format: String)

  /** STUB decoder — stands in for e.g. an image codec. Deterministic
    * arithmetic on payload length + first byte; replace with a real
    * codec binding in production. */
  def fakeDecode(docId: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    val first = if (payload.isEmpty) 0L else (payload(0) & 0xFFL)
    val fmt = (n % 3) match {
      case 0 => "png"
      case 1 => "jpeg"
      case _ => "webp"
    }
    MediaMeta(docId, n, 64L + n % 577L, 64L + first % 481L, fmt)
  }

  /** documents.text reinterpreted as a binary media payload →
    * per-partition decode → typed metadata table. */
  def decodePipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init point (real codecs allocate here, once)
        it.map { case (id, payload) => fakeDecode(id, payload) }
      }
      .toDF()
      .orderBy("doc_id")
  }

  val decode: Q = Q(
    "q_multimodal_decode",
    (s, dir) => decodePipeline(s, dir),
    // ascii corpus → octet length == char length; mirror of fakeDecode
    Some("""
      SELECT doc_id,
             CAST(strlen(text) AS BIGINT) AS n_bytes,
             CAST(64 + strlen(text) % 577 AS BIGINT) AS width,
             CAST(64 + (CASE WHEN strlen(text) = 0 THEN 0
                             ELSE ascii(substr(text, 1, 1)) END) % 481 AS BIGINT) AS height,
             CASE CAST(strlen(text) % 3 AS INT) WHEN 0 THEN 'png'
                  WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format
      FROM documents ORDER BY doc_id"""))

  val all: Seq[Q] = Seq(decode)
}
