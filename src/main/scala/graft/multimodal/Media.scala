package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-at-a-time per partition.
  *
  * The decode step is STUBBED (this container has no image/audio
  * libraries): `decodeStub` derives deterministic pseudo-pixels from the
  * bytes. Everything around it — the schema, the per-partition batch
  * shape (`mapPartitions`, the Scala analog of `mapInPandas`), the
  * explode of frames, partition preservation — is real and tested.
  *
  * 100 TB posture: media rows never leave their partition; feature
  * extraction is a narrow map (no shuffle); frame sampling is a
  * generator (1 row → k rows) that AQE can rebalance afterwards.
  */
object Media {

  case class MediaRow(
      media_id: Long,
      kind: String,               // "image" | "audio" | "video"
      bytes: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int)

  case class MediaFeature(
      media_id: Long,
      kind: String,
      feature: Array[Float])

  case class Frame(
      media_id: Long,
      frame_index: Int,
      frame_bytes: Array[Byte])

  /** The stubbed decoder: real implementations would call an image/audio
    * codec here (the `???` boundary); the stub hashes the bytes into a
    * deterministic fixed-size "pixel" buffer so the pipeline around it
    * is exercised end-to-end.
    */
  def decodeStub(bytes: Array[Byte], outLen: Int = 64): Array[Byte] = {
    val out = new Array[Byte](outLen)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    i = 0
    while (i < outLen) {
      h ^= h << 13; h ^= h >>> 7; h ^= h << 17
      out(i) = (h & 0xff).toByte
      i += 1
    }
    out
  }

  /** Feature extraction over decoded media: per-partition batch loop
    * (the mapInPandas shape — one iterator in, one iterator out, no
    * per-row closure dispatch).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val px = decodeStub(m.bytes)
        // 8-bucket byte histogram, L1-normalized — a stand-in for a
        // real embedding model invoked per batch
        val hist = new Array[Float](8)
        px.foreach(b => hist((b & 0xff) / 32) += 1f)
        val n = px.length.toFloat
        MediaFeature(m.media_id, m.kind, hist.map(_ / n))
      }
    }
  }

  /** Resize: metadata transform + stub re-decode — shape-only here, the
    * codec call is the stubbed boundary.
    */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map(m => m.copy(
      bytes = decodeStub(m.bytes, math.max(1, w * h / 256)),
      width = w, height = h))
  }

  /** Frame sampling: every video row explodes into k evenly-spaced
    * frames (1 → k generator; images/audio pass through as frame 0).
    */
  def sampleFrames(media: Dataset[MediaRow], k: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      if (m.kind == "video")
        (0 until k).map(i =>
          Frame(m.media_id, i, decodeStub(m.bytes ++ Array(i.toByte))))
      else
        Seq(Frame(m.media_id, 0, decodeStub(m.bytes)))
    }
  }

  /** Column-level plumbing demo over any table with a binary column:
    * opaque bytes + derived metadata, no UDF (pure built-ins).
    */
  def withMediaColumns(df: DataFrame, binCol: String): DataFrame =
    df
      .withColumn("n_bytes", octet_length(col(binCol)).cast("long"))
      .withColumn("content_hash", md5(col(binCol)))
}
