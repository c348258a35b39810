package graft.etl

import org.apache.spark.sql.{Dataset, SparkSession}

/** E9/F4 — fixed-size binary chunking (reference `lambda_3.py:93-114`:
  * the MP3 is re-read in `CHUNK_SIZE = 10_000_000`-byte chunks, each
  * uploaded as `chunk_{n}` and fanned out to one Transcribe job).
  *
  * Typed Dataset API with `mapPartitions` (SURVEY §2.8 F4 — per-row
  * imperative byte slicing is exactly the case where the typed API
  * beats an Expression). Chunk numbering is 1-based like the reference
  * (`lambda_3.py:97`). Rows stay in their partition — no shuffle; at
  * 100 TB the downstream per-chunk work parallelizes by repartitioning
  * the (episode, chunk) rows, which is the fan-out the reference got
  * from one-Lambda-per-object.
  */
object Chunker {

  case class Audio(episode_id: Long, bytes: Array[Byte])
  case class AudioChunk(episode_id: Long, chunk_num: Int, bytes: Array[Byte])

  val DefaultChunkSize: Int = 10000000 // lambda_3.py:93

  def chunk(audio: Dataset[Audio], chunkSize: Int = DefaultChunkSize): Dataset[AudioChunk] = {
    import audio.sparkSession.implicits._
    require(chunkSize > 0, "chunkSize must be positive")
    audio.mapPartitions { rows =>
      rows.flatMap { a =>
        if (a.bytes.isEmpty) Iterator.empty
        else a.bytes.grouped(chunkSize).zipWithIndex.map {
          case (slice, i) => AudioChunk(a.episode_id, i + 1, slice)
        }
      }
    }
  }

  /** Inverse (used by specs and the reduce path): reassemble in chunk
    * order — must equal the original bytes.
    */
  def reassemble(chunks: Dataset[AudioChunk]): Dataset[Audio] = {
    import chunks.sparkSession.implicits._
    chunks
      .groupByKey(_.episode_id)
      .mapGroups { (id, it) =>
        val sorted = it.toSeq.sortBy(_.chunk_num)
        Audio(id, sorted.iterator.map(_.bytes).reduceOption(_ ++ _)
          .getOrElse(Array.emptyByteArray))
      }
  }
}
