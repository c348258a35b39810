package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — d1's semantics on an unbounded
  * corpus (the ingestion-time half of the dedup tier: drop exact
  * copies as documents arrive; the LSH near-dup pass stays a batch
  * job over the accumulated corpus).
  *
  * Same fingerprint as the batch operator (md5 of whitespace-normalized
  * lowercase text — 32-byte dedup state per doc, never the text), with
  * `dropDuplicatesWithinWatermark` so the fingerprint state expires:
  * a duplicate arriving within the watermark delay of its original is
  * dropped; state for older fingerprints is reclaimed. Unbounded-state
  * `dropDuplicates` would OOM a 100 TB stream.
  */
object StreamDedup {

  def exactDedup(
      docs: DataFrame, eventTimeCol: String, delay: String): DataFrame =
    docs
      .withColumn(
        "fingerprint",
        md5(regexp_replace(lower(col("text")), "\\s+", " ").cast("binary")))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("fingerprint")
}
