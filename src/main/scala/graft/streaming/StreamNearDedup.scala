package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming NEAR-deduplication — d4/d6's SimHash semantics at
  * ingestion time (where `StreamDedup` is d1's exact rule). Each
  * arriving doc gets the SAME 60-bit SimHash as the batch operator
  * (word-hash bit votes; `StreamNearDedupSpec` pins streaming ≡ batch
  * bit-for-bit), is routed to its low-15-bit LSH band bucket, and is
  * Hamming-checked against the signatures seen in that bucket within
  * the watermark via `flatMapGroupsWithState`.
  *
  * One LSH table, by design: the batch operator (d6) joins on ANY of 4
  * bands; a stream keyed on one band is the standard single-table
  * online LSH index — run L=4 parallel queries keyed on each band and
  * union the flags for d6-recall parity (each table's state stays
  * band-partitioned and watermark-bounded either way). A doc's flag
  * carries the matched original and the Hamming distance, so the
  * downstream sink can drop, link, or count.
  *
  * State per bucket = (doc_id, signature, event-time) triples inside
  * the watermark — 24 bytes/doc, never text — pruned on every
  * invocation against the current watermark AND reclaimed by event-time
  * timeout when a bucket goes quiet. Unbounded `dropDuplicates` state
  * would OOM a 100 TB stream; this is the bounded form.
  */
object StreamNearDedup {

  val HammingMax = 8
  val BandMask = 32767L

  /** Per-word 60-bit hash — identical to batch `Dedup.bitVotes`
    * (md5-derived, engine-portable).
    */
  private def wordHash(w: Column): Column =
    conv(substring(md5(w.cast("binary")), 1, 15), 16, 10).cast("long")

  /** The 60-bit SimHash as a pure per-row projection (no explode, no
    * aggregate exchange — streaming-safe): per-bit ±1 votes summed over
    * the doc's word-hash list with `aggregate`, sign → bit. Word
    * multiplicity counts, exactly as the batch op's non-distinct words
    * frame.
    */
  def simhashCol(text: Column): Column = {
    val ths = transform(split(lower(text), "\\s+"), wordHash(_))
    (0 until 60).map { b =>
      val vote = aggregate(ths, lit(0L), (acc, th) =>
        acc + when(shiftright(th, b).bitwiseAND(lit(1L)) === 1L, lit(1L))
          .otherwise(lit(-1L)))
      when(vote >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  // carries the WATERMARKED timestamp column itself — projecting it
  // away (e.g. to epoch millis) silently detaches the watermark and
  // event-time timeout refuses to plan
  case class DocSig(bucket: Long, docId: Long, ts: java.sql.Timestamp, sv: Long)
  /** dupOf = -1 when the doc is the first of its neighborhood. */
  case class Flag(docId: Long, dupOf: Long, hamming: Int)
  /** [[Flag]] + the doc's event time, for downstream stateful stages. */
  case class FlagTs(
      docId: Long, dupOf: Long, hamming: Int, ts: java.sql.Timestamp)
  case class BucketState(seen: List[(Long, Long, Long)]) // (docId, sv, tsMillis)

  /** The shared bucket scan: prune state to the watermark, process the
    * micro-batch in (event time, doc id) order (arrival order is
    * nondeterministic — this makes flags replay-stable), flag each doc
    * against the closest in-state signature, update state + timeout.
    * Returns each doc WITH its flag so callers choose the output shape
    * ([[update]] drops the timestamp; [[updateTs]] keeps it for the
    * composed windowed stage downstream).
    */
  private def scanBucket(
      docs: Iterator[DocSig],
      state: GroupState[BucketState]): Seq[(DocSig, Flag)] = {
    val wm = state.getCurrentWatermarkMs()
    val kept = state.getOption.map(_.seen).getOrElse(Nil)
      .filter(_._3 >= wm)
    val batch = docs.toSeq.sortBy(d => (d.ts.getTime, d.docId))
    var seen = kept
    val flags = batch.map { d =>
      val hit = seen
        .map { case (id, sv, _) => (java.lang.Long.bitCount(d.sv ^ sv), id) }
        .filter(_._1 <= HammingMax)
        .sortBy(identity).headOption
      seen = (d.docId, d.sv, d.ts.getTime) :: seen
      d -> hit.fold(Flag(d.docId, -1L, 0)) {
        case (h, id) => Flag(d.docId, id, h)
      }
    }
    state.update(BucketState(seen))
    // reclaim the bucket once its newest entry ages past the watermark
    state.setTimeoutTimestamp(seen.map(_._3).max, "1 minute")
    flags
  }

  def update(
      bucket: Long,
      docs: Iterator[DocSig],
      state: GroupState[BucketState]): Iterator[Flag] = {
    if (state.hasTimedOut) {
      // quiet bucket: every entry is older than the watermark now
      state.remove()
      Iterator.empty
    } else scanBucket(docs, state).map(_._2).iterator
  }

  /** [[update]] with the event time kept on the output row — the form
    * a downstream stateful stage (windowed aggregation) can consume.
    */
  def updateTs(
      bucket: Long,
      docs: Iterator[DocSig],
      state: GroupState[BucketState]): Iterator[FlagTs] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else scanBucket(docs, state).map { case (d, f) =>
      FlagTs(f.docId, f.dupOf, f.hamming, d.ts)
    }.iterator
  }

  /** docs: streaming frame with (doc_id, `eventTimeCol` timestamp,
    * text). Emits one Flag per doc in append mode.
    */
  def apply(docs: DataFrame, eventTimeCol: String, delay: String): Dataset[Flag] = {
    implicit val enc = Encoders.product[Flag]
    implicit val senc = Encoders.product[BucketState]
    docs
      .withColumn("sv", simhashCol(col("text")))
      .withWatermark(eventTimeCol, delay)
      .select(
        col("sv").bitwiseAND(lit(BandMask)).as("bucket"),
        col("doc_id").as("docId"),
        col(eventTimeCol).as("ts"),
        col("sv"))
      .as[DocSig](Encoders.product[DocSig])
      .groupByKey(_.bucket)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** [[apply]] with the event time carried through — the composable
    * form [[StreamDedupSketch]] chains a windowed aggregation onto.
    */
  def withTime(
      docs: DataFrame, eventTimeCol: String,
      delay: String): Dataset[FlagTs] = {
    implicit val enc = Encoders.product[FlagTs]
    implicit val senc = Encoders.product[BucketState]
    docs
      .withColumn("sv", simhashCol(col("text")))
      .withWatermark(eventTimeCol, delay)
      .select(
        col("sv").bitwiseAND(lit(BandMask)).as("bucket"),
        col("doc_id").as("docId"),
        col(eventTimeCol).as("ts"),
        col("sv"))
      .as[DocSig](Encoders.product[DocSig])
      .groupByKey(_.bucket)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(updateTs)
  }
}
