package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming conversion-latency histogram rows — w16's semantics (the
  * EXACT as-of click→purchase gap, power-of-two bucketed) computed at
  * ingestion time, completing the asof family's batch↔streaming
  * symmetry (w4's interval-join relaxation lives in StreamJoin; this
  * is the exact single-latest-click operator it relaxes).
  *
  * A purchase's as-of click is the LAST click at-or-before it in the
  * (tus, kind, event_id) total order (same-µs clicks count — w4's
  * "ASOF >=" tiebreak, kind 0 before kind 1). That answer is FINAL
  * only once the watermark passes the purchase's time: until then a
  * late click can still land between the current best and the
  * purchase. So purchases buffer until `wm > p.tus` (the
  * StreamTransitions finality discipline), then emit exactly once
  * with their gap and bucket; the downstream aggregation (a plain
  * `groupBy(bucket).count`, or the batch fold in the spec) owns the
  * histogram — the same operator/agg separation w14's streaming twin
  * has.
  *
  * Bounded state: the events-at-or-above-the-watermark buffer (the
  * interval-join horizon) plus ONE collapsed best click — every click
  * strictly behind the watermark is dominated by the latest of them
  * for every purchase that can still arrive (future rows have
  * tus ≥ wm), so they fold into a single (tus, event_id) pair. That
  * pair is retained indefinitely: the batch operator's look-back is
  * unbounded, so a purchase years after the last click still
  * attributes to it — per-user state is O(1 + horizon), never event
  * history.
  */
object StreamLatency {

  case class Ev(userId: Long, ts: java.sql.Timestamp, eventId: Long,
      kind: Long)
  case class BufEv(tus: Long, eventId: Long, kind: Long)
  case class St(bestTus: Long, bestId: Long, hasBest: Boolean,
      buf: List[BufEv])
  case class Lat(userId: Long, purchaseId: Long, purchaseTus: Long,
      clickId: Long, clickTus: Long, gapSec: Long, bucketPow: Long)

  /** Exact power-of-two bucket: the binary-digit count of the clamped
    * gap minus one — `length(bin(greatest(gap_sec, 1))) - 1` in batch
    * w16, `63 - numberOfLeadingZeros` here; identical on every long.
    */
  def bucketPow(gapSec: Long): Long =
    63L - java.lang.Long.numberOfLeadingZeros(math.max(gapSec, 1L))

  def update(
      userId: Long,
      evs: Iterator[Ev],
      state: GroupState[St]): Iterator[Lat] = {
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val prev = state.getOption.getOrElse(St(0L, 0L, hasBest = false, Nil))
    val incoming = evs
      .map(e => BufEv(e.ts.getTime * 1000L, e.eventId, e.kind))
      .filter(_.tus >= wmUs) // defense-in-depth; Spark drops these
    val all = (prev.buf ++ incoming).distinct
      .sortBy(e => (e.tus, e.kind, e.eventId))
    // events strictly behind the watermark are FINAL: process them in
    // the batch total order, folding clicks into the best pair and
    // emitting each purchase against the best at its position
    val (fin, rest) = all.partition(_.tus < wmUs)
    var (bTus, bId, has) = (prev.bestTus, prev.bestId, prev.hasBest)
    val out = List.newBuilder[Lat]
    fin.foreach { e =>
      if (e.kind == 0L) { bTus = e.tus; bId = e.eventId; has = true }
      else if (has) {
        val gapSec = (e.tus - bTus) / 1000000L
        out += Lat(userId, e.eventId, e.tus, bId, bTus, gapSec,
          bucketPow(gapSec))
      } // a purchase with no prior click has no as-of row (w4 drops it)
    }
    if (rest.isEmpty && !has) {
      if (state.exists) state.remove()
    } else {
      state.update(St(bTus, bId, has, rest))
      // wake when the watermark passes the newest buffered event so
      // tail purchases emit even if the user goes quiet; a best-only
      // state needs no timeout (it waits for the user's next event)
      if (rest.nonEmpty)
        state.setTimeoutTimestamp(
          math.max(rest.map(_.tus).max / 1000L + 1L, wmUs / 1000L + 1L))
    }
    out.result().iterator
  }

  /** events: streaming frame with (user_id, `eventTimeCol` timestamp,
    * event_id, event_type ∈ {click, purchase, …}). Emits each
    * finalized conversion exactly once with its exact gap and
    * power-of-two bucket.
    */
  def apply(events: DataFrame, eventTimeCol: String, delay: String)
      : Dataset[Lat] = {
    implicit val enc = Encoders.product[Lat]
    implicit val senc = Encoders.product[St]
    events
      .withWatermark(eventTimeCol, delay)
      .filter(col("event_type").isin("click", "purchase"))
      .select(
        col("user_id").as("userId"),
        col(eventTimeCol).as("ts"),
        col("event_id").as("eventId"),
        when(col("event_type") === "click", 0L).otherwise(1L).as("kind"))
      .as[Ev](Encoders.product[Ev])
      .groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
