package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization — batch w3's gap-split sessions computed
  * at ingestion time on Spark's NATIVE `session_window` aggregation
  * (the merging-window stateful operator), completing the
  * batch↔streaming symmetry for the one window family that had no
  * streaming twin (tumbling/sliding/OHLC/dedup/joins all have one).
  *
  * Semantics alignment, pinned by the spec: batch w3 starts a NEW
  * session when `tus - prev_tus > SessionGapSec` — i.e. two events
  * exactly one gap apart still MERGE. Spark's `session_window` merges
  * windows that OVERLAP (`next.start < prev.start + gap`), which
  * splits the exact-gap pair. The twin therefore runs with a gap of
  * `SessionGapSec + 1µs`, making the merge condition
  * `next - prev ≤ SessionGapSec` at the data's microsecond
  * granularity — bit-identical session boundaries to batch w3.
  *
  * Scale/state shape: state is one (start, end, count) triple per OPEN
  * session per user — bounded by the watermark (a session whose
  * end + delay is behind the watermark emits and is evicted; Spark's
  * session operator merges co-partitioned candidate windows per key,
  * so arrival order never matters). No per-event state is retained,
  * unlike the fMGWS twins — the native operator's merge is the whole
  * point of using it here.
  */
object StreamSessions {

  val GapSec: Long = graft.queries.EventWindows.SessionGapSec // w3's gap

  /** The session_window gap: one microsecond past the batch gap so the
    * half-open overlap test reproduces w3's closed `diff <= gap` merge.
    */
  val GapDuration: String = s"${GapSec * 1000000L + 1L} microseconds"

  /** events: streaming frame with (user_id, `timeCol` timestamp).
    * Emits one row per CLOSED session:
    * (user_id, session_start_us, session_end_us, n_events) — the same
    * shape batch w3 reports (session_id is an arrival-order artifact
    * batch derives from its running sum; the (user, start) pair is the
    * stable session identity, so the twin keys on that instead).
    */
  def apply(events: DataFrame, timeCol: String, delay: String): DataFrame =
    events
      .withWatermark(timeCol, delay)
      .groupBy(col("user_id"), session_window(col(timeCol), GapDuration))
      .agg(
        min(unix_micros(col(timeCol))).as("session_start_us"),
        max(unix_micros(col(timeCol))).as("session_end_us"),
        count(lit(1)).as("n_events"))
      .select(
        col("user_id"), col("session_start_us"),
        col("session_end_us"), col("n_events"))
}
