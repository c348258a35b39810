package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming session PATH signatures — batch w20's per-session form:
  * each session emits its truncated click-path ("view>click>purchase",
  * first [[PathLen]] events in event-time order) the moment the
  * watermark closes it. Batch w20's top-N table is the downstream
  * COUNT of exactly these rows (the w13/w18 twin argument: a global
  * ranking is unrankable on a stream; the per-session signature feed
  * is what path-mining consumers actually ingest).
  *
  * Rides the native `session_window` operator with
  * [[StreamSessions.GapDuration]]'s +1µs gap (same boundary algebra
  * as batch w20's gap-split, pinned there), and the path is ordered
  * by an `array_sort` over (tus, event_id) structs INSIDE the
  * aggregation — arrival order never matters, the A7 discipline.
  * State per open session = at most PathLen+ buffered (tus, id, type)
  * structs plus the count; the truncation happens at emission.
  */
object StreamPaths {

  val PathLen: Int = graft.queries.EventWindows.PathLen

  /** events: streaming frame with (user_id, event_id, event_type,
    * `timeCol` timestamp). Emits one row per CLOSED session:
    * (user_id, session_start_us, path, path_len, n_events) — batch
    * w20's pre-ranking rows keyed by the stable (user, start)
    * identity.
    */
  def apply(events: DataFrame, timeCol: String, delay: String): DataFrame =
    events
      .withWatermark(timeCol, delay)
      .groupBy(
        col("user_id"),
        session_window(col(timeCol), StreamSessions.GapDuration))
      .agg(
        min(unix_micros(col(timeCol))).as("session_start_us"),
        array_join(
          transform(
            slice(
              array_sort(collect_list(struct(
                unix_micros(col(timeCol)).as("tus"),
                col("event_id"), col("event_type")))),
              1, PathLen),
            x => x.getField("event_type")),
          ">").as("path"),
        count(lit(1)).as("n_events"))
      .select(
        col("user_id"), col("session_start_us"), col("path"),
        least(col("n_events"), lit(PathLen.toLong)).as("path_len"),
        col("n_events"))
}
