package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming point-in-time (PIT) dimension enrichment — batch w22 at
  * ingestion time, the last asof-family streaming twin (batch w17/w22
  * and stream w4/w16 exist): each arriving purchase fact joins the
  * SCD2 dimension version (w21's frame, or the [[graft.sources.DeltaScd2]]
  * table) in effect STRICTLY BEFORE its own event time — "what state
  * was the user in when they bought", evaluated as facts arrive.
  *
  * Why this is a STREAM-STATIC join, not stateful: SCD2 validity
  * intervals PARTITION each user's timeline, so "greatest valid_from
  * ≤ t−1µs" (the as-of rule) is EXACTLY "the interval containing
  * t−1µs" — a 1:1 containment predicate, no aggregation, no ranking.
  * Spark runs stream-static inner joins statelessly per micro-batch:
  * the dimension is the broadcast-able static side, each fact row
  * joins once and emits once, and arrival ORDER is irrelevant because
  * the predicate reads only the fact's own EVENT time — a late fact
  * still lands on its true historical version, never the
  * arrival-time one (pinned in `StreamPitSpec`). Facts whose user has
  * no version open before them drop (inner join) — batch w22's rule.
  *
  * Scale shape: per micro-batch one broadcast/hash join against the
  * dimension snapshot; ZERO streaming state (no watermark needed for
  * correctness — one is still accepted to bound any upstream
  * stateful stage). The dimension refreshes by restarting the query
  * against the new snapshot — the standard stream-static contract
  * (Spark re-plans the static side per restart, not per batch).
  */
object StreamPit {

  /** `facts`: streaming (user_id, event_id, `timeCol` timestamp).
    * `dim`: STATIC w21-shaped frame (user_id, version, event_type,
    * valid_from_us, valid_to_us with −1 = open, is_current,
    * n_events). Emits batch w22's row shape: (user_id, purchase_id,
    * purchase_us, version, state_type, state_n).
    */
  def apply(facts: DataFrame, dim: DataFrame, timeCol: String): DataFrame = {
    val versions = dim.select(
      col("user_id").as("v_user"),
      col("version"),
      col("event_type").as("state_type"),
      col("valid_from_us"),
      col("valid_to_us"),
      col("n_events").as("state_n"))
    val f = facts.select(
      col("user_id"),
      (expr(s"unix_micros($timeCol)") - 1L).as("asof_us"),
      col("event_id").as("purchase_id"),
      expr(s"unix_micros($timeCol)").as("purchase_us"))
    f.join(
      versions,
      col("user_id") === col("v_user") &&
        col("valid_from_us") <= col("asof_us") &&
        (col("valid_to_us") === lit(-1L) ||
          col("asof_us") < col("valid_to_us")))
      .select(
        col("user_id"), col("purchase_id"), col("purchase_us"),
        col("version"), col("state_type"), col("state_n"))
  }
}
