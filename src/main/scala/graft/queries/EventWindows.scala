package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time windowing over the `events` table — the streaming-shaped
  * semantics the reference's event-driven micro-batches imply
  * (SURVEY.md §2.10), checked in batch form against the DuckDB oracle.
  * The true Structured Streaming variants (watermark + window, stateful
  * barrier) are in `graft.streaming` and spec-tested — a streaming query
  * has no SQL oracle.
  *
  * All time math runs on the exact epoch-µs `tus` axis from
  * `Tables.eventsUs` — schema-adaptive across the physical `ts`
  * encodings (epoch-nanos BIGINT, TIMESTAMP, TIMESTAMP_NTZ), always
  * landing in the same integer µs domain as the oracle's
  * `epoch_us(ts)`; value averages use the integer-cents pattern (see
  * Dashboard.q6).
  */
object EventWindows {

  private val UsPerSec = 1000000L
  val TumbleSec = 300L
  val SlideSec = 300L
  val SlideSizeSec = 600L
  val SessionGapSec = 1800L

  /** Tumbling 5-minute windows per event type: count + exact mean.
    * Batch equivalent of `groupBy(window($"ts", "5 minutes"), ...)`.
    * One hash agg; bucketing is a projection (no pre-shuffle).
    */
  def tumbling(spark: SparkSession, dir: String): DataFrame =
    eventsUs(spark, dir)
      .withColumn(
        "window_start",
        expr(s"tus div ${TumbleSec * UsPerSec}") * TumbleSec)
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .groupBy(col("window_start"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("cents")).as("sum_cents"))
      .select(
        col("window_start"), col("event_type"), col("n_events"),
        (col("sum_cents").cast("double") /
          (lit(100.0) * col("n_events").cast("double"))).as("avg_value"))
      .orderBy(col("window_start"), col("event_type"))

  /** Sliding windows (10-minute size, 5-minute slide): each event lands
    * in 2 windows — the standard explode-over-offsets expansion Spark's
    * `window()` performs internally, written out so the oracle can
    * reproduce it.
    */
  def sliding(spark: SparkSession, dir: String): DataFrame =
    eventsUs(spark, dir)
      .withColumn(
        "bucket",
        expr(s"tus div ${SlideSec * UsPerSec}") * SlideSec)
      .withColumn(
        "window_start",
        explode(array(col("bucket"), col("bucket") - SlideSec)))
      .filter(
        expr(s"tus div $UsPerSec") >= col("window_start") &&
          expr(s"tus div $UsPerSec") < col("window_start") + SlideSizeSec)
      .groupBy(col("window_start"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("window_start"))

  /** Session windows per user (30-minute inactivity gap): the classic
    * lag-flag + running-sum sessionization. Windows are per-user
    * partitions — parallel across users, the 100 TB-safe shape.
    */
  def sessions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, 0)
    eventsUs(spark, dir)
      .withColumn("prev_tus", lag(col("tus"), 1).over(byUser))
      .withColumn(
        "new_session",
        when(
          col("prev_tus").isNull ||
            col("tus") - col("prev_tus") > SessionGapSec * UsPerSec,
          1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(run))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("tus")).as("session_start_us"),
        max(col("tus")).as("session_end_us"),
        count(lit(1)).as("n_events"))
      // r18 opt: checkpointed output sort (operators.SortFirst scaladoc)
      .transform(graft.operators.SortFirst.checkpointedSort(_, col("user_id"), col("session_id")))
  }

  /** w20 path geometry: a session's signature is its first `PathLen`
    * event types; the report keeps the `TopPaths` most common.
    */
  val PathLen = 3
  val TopPaths = 10

  /** w20 — top session-opening paths, the product-analytics flow
    * report (the Sankey/funnel-discovery view: "how do sessions
    * start?"): each w3 session's first `PathLen` event types in the
    * unique (tus, event_id) order, joined `a>b>c`, counted across
    * sessions, top 10 under a total order. Complements w14 (which
    * pairs of ADJACENT events exist) with the session-anchored
    * k-step view a growth team reads.
    *
    * Scale shape: w3's lag-flag + running-sum sessionization (per-user
    * windows — parallel across users), a per-(user, session) rank
    * whose `rnk <= PathLen` filter Spark plans as `WindowGroupLimit`
    * (each task keeps 3 rows per session before the shuffle, the w10
    * shape), the bounded ordered A7 fold (≤ PathLen structs), one
    * path hash agg, and a TakeOrderedAndProject for the top-10 — no
    * session ever holds more than PathLen rows past its group limit.
    */
  def topPaths(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, 0)
    val inSess = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("tus"), col("event_id"))
    eventsUs(spark, dir)
      .withColumn("prev_tus", lag(col("tus"), 1).over(byUser))
      .withColumn(
        "new_session",
        when(
          col("prev_tus").isNull ||
            col("tus") - col("prev_tus") > SessionGapSec * UsPerSec,
          1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(run))
      .withColumn("rnk", row_number().over(inSess))
      .filter(col("rnk") <= PathLen)
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("rnk"), col("event_type")))),
            x => x.getField("event_type")),
          ">").as("path"),
        count(lit(1)).as("path_len"))
      .groupBy(col("path"), col("path_len"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(TopPaths)
  }

  /** w4 — AS-OF join: each purchase matched to the user's most recent
    * click at-or-before it (attribution's "last touch"; the time-series
    * point-in-time join the builder brief names as an operator Spark
    * lacks). Implemented the Spark-native scalable way — NOT a
    * θ-join: union both sides tagged, ONE per-user window pass carries
    * the latest click forward (`last(..., ignoreNulls)` over a trailing
    * frame), purchases read it where they stand. One shuffle by
    * user_id, zero join explosion, linear in events — the same shape at
    * 100 TB. A direct `p.ts >= c.ts` join would be a per-user cross
    * product; the merge-scan formulation is how kdb/Flink/DuckDB
    * implement ASOF natively, here expressed as a partitioned window.
    *
    * Equal-timestamp click⋈purchase pairs count as "before" (ASOF >=):
    * the sort key (tus, kind, event_id) places kind=0 clicks ahead of
    * kind=1 purchases at the same µs. All time math in the µs domain
    * (`ts div 1000`) — the engines' shared exact timestamp resolution.
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = eventsUs(spark, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("tus"), col("event_id"), lit(0L).as("kind"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("tus"), col("event_id"), lit(1L).as("kind"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    clicks.unionByName(purchases)
      .withColumn(
        "click_ev",
        last(
          when(col("kind") === 0L,
            struct(col("tus").as("cus"), col("event_id").as("cid"))),
          ignoreNulls = true).over(w))
      .filter(col("kind") === 1L && col("click_ev").isNotNull)
      .select(
        col("user_id"),
        col("event_id").as("purchase_id"),
        col("tus").as("purchase_us"),
        col("click_ev.cid").as("click_id"),
        col("click_ev.cus").as("click_us"),
        (col("tus") - col("click_ev.cus")).as("gap_us"))
      .orderBy(col("purchase_id"))
  }

  val TrailSec = 600L

  /** w5 — trailing time-INTERVAL aggregates: for every event, the count
    * and exact cents-sum of the same user's events in the preceding 10
    * minutes (inclusive). This is the RANGE frame the registry's other
    * windows don't exercise: w1–w3 bucket into discrete windows and
    * q6/p2 use ROWS frames, but a per-row trailing interval ("events in
    * the last N minutes as of THIS event") needs `rangeBetween` over the
    * event-time axis — the value-based frame Spark plans as a single
    * running `WindowExec` with a sliding lower bound, no self-join.
    *
    * Scale: partitioned by user_id — parallel across users, state per
    * partition is one frame's worth of rows (bounded by event rate ×
    * 10 min), the same shape Structured Streaming keeps for a watermarked
    * sliding aggregate. A time-range self-join formulation would be a
    * per-user cross product; the RANGE frame is linear in events.
    *
    * Exactness: frame bounds are exact integer µs on the shared
    * epoch-µs axis; sums are integer cents (Dashboard.q6 discipline).
    * RANGE peers (same user, same µs) are included symmetrically in
    * both engines — tie order can't matter.
    */
  def timeRangeWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"))
      .rangeBetween(-TrailSec * UsPerSec, 0)
    eventsUs(spark, dir)
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .select(
        col("event_id"),
        col("user_id"),
        col("tus"),
        count(lit(1)).over(w).as("n_trailing"),
        sum(col("cents")).over(w).as("sum_cents_trailing"))
      .orderBy(col("event_id"))
  }

  /** Ordering-key base for w6: within a 5-minute bucket the µs offset
    * is < 300e6 < 2^29, so (offset << 30) + event_id is a single
    * orderable BIGINT while event_id < 2^30 — both engines' argmin/
    * argmax compare the same integer. The precondition is ENFORCED
    * per row (`raise_error` branch in the okey projection — stays in
    * codegen, costs one comparison): a 100 TB corpus whose event ids
    * exceed 2^30 must fail loudly, not silently corrupt open/close
    * the way an unpacked overflow would (the d5-guard discipline).
    */
  private val OhlcIdBase = 1073741824L // 2^30

  /** w6 — OHLC resampling: per (event_type, 5-minute bucket) the
    * first/last/min/max of the value series — the time-series
    * downsample every monitoring/trading pipeline runs. The point of
    * the formulation: open/close are `min_by`/`max_by` in ONE hash
    * aggregate (map-side combinable, linear), NOT a row_number window —
    * the window form shuffles and sorts every event only to discard all
    * but the first row per group, and its per-bucket sort is exactly
    * the work min_by's running argmin avoids at 100 TB.
    *
    * Exactness: O/H/L/C are integer cents; the argmin/argmax ordering
    * key is a unique BIGINT, so first/last are deterministic in both
    * engines (no value ties to break).
    */
  def ohlcResample(spark: SparkSession, dir: String): DataFrame =
    eventsUs(spark, dir)
      .withColumn("bus", expr(s"tus div ${TumbleSec * UsPerSec}")
        * TumbleSec * UsPerSec)
      .withColumn("window_start", expr(s"bus div $UsPerSec"))
      .withColumn("okey",
        when(col("event_id") < OhlcIdBase,
          (col("tus") - col("bus")) * OhlcIdBase + col("event_id"))
          .otherwise(raise_error(lit(
            s"w6: event_id >= $OhlcIdBase overflows the packed OHLC " +
              "ordering key - widen OhlcIdBase or use a struct key"))
            .cast("long")))
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .groupBy(col("event_type"), col("window_start"))
      .agg(
        count(lit(1)).as("n_events"),
        min_by(col("cents"), col("okey")).as("open_cents"),
        max(col("cents")).as("high_cents"),
        min(col("cents")).as("low_cents"),
        max_by(col("cents"), col("okey")).as("close_cents"))
      .orderBy(col("event_type"), col("window_start"))

  /** w7 — gap-filled resample with forward fill: densify the 5-minute
    * bucket axis per event type (every bucket between the type's first
    * and last appears, present or not) and carry the last non-empty
    * bucket's cents-sum forward across gaps — the time-series
    * `time_bucket_gapfill` / LOCF operator (TimescaleDB, QuestDB) that
    * chart and join layers need a dense axis for. Live on this data:
    * 840–8 400 gap buckets per type at every SF.
    *
    * Scale shape: the axis is CALENDAR-sized, not data-sized — 5 rows
    * of (min, max) control data exploded to range/step buckets (a
    * decade of 5-min buckets is ~1M rows/type), so the per-type
    * forward-fill window is bounded by the calendar no matter how many
    * events exist; the events themselves touch only one hash agg and
    * one equi-join back onto the axis. First bucket per type is
    * non-gap by construction, so the carry is never null.
    */
  def gapFillResample(spark: SparkSession, dir: String): DataFrame = {
    val c = eventsUs(spark, dir)
      .withColumn(
        "window_start",
        expr(s"tus div ${TumbleSec * UsPerSec}") * TumbleSec)
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .groupBy(col("event_type"), col("window_start"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
    val axis = c.groupBy(col("event_type"))
      .agg(min(col("window_start")).as("mn"), max(col("window_start")).as("mx"))
      .select(
        col("event_type"),
        explode(sequence(col("mn"), col("mx"), lit(TumbleSec)))
          .as("window_start"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("window_start"))
      .rowsBetween(Window.unboundedPreceding, 0)
    axis.join(c, Seq("event_type", "window_start"), "left")
      .withColumn("is_gap", col("n").isNull)
      .select(
        col("event_type"),
        col("window_start"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        col("is_gap"),
        last(when(!col("is_gap"), col("sum_cents")), ignoreNulls = true)
          .over(w).as("carry_cents"))
      .orderBy(col("event_type"), col("window_start"))
  }

  /** Funnel completion window for w8: all steps must land within this
    * many seconds of the anchoring first view (24 h — chosen so the
    * live data exercises every stage at every SF).
    */
  val FunnelWindowSec = 86400L

  /** Analysis range for the stateful per-user aggregations (w8 funnel,
    * w9 retention): [2024-01-01, 2024-03-01) in epoch-µs — covers the
    * testdata's live span (Jan 2024) with headroom. This bound is the
    * state-size guarantee: the per-user `collect_list`/`collect_set`
    * holds only in-range times, so a super-user with years of history
    * contributes at most range-length × event-rate entries (w8) or
    * range-length-days entries (w9) — never their unbounded lifetime.
    * The same constant gates the oracle SQL, so both engines see the
    * identical slice.
    */
  val AnalysisStartUs = 1704067200000000L // 2024-01-01T00:00:00Z
  val AnalysisEndUs = 1709251200000000L // 2024-03-01T00:00:00Z

  private def inAnalysisRange(df: DataFrame): DataFrame =
    df.filter(col("tus") >= AnalysisStartUs && col("tus") < AnalysisEndUs)

  /** The oracle-side twin of `inAnalysisRange`. */
  private val OracleRangeWhere =
    s"epoch_us(ts) >= $AnalysisStartUs AND epoch_us(ts) < $AnalysisEndUs"

  /** w8 — strict-order windowed conversion funnel (view → click →
    * purchase), the event-analytics staple (ClickHouse `windowFunnel`,
    * Amplitude/Mixpanel funnels): per user, stage = how far the
    * ordered chain got, anchored at the FIRST view and required to
    * complete within `FunnelWindowSec` — t1 = min view time; t2 = min
    * click in (t1, t1+W]; t3 = min purchase in (t2, t1+W]. The anchor
    * rule makes the fold deterministic and engine-replayable (no
    * scan-all-chains backtracking). Emits the stage histogram — the
    * conversion report.
    *
    * Scale shape: ONE pass. The naive cascade (per-step agg + join
    * back) reads the events table once per step and join; instead a
    * single user_id hash agg collects t1 directly plus the click /
    * purchase time lists, and the chain rule becomes per-row
    * `filter`/`array_min` expressions (nulls cascade: no view → no
    * window → stage 0). One Scan + two Exchanges TOTAL (plan-pinned in
    * `Round7bOpsSpec`) vs the cascade's six scans — on 100 TB of
    * events that is the whole game. Per-user state = that user's
    * click/purchase times inside the collection — the same per-key
    * state a streaming windowFunnel keeps; the `inAnalysisRange`
    * pre-filter bounds it for super-user skew (see `AnalysisStartUs` —
    * out-of-range history never enters the collection; spec'd with a
    * planted super-user fixture in `EventTimeSchemaSpec`). All time
    * math in the shared exact µs domain (`Tables.eventsUs`).
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val wUs = FunnelWindowSec * UsPerSec
    inAnalysisRange(eventsUs(spark, dir))
      .select(col("user_id"), col("event_type"), col("tus"))
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("tus"))).as("t1"),
        collect_list(when(col("event_type") === "click", col("tus")))
          .as("clicks"),
        collect_list(when(col("event_type") === "purchase", col("tus")))
          .as("purchases"))
      .withColumn(
        "t2",
        array_min(filter(
          col("clicks"),
          c => c > col("t1") && c <= col("t1") + wUs)))
      .withColumn(
        "t3",
        array_min(filter(
          col("purchases"),
          p => p > col("t2") && p <= col("t1") + wUs)))
      .select(
        when(col("t3").isNotNull, 3L)
          .when(col("t2").isNotNull, 2L)
          .when(col("t1").isNotNull, 1L)
          .otherwise(0L).as("stage"))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("stage"))
  }

  private val DayUs = 86400L * UsPerSec

  /** w9 — cohort retention, w8's sibling analytics staple: users
    * cohorted by first-activity day, and for each (cohort, day-offset)
    * the count + fraction of the cohort active that day — the
    * retention curve product teams read daily. Same one-pass shape as
    * w8: a single user_id hash agg yields (cohort_day =
    * min day, collect_set of active days); explode to (cohort, offset)
    * pairs — already DISTINCT per user because the set deduped them —
    * then a tiny (cohort × offset) hash agg. Cohort sizes come from
    * the offset-0 slice of that same agg (every user is active on
    * their cohort day by construction), broadcast back for the
    * retention ratio — IEEE division of two exact longs, engine-safe.
    *
    * Scale shape: one events scan; per-user state = the user's
    * DISTINCT active days, hard-bounded by the `inAnalysisRange`
    * pre-filter (60 days here, 365 for a year — never raw event count
    * or user lifetime); the report frame is cohorts × offsets,
    * metadata-sized. All day math in the shared µs domain.
    */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val perUser = inAnalysisRange(eventsUs(spark, dir))
      .select(col("user_id"), expr(s"tus div $DayUs").as("day"))
      .groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"), collect_set(col("day")).as("days"))
    val counts = perUser
      .select(col("cohort_day"), explode(col("days")).as("day"))
      .select(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
    val base = counts.filter(col("day_offset") === 0L)
      .select(col("cohort_day"), col("n_users").as("cohort_size"))
    counts.join(broadcast(base), "cohort_day")
      .select(
        col("cohort_day"), col("day_offset"), col("n_users"),
        (col("n_users").cast("double") / col("cohort_size").cast("double"))
          .as("retention"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** w10 — top-N-per-group over event windows, the one analytics
    * staple the w-family didn't cover (and the windowed sibling of
    * x14's rank family / x2's top-1): the top 3 users by event count
    * for every (event_type, day) bucket — "who drove each type each
    * day". w1's day bucketing feeds one hash agg, then a rank-in-group
    * window with the filter Spark plans as `WindowGroupLimit`: each
    * map task keeps only its local top-3 per group BEFORE the shuffle
    * (plan-pinned in `Round8OpsSpec`), so the exchange carries
    * ≤ 3×partitions rows per group instead of every user — the
    * difference between shuffling 3 rows and 10⁸ rows per group at
    * 100 TB. Deterministic: count ties break on user_id asc.
    */
  def topPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val counts = eventsUs(spark, dir)
      .withColumn("day", expr(s"tus div $DayUs"))
      .groupBy(col("event_type"), col("day"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("n_events").desc, col("user_id"))
    counts
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("event_type"), col("day"), col("user_id"),
        col("n_events"), col("rnk"))
      .orderBy(col("event_type"), col("day"), col("rnk"))
  }

  /** w11 decay parameters: value halves every `DecayHalfLifeDays`;
    * weights are the dyadic integers 2^(DecayShift − half-lives-old),
    * so the whole score is exact BIGINT math (see below).
    */
  val DecayHalfLifeDays = 7L
  val DecayShift = 32L

  /** w11 — half-life-decayed engagement score, the recency-weighted
    * ranking every retention / engagement / churn model starts from
    * (and the batch twin of a streaming decaying counter): per user,
    * Σ cents · 2^(−⌊age_days / half-life⌋), ages measured back from
    * the corpus's max day. The naive spelling — pow(0.5, age/7.0)
    * float weights summed in groupBy order — is cross-engine
    * DIVERGENT (non-associative float sums under nondeterministic
    * shuffle order, the q6 lesson). Here weights are the dyadic
    * integers 2^(32 − steps) (shiftleft — pure integer in both
    * engines), the score accumulates as an exact BIGINT, and the
    * reported double is ONE deterministic conversion + division by
    * 2^32 at the end — hash-comparable like every cents query.
    *
    * Scale shape: the reference day is a 1-row broadcast (the p9
    * scalar-control-data discipline); then ONE map-side-combinable
    * user_id hash agg — no window, no collection, state = one long
    * per user. At 100 TB pre-aggregate per (user, day) first if
    * per-user event counts threaten the 2^63 headroom (30 bounded
    * day-sums per user instead of raw events); the testdata's ~200
    * events × 10^4 cents × 2^32 sits 3 decades under the ceiling.
    * `least(steps, DecayShift)` keeps the weight a total function
    * (0 beyond ~32 half-lives) instead of an overflow.
    */
  def decayedEngagement(spark: SparkSession, dir: String): DataFrame = {
    val e = eventsUs(spark, dir)
      .select(
        col("user_id"),
        expr(s"tus div $DayUs").as("day"),
        round(col("value") * 100).cast("long").as("cents"))
    val ref = e.agg(max(col("day")).as("ref_day"))
    e.crossJoin(broadcast(ref))
      .withColumn(
        "w",
        expr(s"""shiftleft(cast(1 as bigint),
          cast($DecayShift - least((ref_day - day) div $DecayHalfLifeDays,
            $DecayShift) as int))"""))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("cents") * col("w")).as("decayed_cents"))
      .select(
        col("user_id"), col("n_events"), col("decayed_cents"),
        (col("decayed_cents").cast("double") /
          lit((1L << DecayShift).toDouble)).as("score"))
      .orderBy(col("user_id"))
  }

  /** w12 attribution window: views count when strictly before the
    * purchase and at most 30 minutes old. The blocking band equals the
    * window, so every candidate pair spans at most two buckets.
    */
  val IntervalWindowSec = 1800L

  /** w12 — banded interval join (the general time-RANGE join w4's
    * point-lookup ASOF specializes): every purchase matched to ALL of
    * the same user's views in the preceding 30 minutes — the
    * attribution/correlation join every event pipeline runs ("what did
    * this user see before buying"). The naive spelling is a θ-join
    * (`v.ts ∈ [p.ts−W, p.ts)`) — a per-user cross product Catalyst
    * can only nested-loop. Instead, time-bucket BLOCKING at band = W:
    * each view keys by its bucket, each purchase probes its own bucket
    * and the one before (a 2-way explode of control-sized keys), the
    * join is pure EQUI on (user_id, bucket) — hash-partitionable, no
    * nested loop — and the exact interval test runs as a codegen'd
    * residual. Band = window ⇒ any in-window pair is in the same or
    * adjacent bucket (found), and each pair meets exactly once (the
    * two probe buckets are distinct) — lossless, no dedup pass.
    *
    * Scale: work ∝ true pairs + same-bucket near-misses; probe-side
    * rows double (two buckets), never explode. Purchases with no
    * in-window view survive the left join as n_prior_views = 0 /
    * sentinel -1 ids (no NULLs in the output — the x6 sentinel
    * discipline). The nearest-view argmax rides a packed BIGINT
    * ordering key (the w6 okey discipline, same 2^30 id guard).
    */
  def intervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val bandUs = IntervalWindowSec * UsPerSec
    val e = eventsUs(spark, dir)
    val v = e.filter(col("event_type") === "view")
      .select(
        col("user_id"), col("event_id").as("vid"), col("tus").as("vus"))
      .withColumn("bucket", expr(s"vus div $bandUs"))
    val p = e.filter(col("event_type") === "purchase")
      .select(
        col("user_id"), col("event_id").as("pid"), col("tus").as("pus"))
      .withColumn(
        "bucket",
        explode(array(expr(s"pus div $bandUs"), expr(s"pus div $bandUs") - 1)))
    // the null branch is load-bearing: unmatched LEFT rows carry a null
    // vid, and a bare `when(vid < base)` would route them into the
    // overflow raise (NULL comparisons are not true)
    val okey =
      when(col("vid").isNull, lit(null).cast("long"))
        .when(col("vid") < OhlcIdBase,
          (col("vus") - col("pus") + bandUs) * OhlcIdBase + col("vid"))
        .otherwise(raise_error(lit(
          s"w12: event_id >= $OhlcIdBase overflows the packed ordering " +
            "key - widen the base or use a struct key")).cast("long"))
    p.join(
      v,
      p("user_id") === v("user_id") && p("bucket") === v("bucket") &&
        col("vus") < col("pus") && col("vus") >= col("pus") - bandUs,
      "left")
      .select(
        col("pid"), p("user_id").as("user_id"), col("pus"),
        col("vid"), col("vus"), okey.as("okey"))
      .groupBy(col("pid"), col("user_id"), col("pus"))
      .agg(
        count(col("vid")).as("n_prior_views"),
        coalesce(max_by(col("vid"), col("okey")), lit(-1L))
          .as("nearest_view_id"),
        coalesce(col("pus") - max(col("vus")), lit(-1L)).as("min_gap_us"))
      .select(
        col("pid").as("purchase_id"), col("user_id"),
        col("pus").as("purchase_us"), col("n_prior_views"),
        col("nearest_view_id"), col("min_gap_us"))
      .orderBy(col("purchase_id"))
  }

  /** w13 rolling-baseline parameters: hourly buckets scored against
    * the trailing 24-hour sum; top 3 per event type.
    */
  val SpikeBucketSec = 3600L
  val SpikeTrailBuckets = 24
  val SpikeTopK = 3

  /** w13 — rate-anomaly leaderboard: for each event type, the top 3
    * hourly buckets by exact integer excess over the trailing 24-hour
    * baseline — score = 24·c − Σ(trailing 24 counts), i.e. how far
    * this hour runs above its own recent average, ×24 to stay in
    * integers. The monitoring staple (spike/anomaly detection over
    * event rates) expressed as a LEADERBOARD rather than a fixed
    * threshold: on data with no planted bursts a threshold is dead at
    * some SFs and fires on Poisson noise at others, while the top-k
    * is always live and the production threshold is one `filter` on
    * the emitted score (policy, not engine math).
    *
    * Shape: w7's calendar-sized dense axis (explode of per-type
    * (min, max) control rows — gaps count as 0, which a sparse
    * groupBy would silently skip), one rolling ROWS-frame sum per
    * type over that axis, then w10's rank-with-limit, which Spark
    * plans as `WindowGroupLimit` (map-side partial top-k before the
    * shuffle). Everything after the first events aggregate is
    * metadata-scale (buckets × types, independent of event volume).
    * Buckets with an incomplete trailing window (the first 24 per
    * type) are excluded — their baseline would be an artifact.
    * Deterministic: score ties break on window_start asc.
    */
  def rateAnomalies(spark: SparkSession, dir: String): DataFrame = {
    val bus = SpikeBucketSec * UsPerSec
    val c = eventsUs(spark, dir)
      .withColumn("b", expr(s"tus div $bus"))
      .groupBy(col("event_type"), col("b"))
      .agg(count(lit(1)).as("c"))
    val axis = c.groupBy(col("event_type"))
      .agg(min(col("b")).as("mn"), max(col("b")).as("mx"))
      .select(
        col("event_type"),
        explode(sequence(col("mn"), col("mx"), lit(1L))).as("b"))
    val trail = Window.partitionBy(col("event_type")).orderBy(col("b"))
      .rowsBetween(-SpikeTrailBuckets, -1)
    val rankW = Window.partitionBy(col("event_type"))
      .orderBy(col("score").desc, col("b"))
    axis.join(c, Seq("event_type", "b"), "left")
      .select(
        col("event_type"), col("b"), coalesce(col("c"), lit(0L)).as("c"))
      .withColumn("trail_sum", sum(col("c")).over(trail))
      .withColumn("trail_n", count(lit(1)).over(trail))
      .filter(col("trail_n") === SpikeTrailBuckets)
      .withColumn(
        "score", col("c") * SpikeTrailBuckets - col("trail_sum"))
      .withColumn("rnk", row_number().over(rankW).cast("long"))
      .filter(col("rnk") <= SpikeTopK)
      .select(
        col("event_type"), (col("b") * SpikeBucketSec).as("window_start"),
        col("c").as("n_events"), col("trail_sum"), col("score"), col("rnk"))
      .orderBy(col("event_type"), col("rnk"))
  }

  /** w21 — SCD2 dimension history (slowly-changing-dimension type 2),
    * the warehouse-modeling op the reference's INSERT IGNORE dims
    * deliberately lack (E6 keeps FIRST-write-wins with no history):
    * fold each user's event-type stream into versioned validity
    * intervals — consecutive equal types collapse into one version
    * (no-change rows never open a new version, the SCD2 contract),
    * `valid_from` = the run's first event time, `valid_to` = the next
    * version's start (−1 sentinel + `is_current` for the open one).
    * This is the `MERGE ... WHEN MATCHED AND changed` history table
    * every dimensional warehouse maintains, derived set-based in one
    * pass instead of row-at-a-time upserts.
    *
    * Scale shape: gaps-and-islands (d17's discipline) — one per-user
    * window pass (lag + running sum over the unique (tus, event_id)
    * order, parallel across users), a hash agg to runs, and a second
    * per-user window over the RUNS frame (≤ one row per change, far
    * smaller than events). No global window, no self-join.
    */
  def scd2History(spark: SparkSession, dir: String): DataFrame =
    // r18 opt: lazy checkpoint BEFORE the output sort — the range
    // partitioner samples its child to pick bounds, so the whole
    // window+agg derivation ran twice (the t14 double-evaluation, here
    // between the user exchange and the range exchange). The
    // checkpoint materializes the runs-sized frame once; the sampling
    // pass re-reads persisted blocks instead of recomputing.
    scd2Versions(spark, dir)
      .localCheckpoint(eager = false)
      .orderBy(col("user_id"), col("version"))

  /** w21's version derivation WITHOUT the output sort — what w22's
    * PIT join consumes (r18 opt, guide §2.4): w22 embedded the SORTED
    * registered query, and the global orderBy's rangepartitioning
    * Exchange + Sort survived in its plan (EliminateSorts does not
    * look through the native as-of join node) only to be immediately
    * re-shuffled hash(user_id) for the merge scan. w21's registered
    * query keeps its own sort.
    */
  private[queries] def scd2Versions(
      spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, 0)
    val versions = eventsUs(spark, dir)
      .select(col("user_id"), col("tus"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .withColumn(
        "chg",
        when(
          col("prev_type").isNull ||
            col("prev_type") =!= col("event_type"), 1L).otherwise(0L))
      .withColumn("version", sum(col("chg")).over(run))
      .groupBy(col("user_id"), col("version"))
      .agg(
        min(col("event_type")).as("event_type"),
        min(col("tus")).as("valid_from_us"),
        count(lit(1)).as("n_events"))
    val byVer = Window.partitionBy(col("user_id")).orderBy(col("version"))
    versions
      .withColumn(
        "valid_to_us",
        coalesce(lead(col("valid_from_us"), 1).over(byVer), lit(-1L)))
      .withColumn("is_current", col("valid_to_us") === lit(-1L))
      .select(
        col("user_id"), col("version"), col("event_type"),
        col("valid_from_us"), col("valid_to_us"), col("is_current"),
        col("n_events"))
  }

  /** w22 — point-in-time (PIT) dimension enrichment: join each
    * purchase fact to the SCD2 version (w21) in effect STRICTLY
    * BEFORE it — "what state was the user in when they bought", the
    * canonical dimensional-warehouse fact⋈dim-history join (and the
    * feature-store training-set join: features as-of the label's
    * time minus ε, never leaking the label's own interval). Runs on
    * the NATIVE `AsofJoinExec` (greatest valid_from ≤ t−1µs, ties to
    * the greatest version — matching the version-DESC oracle rank);
    * purchases whose user has no prior version drop (inner as-of).
    *
    * Scale shape: w21's linear version derivation (runs frame ≪
    * events) + the merge-scan as-of — each side shuffles only its own
    * rows on user_id, requirement-placed exchanges, one-row lookback
    * state (the w17 plan shape).
    */
  def pitEnrichment(spark: SparkSession, dir: String): DataFrame = {
    val versions = scd2Versions(spark, dir)
      .select(
        col("user_id").as("v_user"), col("valid_from_us"), col("version"),
        col("event_type").as("state_type"), col("n_events").as("state_n"))
    val purchases = eventsUs(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id"), (col("tus") - 1L).as("asof_us"),
        col("event_id").as("purchase_id"), col("tus").as("purchase_us"))
    graft.plans.AsofJoin.asof(purchases, versions)
      .select(
        col("user_id"), col("purchase_id"), col("purchase_us"),
        col("version"), col("state_type"), col("state_n"))
      .orderBy(col("purchase_id"))
  }

  /** w14 — session transition matrix: the next-event Markov model
    * funnel/path analytics reads (Amplitude Pathfinder, GA behavior
    * flow): for every ordered pair of event types, how often a user's
    * event of the first type is IMMEDIATELY followed (same user, next
    * event, within the w3 session gap) by one of the second — counts
    * plus the row-normalized transition probability p(to | from). The
    * funnel (w8) fixes one path a priori; the transition matrix is the
    * discovery view that says which paths exist at all.
    *
    * Scale shape: ONE per-user window pass (`lead` over the same
    * (tus, event_id) unique ordering w3 sessionizes on — partitioned
    * by user, parallel, linear) feeds a hash agg whose output is
    * |types|² rows; the row-normalizing total runs as a window over
    * that METADATA-sized frame (never over events). Probability = IEEE
    * division of two exact longs — the w9 retention discipline.
    * Deterministic: the ordering key is unique, so `lead` is
    * unambiguous in both engines.
    */
  def transitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    val byFrom = Window.partitionBy(col("from_type"))
    eventsUs(spark, dir)
      .select(col("user_id"), col("tus"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
      .withColumn("next_tus", lead(col("tus"), 1).over(byUser))
      .filter(
        col("next_type").isNotNull &&
          col("next_tus") - col("tus") <= SessionGapSec * UsPerSec)
      .groupBy(
        col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .withColumn("from_total", sum(col("n_transitions")).over(byFrom))
      .select(
        col("from_type"), col("to_type"), col("n_transitions"),
        col("from_total"),
        (col("n_transitions").cast("double") /
          col("from_total").cast("double")).as("p_transition"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Trailing window length for w15 (report day d covers [d-6, d]). */
  val RollingDays = 7L

  /** w15 — rolling 7-day distinct users per day (the DAU/WAU board
    * every product team keeps): for each day, the EXACT count of
    * distinct users active in the trailing 7 days, the day's own
    * distinct actives, and the stickiness ratio DAU/WAU. This is the
    * sliding-window DISTINCT the w-family didn't cover — w2 slides a
    * COUNT (decomposable; explode-and-sum works), but distinct does
    * not decompose, which is exactly why it earns an operator.
    *
    * Scale shape: events collapse to distinct (user, day) FIRST (one
    * hash agg — the state that matters is users × days, never raw
    * events), then each pair fans out to the ≤7 report days it serves
    * (bounded explode, the w2/w12 blocking discipline — never a range
    * self-join) and a second hash agg counts distinct users per report
    * day. At 100 TB the same plan stands; the exact distinct is this
    * operator's contract (x11's HLL sketch is the registered approx
    * twin for when ±2% is acceptable). Report days clamp to the data's
    * [min, max] day span: every emitted day has a full look-back
    * within the data where one exists (left-edge days keep their
    * partial look-back — the standard dashboard convention).
    */
  def rollingDistinct(spark: SparkSession, dir: String): DataFrame = {
    val ud = eventsUs(spark, dir)
      .select(col("user_id"), expr(s"tus div $DayUs").as("day"))
      .distinct()
    // max day is distinct-insensitive: read it off the raw events so
    // the 1-row branch skips ud's (user, day) distinct shuffle
    val mx = eventsUs(spark, dir)
      .agg(max(expr(s"tus div $DayUs")).as("mx_day"))
    ud.crossJoin(broadcast(mx))
      .select(
        col("user_id"), col("day"),
        explode(sequence(
          col("day"),
          least(col("day") + (RollingDays - 1), col("mx_day"))))
          .as("report_day"))
      .groupBy(col("report_day"))
      .agg(
        countDistinct(col("user_id")).as("wau_users"),
        countDistinct(
          when(col("day") === col("report_day"), col("user_id")))
          .as("dau_users"))
      .select(
        col("report_day"), col("dau_users"), col("wau_users"),
        (col("dau_users").cast("double") / col("wau_users").cast("double"))
          .as("stickiness"))
      .orderBy(col("report_day"))
  }

  /** w16 — time-to-convert distribution: w4's AS-OF click→purchase
    * latencies folded into a power-of-two histogram (the latency-board
    * convention: exponential buckets resolve seconds AND days in one
    * table) with exact integer bucket math — bucket p covers
    * [2^p, 2^{p+1}) seconds, derived as `length(bin(sec)) - 1`, the
    * binary-digit count both engines compute on the identical BIGINT
    * (never `floor(log2(x))`, whose float rounding flips at exact
    * powers of two; sub-second latencies fold into bucket 0, see the
    * `greatest` clamp). w4 emits every pair; w16 is the report a
    * funnel team actually reads — conversions per latency decade +
    * share of total.
    *
    * Scale shape: rides w4's one-per-user-window-pass merge-scan
    * (linear in events, no θ-join — w4's whole point), then ONE hash
    * agg to ~40 bucket rows. The share's total rides an un-ordered
    * global window over that POST-AGG frame — ≤ 64 rows at any corpus
    * scale (one per bucket power), so the single task holds metadata,
    * not data; a broadcast-total branch here would re-run the whole
    * uncached asof window pass a second time (measured: it was the
    * plan's entire second half). w4's output sort is eliminated under
    * the agg (EliminateSorts — pinned in the shuffle budget).
    */
  def conversionLatency(spark: SparkSession, dir: String): DataFrame = {
    val wAll = Window.partitionBy()
    asofJoin(spark, dir)
      .select(expr(s"gap_us div $UsPerSec").as("gap_sec"))
      .withColumn(
        "bucket_pow",
        (length(bin(greatest(col("gap_sec"), lit(1L)))) - 1).cast("long"))
      .groupBy(col("bucket_pow"))
      .agg(
        count(lit(1)).as("n_conversions"),
        sum(col("gap_sec")).as("sum_gap_sec"))
      .withColumn("total_conv", sum(col("n_conversions")).over(wAll))
      .select(
        col("bucket_pow"),
        expr("shiftleft(1L, cast(bucket_pow as int))").as("lo_sec"),
        expr("shiftleft(2L, cast(bucket_pow as int))").as("hi_sec"),
        col("n_conversions"), col("sum_gap_sec"),
        (col("n_conversions").cast("double") /
          col("total_conv").cast("double")).as("share"))
      .orderBy(col("bucket_pow"))
  }

  /** w17 — w4's AS-OF join through the NATIVE merge-scan operator
    * (`graft.plans.AsofJoinExec`, the SURVEY §4 tier-(c) custom
    * LogicalPlan → Strategy → SparkPlan): same contract, same rows,
    * same DuckDB oracle string as w4 — the two formulations certify
    * each other. Where w4 shuffles the UNION of both streams through
    * one per-user window pass, the native exec shuffles each side by
    * key (exchanges/sorts placed by EnsureRequirements from declared
    * requirements, not hand-scheduled) and merges in one forward pass
    * holding a single buffered right row — no carrier nulls, no
    * window state.
    */
  def asofNative(spark: SparkSession, dir: String): DataFrame = {
    val e = eventsUs(spark, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("tus").as("purchase_us"),
        col("event_id").as("purchase_id"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("tus").as("click_us"),
        col("event_id").as("click_id"))
    graft.plans.AsofJoin.asof(purchases, clicks)
      .select(
        col("user_id"), col("purchase_id"), col("purchase_us"),
        col("click_id"), col("click_us"),
        (col("purchase_us") - col("click_us")).as("gap_us"))
      .orderBy(col("purchase_id"))
  }

  /** w18 — linear multi-touch attribution: every view/click in the 30
    * minutes before a purchase shares that purchase's credit EQUALLY —
    * the marketing-analytics model between w4's last-touch (one
    * winner) and position-weighted schemes; the report is credit mass
    * per touch type. Credit is EXACT integer micro-units
    * (the Dashboard.q6 cents discipline): each touch gets
    * `1e6 div n`, the LATEST touch (max (tus, id) — deterministic)
    * absorbs the remainder, so every credited purchase contributes
    * exactly 1,000,000 ppm and the report columns are exact longs;
    * a float `1.0/n` would leak ulps per purchase and diverge
    * cross-engine.
    *
    * Scale shape: w12's banded blocking verbatim — touch⋈purchase is
    * a pure equi-join on (user, 30-min bucket) with the time residual
    * (purchase side fans to 2 bucket keys; every true pair found
    * exactly once), per-purchase n/rank ride ONE partitioned window
    * over pid (bounded by touches-per-purchase), the type fold is a
    * hash agg to ≤ |types| rows with the share on a post-agg global
    * window. The oracle replays the UNBLOCKED θ-join — the hash
    * compare certifies the banding lossless (the w12/x18/x20
    * pattern).
    */
  def linearAttribution(spark: SparkSession, dir: String): DataFrame = {
    val bandUs = IntervalWindowSec * UsPerSec
    val e = eventsUs(spark, dir)
    val t = e.filter(col("event_type").isin("view", "click"))
      .select(
        col("user_id"), col("event_id").as("tid"),
        col("event_type").as("touch_type"), col("tus").as("t_us"))
      .withColumn("bucket", expr(s"t_us div $bandUs"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"), col("tus").as("pus"))
      .withColumn(
        "bucket",
        explode(array(expr(s"pus div $bandUs"), expr(s"pus div $bandUs") - 1)))
    val byPid = Window.partitionBy(col("pid"))
    val latest = Window.partitionBy(col("pid"))
      .orderBy(col("t_us").desc, col("tid").desc)
    p.join(
        t,
        p("user_id") === t("user_id") && p("bucket") === t("bucket") &&
          col("t_us") < col("pus") && col("t_us") >= col("pus") - bandUs)
      .select(col("pid"), col("tid"), col("touch_type"), col("t_us"))
      .withColumn("n", count(lit(1)).over(byPid))
      .withColumn("rn", row_number().over(latest))
      .withColumn(
        "ppm",
        expr("1000000L div n") +
          when(col("rn") === 1, expr("1000000L % n")).otherwise(0L))
      .groupBy(col("touch_type"))
      .agg(
        count(lit(1)).as("n_touches"),
        sum(col("ppm")).as("credit_ppm"))
      .withColumn(
        "total_ppm", sum(col("credit_ppm")).over(Window.partitionBy()))
      .select(
        col("touch_type"), col("n_touches"), col("credit_ppm"),
        (col("credit_ppm").cast("double") / col("total_ppm").cast("double"))
          .as("credit_share"))
      .orderBy(col("touch_type"))
  }

  /** w19 — hour-of-week traffic profile: the 7×24 heatmap every ops
    * dashboard opens with, plus each cell's EXACT integer excess over
    * a uniform week (`168·n − N` — positive = hot cell; the χ²-style
    * number without the division, so it stays a long). Calendar math
    * is pure integer arithmetic on the epoch-µs axis — day-of-week =
    * `(epoch_day + 3) mod 7` (1970-01-01 was a Thursday; 0 = Monday)
    * and hour = `epoch_hour mod 24`, i.e. UTC by definition — never an
    * engine calendar function, whose week-start and timezone
    * conventions differ between engines (the p13 one-expression
    * discipline).
    *
    * Scale shape: ONE hash agg from the scan to exactly ≤168 rows;
    * the total rides a post-agg global window over that fixed-size
    * frame (the w16 lesson). Nothing else.
    */
  def trafficProfile(spark: SparkSession, dir: String): DataFrame =
    eventsUs(spark, dir)
      .select(
        expr(s"(tus div ${DayUs} + 3) % 7").as("dow"),
        expr(s"(tus div ${3600L * UsPerSec}) % 24").as("hour"))
      .groupBy(col("dow"), col("hour"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("total", sum(col("n_events")).over(Window.partitionBy()))
      .select(
        col("dow"), col("hour"), col("n_events"),
        (lit(168L) * col("n_events") - col("total")).as("excess_x168"),
        (col("n_events").cast("double") / col("total").cast("double"))
          .as("share"))
      .orderBy(col("dow"), col("hour"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w19_traffic_profile" -> trafficProfile,
    "w18_linear_attribution" -> linearAttribution,
    "w17_asof_native" -> asofNative,
    "w16_conversion_latency" -> conversionLatency,
    "w15_rolling_distinct" -> rollingDistinct,
    "w14_transition_matrix" -> transitionMatrix,
    "w13_rate_anomalies" -> rateAnomalies,
    "w12_interval_join" -> intervalJoin,
    "w11_decayed_engagement" -> decayedEngagement,
    "w10_top_per_group" -> topPerGroup,
    "w9_retention" -> retention,
    "w8_funnel" -> funnel,
    "w7_gap_fill" -> gapFillResample,
    "w6_ohlc_resample" -> ohlcResample,
    "w5_time_range_window" -> timeRangeWindow,
    "w4_asof_join" -> asofJoin,
    "w1_tumbling" -> tumbling,
    "w2_sliding" -> sliding,
    "w3_sessions" -> sessions,
    "w21_scd2_history" -> scd2History,
    "w22_pit_enrichment" -> pitEnrichment,
    "w20_top_paths" -> topPaths)

  /** The AS-OF contract in DuckDB's native ASOF JOIN — shared by w4
    * (union+window formulation) and w17 (native merge-scan operator).
    */
  private val AsofOracleSql =
    """SELECT p.user_id, p.event_id AS purchase_id,
              epoch_us(p.ts) AS purchase_us,
              c.event_id AS click_id, epoch_us(c.ts) AS click_us,
              epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
       FROM (SELECT * FROM events WHERE event_type = 'purchase') p
       ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
         ON p.user_id = c.user_id AND p.ts >= c.ts
       ORDER BY purchase_id"""

  val oracleSql: Map[String, String] = Map(
    // w16: the same ASOF pairs as w4's oracle, bucketed with the same
    // binary-digit-count expression on the same BIGINT seconds
    "w16_conversion_latency" ->
      s"""WITH pairs AS (
            SELECT (epoch_us(p.ts) - epoch_us(c.ts)) // $UsPerSec AS gap_sec
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
              ON p.user_id = c.user_id AND p.ts >= c.ts),
          b AS (
            SELECT CAST(length(bin(greatest(gap_sec, 1))) - 1 AS BIGINT)
                     AS bucket_pow,
                   COUNT(*) AS n_conversions,
                   CAST(SUM(gap_sec) AS BIGINT) AS sum_gap_sec
            FROM pairs GROUP BY 1),
          tot AS (SELECT CAST(SUM(n_conversions) AS BIGINT) AS total_conv
                  FROM b)
          SELECT bucket_pow,
                 CAST(1 AS BIGINT) << CAST(bucket_pow AS INT) AS lo_sec,
                 CAST(2 AS BIGINT) << CAST(bucket_pow AS INT) AS hi_sec,
                 n_conversions, sum_gap_sec,
                 CAST(n_conversions AS DOUBLE) / CAST(total_conv AS DOUBLE)
                   AS share
          FROM b, tot ORDER BY bucket_pow""",
    "w14_transition_matrix" ->
      s"""WITH o AS (
            SELECT user_id, epoch_us(ts) AS tus, event_id, event_type,
                   lead(event_type) OVER w AS next_type,
                   lead(epoch_us(ts)) OVER w AS next_tus
            FROM events
            WINDOW w AS (PARTITION BY user_id
              ORDER BY epoch_us(ts), event_id)),
          t AS (
            SELECT event_type AS from_type, next_type AS to_type,
                   COUNT(*) AS n_transitions
            FROM o
            WHERE next_type IS NOT NULL
              AND next_tus - tus <= ${SessionGapSec * UsPerSec}
            GROUP BY 1, 2)
          SELECT from_type, to_type, n_transitions,
                 CAST(SUM(n_transitions) OVER (PARTITION BY from_type)
                   AS BIGINT) AS from_total,
                 CAST(n_transitions AS DOUBLE) /
                   CAST(CAST(SUM(n_transitions) OVER (PARTITION BY from_type)
                     AS BIGINT) AS DOUBLE) AS p_transition
          FROM t ORDER BY from_type, to_type""",
    "w15_rolling_distinct" ->
      s"""WITH ud AS (
            SELECT DISTINCT user_id, epoch_us(ts) // $DayUs AS day
            FROM events),
          mx AS (SELECT MAX(day) AS mx_day FROM ud),
          f AS (
            SELECT ud.user_id, ud.day,
                   unnest(generate_series(ud.day,
                     LEAST(ud.day + ${RollingDays - 1}, mx.mx_day)))
                     AS report_day
            FROM ud, mx)
          SELECT report_day,
                 CAST(COUNT(DISTINCT CASE WHEN day = report_day
                   THEN user_id END) AS BIGINT) AS dau_users,
                 CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau_users,
                 CAST(COUNT(DISTINCT CASE WHEN day = report_day
                     THEN user_id END) AS DOUBLE) /
                   CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS stickiness
          FROM f GROUP BY report_day ORDER BY report_day""",
    // w12: the oracle replays the UNBLOCKED θ-join — if the banded
    // blocking dropped or double-counted any pair, the hashes diverge
    // (the x18/x20 "oracle certifies the optimization" pattern)
    "w12_interval_join" -> {
      val bandUs = IntervalWindowSec * UsPerSec
      s"""WITH p AS (
            SELECT user_id, event_id AS pid, epoch_us(ts) AS pus
            FROM events WHERE event_type = 'purchase'),
          v AS (
            SELECT user_id, event_id AS vid, epoch_us(ts) AS vus
            FROM events WHERE event_type = 'view'),
          j AS (
            SELECT p.pid, p.user_id, p.pus, v.vid, v.vus,
                   (v.vus - p.pus + $bandUs) * $OhlcIdBase + v.vid AS okey
            FROM p LEFT JOIN v
              ON p.user_id = v.user_id
             AND v.vus < p.pus AND v.vus >= p.pus - $bandUs)
          SELECT pid AS purchase_id, user_id, pus AS purchase_us,
                 CAST(COUNT(vid) AS BIGINT) AS n_prior_views,
                 COALESCE(arg_max(vid, okey), -1) AS nearest_view_id,
                 COALESCE(pus - MAX(vus), -1) AS min_gap_us
          FROM j GROUP BY pid, user_id, pus
          ORDER BY purchase_id"""
    },
    "w13_rate_anomalies" ->
      s"""WITH c AS (
            SELECT event_type, epoch_us(ts) // ${SpikeBucketSec * UsPerSec}
                     AS b, COUNT(*) AS c
            FROM events GROUP BY 1, 2),
          axis AS (
            SELECT event_type, unnest(generate_series(mn, mx)) AS b
            FROM (SELECT event_type, MIN(b) AS mn, MAX(b) AS mx
                  FROM c GROUP BY event_type)),
          d AS (
            SELECT a.event_type, a.b, COALESCE(c.c, 0) AS c
            FROM axis a LEFT JOIN c
              ON a.event_type = c.event_type AND a.b = c.b),
          w AS (
            SELECT event_type, b, c,
                   CAST(SUM(c) OVER tw AS BIGINT) AS trail_sum,
                   COUNT(*) OVER tw AS trail_n
            FROM d
            WINDOW tw AS (PARTITION BY event_type ORDER BY b
              ROWS BETWEEN $SpikeTrailBuckets PRECEDING AND 1 PRECEDING)),
          s AS (
            SELECT event_type, b, c, trail_sum,
                   c * $SpikeTrailBuckets - trail_sum AS score
            FROM w WHERE trail_n = $SpikeTrailBuckets),
          r AS (
            SELECT event_type, b, c, trail_sum, score,
                   CAST(row_number() OVER (PARTITION BY event_type
                     ORDER BY score DESC, b) AS BIGINT) AS rnk
            FROM s)
          SELECT event_type, b * $SpikeBucketSec AS window_start,
                 c AS n_events, trail_sum, score, rnk
          FROM r WHERE rnk <= $SpikeTopK
          ORDER BY event_type, rnk""",
    // w11: `<<` is DuckDB's integer shift (= Spark's shiftleft); the
    // score divides the SAME BIGINT both engines emit, so the double
    // is one identical IEEE conversion + division by 2^32
    "w11_decayed_engagement" ->
      s"""WITH e AS (
            SELECT user_id, epoch_us(ts) // $DayUs AS day,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents
            FROM events),
          r AS (SELECT MAX(day) AS ref_day FROM e),
          wgt AS (
            SELECT user_id, cents,
                   (CAST(1 AS BIGINT) << CAST($DecayShift -
                     LEAST((r.ref_day - e.day) // $DecayHalfLifeDays,
                       $DecayShift) AS INT)) AS w
            FROM e, r)
          SELECT user_id, COUNT(*) AS n_events,
                 CAST(SUM(cents * w) AS BIGINT) AS decayed_cents,
                 CAST(CAST(SUM(cents * w) AS BIGINT) AS DOUBLE)
                   / ${(1L << DecayShift).toDouble} AS score
          FROM wgt GROUP BY user_id ORDER BY user_id""",
    "w10_top_per_group" ->
      s"""SELECT event_type, day, user_id, n_events, rnk FROM (
            SELECT event_type, day, user_id, n_events,
                   CAST(row_number() OVER (PARTITION BY event_type, day
                     ORDER BY n_events DESC, user_id) AS BIGINT) AS rnk
            FROM (
              SELECT event_type, epoch_us(ts) // $DayUs AS day, user_id,
                     COUNT(*) AS n_events
              FROM events GROUP BY 1, 2, 3))
          WHERE rnk <= 3 ORDER BY event_type, day, rnk""",
    "w9_retention" ->
      s"""WITH e AS (
            SELECT user_id, epoch_us(ts) // $DayUs AS day FROM events
            WHERE $OracleRangeWhere),
          cu AS (
            SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY 1),
          uw AS (
            SELECT DISTINCT e.user_id, cu.cohort_day,
                   e.day - cu.cohort_day AS day_offset
            FROM e JOIN cu USING (user_id)),
          counts AS (
            SELECT cohort_day, day_offset, COUNT(*) AS n_users
            FROM uw GROUP BY 1, 2),
          base AS (
            SELECT cohort_day, n_users AS cohort_size
            FROM counts WHERE day_offset = 0)
          SELECT c.cohort_day, c.day_offset, c.n_users,
                 CAST(c.n_users AS DOUBLE) / CAST(b.cohort_size AS DOUBLE)
                   AS retention
          FROM counts c JOIN base b USING (cohort_day)
          ORDER BY 1, 2""",
    "w8_funnel" ->
      s"""WITH e AS (
            SELECT user_id, event_type, epoch_us(ts) AS tus FROM events
            WHERE $OracleRangeWhere),
          s1 AS (
            SELECT user_id, MIN(tus) AS t1 FROM e
            WHERE event_type = 'view' GROUP BY 1),
          s2 AS (
            SELECT e.user_id, MIN(e.tus) AS t2
            FROM e JOIN s1 USING (user_id)
            WHERE e.event_type = 'click' AND e.tus > s1.t1
              AND e.tus <= s1.t1 + ${FunnelWindowSec * UsPerSec}
            GROUP BY 1),
          s3 AS (
            SELECT e.user_id, MIN(e.tus) AS t3
            FROM e JOIN s2 USING (user_id) JOIN s1 USING (user_id)
            WHERE e.event_type = 'purchase' AND e.tus > s2.t2
              AND e.tus <= s1.t1 + ${FunnelWindowSec * UsPerSec}
            GROUP BY 1),
          stages AS (
            SELECT u.user_id,
                   CASE WHEN s3.user_id IS NOT NULL THEN 3
                        WHEN s2.user_id IS NOT NULL THEN 2
                        WHEN s1.user_id IS NOT NULL THEN 1
                        ELSE 0 END AS stage
            FROM (SELECT DISTINCT user_id FROM e) u
            LEFT JOIN s1 USING (user_id)
            LEFT JOIN s2 USING (user_id)
            LEFT JOIN s3 USING (user_id))
          SELECT CAST(stage AS BIGINT) AS stage, COUNT(*) AS n_users
          FROM stages GROUP BY 1 ORDER BY 1""",
    "w7_gap_fill" ->
      s"""WITH c AS (
            SELECT event_type,
                   epoch_us(ts) // ${TumbleSec * UsPerSec} * $TumbleSec
                     AS window_start,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                     AS sum_cents
            FROM events GROUP BY 1, 2),
          axis AS (
            SELECT event_type,
                   unnest(generate_series(mn, mx, $TumbleSec)) AS window_start
            FROM (SELECT event_type, MIN(window_start) AS mn,
                         MAX(window_start) AS mx
                  FROM c GROUP BY event_type))
          SELECT a.event_type, a.window_start,
                 CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events,
                 c.n IS NULL AS is_gap,
                 last_value(CASE WHEN c.n IS NOT NULL THEN c.sum_cents END
                   IGNORE NULLS) OVER (PARTITION BY a.event_type
                   ORDER BY a.window_start
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS carry_cents
          FROM axis a LEFT JOIN c
            ON a.event_type = c.event_type AND a.window_start = c.window_start
          ORDER BY a.event_type, a.window_start""",
    "w6_ohlc_resample" ->
      s"""WITH b AS (
            SELECT event_type,
                   epoch_us(ts) // ${TumbleSec * UsPerSec} * $TumbleSec
                     AS window_start,
                   (epoch_us(ts) - epoch_us(ts) // ${TumbleSec * UsPerSec}
                     * ${TumbleSec * UsPerSec}) * $OhlcIdBase + event_id AS okey,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents
            FROM events)
          SELECT event_type, window_start, COUNT(*) AS n_events,
                 arg_min(cents, okey) AS open_cents,
                 MAX(cents) AS high_cents,
                 MIN(cents) AS low_cents,
                 arg_max(cents, okey) AS close_cents
          FROM b GROUP BY event_type, window_start
          ORDER BY event_type, window_start""",
    "w5_time_range_window" ->
      s"""SELECT event_id, user_id, epoch_us(ts) AS tus,
                 COUNT(*) OVER w AS n_trailing,
                 CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT)
                   AS sum_cents_trailing
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
            RANGE BETWEEN ${TrailSec * UsPerSec} PRECEDING AND CURRENT ROW)
          ORDER BY event_id""",
    // The oracle uses DuckDB's NATIVE ASOF JOIN — an independent
    // implementation of the semantics (merge-scan vs our window pass).
    // Determinism probed across all SFs: no (user_id, µs) click ties.
    // w19: identical integer calendar math — no engine date functions
    "w19_traffic_profile" ->
      s"""WITH b AS (
            SELECT (epoch_us(ts) // ${86400L * 1000000L} + 3) % 7 AS dow,
                   (epoch_us(ts) // ${3600L * 1000000L}) % 24 AS hour,
                   COUNT(*) AS n_events
            FROM events GROUP BY 1, 2)
          SELECT dow, hour, n_events,
                 CAST(168 * n_events -
                   CAST(SUM(n_events) OVER () AS BIGINT) AS BIGINT)
                   AS excess_x168,
                 CAST(n_events AS DOUBLE) /
                   CAST(CAST(SUM(n_events) OVER () AS BIGINT) AS DOUBLE)
                   AS share
          FROM b ORDER BY dow, hour""",
    // w18: the oracle replays the UNBLOCKED θ-join with the identical
    // integer credit math — the hash compare certifies the banded
    // blocking found every (touch, purchase) pair exactly once
    "w18_linear_attribution" ->
      s"""WITH t AS (
            SELECT p.event_id AS pid, v.event_id AS tid,
                   v.event_type AS touch_type, epoch_us(v.ts) AS t_us,
                   COUNT(*) OVER (PARTITION BY p.event_id) AS n,
                   row_number() OVER (PARTITION BY p.event_id
                     ORDER BY epoch_us(v.ts) DESC, v.event_id DESC) AS rn
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            JOIN (SELECT * FROM events
                  WHERE event_type IN ('view', 'click')) v
              ON v.user_id = p.user_id
                 AND epoch_us(v.ts) < epoch_us(p.ts)
                 AND epoch_us(v.ts) >=
                   epoch_us(p.ts) - ${IntervalWindowSec * UsPerSec}),
          c AS (
            SELECT touch_type,
                   1000000 // n +
                     CASE WHEN rn = 1 THEN 1000000 % n ELSE 0 END AS ppm
            FROM t),
          b AS (
            SELECT touch_type, COUNT(*) AS n_touches,
                   CAST(SUM(ppm) AS BIGINT) AS credit_ppm
            FROM c GROUP BY 1)
          SELECT touch_type, n_touches, credit_ppm,
                 CAST(credit_ppm AS DOUBLE) /
                   CAST(CAST(SUM(credit_ppm) OVER () AS BIGINT) AS DOUBLE)
                   AS credit_share
          FROM b ORDER BY touch_type""",
    "w4_asof_join" -> AsofOracleSql,
    // w17 is the NATIVE-operator spelling of the same contract — the
    // oracle is shared verbatim, so the custom SparkPlan is held to
    // exactly w4's hash
    "w17_asof_native" -> AsofOracleSql,
    "w1_tumbling" ->
      s"""SELECT window_start, event_type, n_events,
                 CAST(sum_cents AS DOUBLE) / (100.0 * CAST(n_events AS DOUBLE)) AS avg_value
          FROM (
            SELECT epoch_us(ts) // ${TumbleSec * UsPerSec} * $TumbleSec AS window_start,
                   event_type, COUNT(*) AS n_events,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) AS sum_cents
            FROM events GROUP BY 1, 2)
          ORDER BY window_start, event_type""",
    "w2_sliding" ->
      s"""SELECT window_start, COUNT(*) AS n_events FROM (
            SELECT epoch_us(ts) AS tus,
                   unnest([epoch_us(ts) // ${SlideSec * UsPerSec} * $SlideSec,
                           epoch_us(ts) // ${SlideSec * UsPerSec} * $SlideSec - $SlideSec])
                     AS window_start
            FROM events)
          WHERE tus // $UsPerSec >= window_start
            AND tus // $UsPerSec < window_start + $SlideSizeSec
          GROUP BY window_start ORDER BY window_start""",
    // w22: w21's version CTEs + the strictly-before PIT rank (greatest
    // valid_from <= purchase_us - 1, ties to greatest version — the
    // native exec's tiebreak contract)
    "w22_pit_enrichment" ->
      s"""WITH flagged AS (
            SELECT user_id, event_id, epoch_us(ts) AS tus, event_type,
                   CASE WHEN lag(event_type) OVER w IS NULL
                          OR lag(event_type) OVER w <> event_type
                        THEN 1 ELSE 0 END AS chg
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
          ver AS (
            SELECT user_id, event_type, tus,
                   CAST(SUM(chg) OVER (PARTITION BY user_id
                     ORDER BY tus, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS version
            FROM flagged),
          v AS (
            SELECT user_id AS v_user, version,
                   MIN(event_type) AS state_type,
                   CAST(MIN(tus) AS BIGINT) AS valid_from_us,
                   COUNT(*) AS state_n
            FROM ver GROUP BY 1, 2),
          p AS (
            SELECT user_id, event_id AS purchase_id,
                   CAST(epoch_us(ts) AS BIGINT) AS purchase_us
            FROM events WHERE event_type = 'purchase'),
          j AS (
            SELECT p.user_id, p.purchase_id, p.purchase_us,
                   v.version, v.state_type, v.state_n,
                   row_number() OVER (PARTITION BY p.purchase_id
                     ORDER BY v.valid_from_us DESC, v.version DESC) AS rn
            FROM p JOIN v ON v.v_user = p.user_id
             AND v.valid_from_us <= p.purchase_us - 1)
          SELECT user_id, purchase_id, purchase_us, version,
                 state_type, state_n
          FROM j WHERE rn = 1 ORDER BY purchase_id""",
    // w21: gaps-and-islands to SCD2 intervals — same lag+run-sum CTEs
    // as w3 but flagged on TYPE change, aggregated to versions, and a
    // second window over the runs frame for valid_to / is_current
    "w21_scd2_history" ->
      s"""WITH flagged AS (
            SELECT user_id, event_id, epoch_us(ts) AS tus, event_type,
                   CASE WHEN lag(event_type) OVER w IS NULL
                          OR lag(event_type) OVER w <> event_type
                        THEN 1 ELSE 0 END AS chg
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
          ver AS (
            SELECT user_id, event_type, tus,
                   CAST(SUM(chg) OVER (PARTITION BY user_id
                     ORDER BY tus, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS version
            FROM flagged),
          agg AS (
            SELECT user_id, version, MIN(event_type) AS event_type,
                   CAST(MIN(tus) AS BIGINT) AS valid_from_us,
                   COUNT(*) AS n_events
            FROM ver GROUP BY 1, 2)
          SELECT user_id, version, event_type, valid_from_us,
                 CAST(COALESCE(LEAD(valid_from_us) OVER pv, -1) AS BIGINT)
                   AS valid_to_us,
                 LEAD(valid_from_us) OVER pv IS NULL AS is_current,
                 n_events
          FROM agg
          WINDOW pv AS (PARTITION BY user_id ORDER BY version)
          ORDER BY user_id, version""",
    "w3_sessions" ->
      s"""WITH flagged AS (
            SELECT user_id, event_id, epoch_us(ts) AS tus,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                          OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                             > ${SessionGapSec * UsPerSec}
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
          sess AS (
            SELECT user_id, tus,
                   CAST(SUM(new_session) OVER (PARTITION BY user_id
                     ORDER BY tus, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                     AS session_id
            FROM flagged)
          SELECT user_id, session_id,
                 MIN(tus) AS session_start_us,
                 MAX(tus) AS session_end_us,
                 COUNT(*) AS n_events
          FROM sess GROUP BY user_id, session_id
          ORDER BY user_id, session_id""",
    // w20: w3's sessionization CTEs + an in-session rank + an ordered
    // string_agg — the path strings are pure metadata, the counts
    // exact ints
    "w20_top_paths" ->
      s"""WITH flagged AS (
            SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                          OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                             > ${SessionGapSec * UsPerSec}
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
          sess AS (
            SELECT user_id, event_id, event_type, tus,
                   CAST(SUM(new_session) OVER (PARTITION BY user_id
                     ORDER BY tus, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                     AS session_id
            FROM flagged),
          r AS (
            SELECT user_id, session_id, event_type,
                   row_number() OVER (PARTITION BY user_id, session_id
                     ORDER BY tus, event_id) AS rnk
            FROM sess),
          p AS (
            SELECT user_id, session_id,
                   string_agg(event_type, '>' ORDER BY rnk) AS path,
                   COUNT(*) AS path_len
            FROM r WHERE rnk <= $PathLen GROUP BY 1, 2)
          SELECT path, CAST(path_len AS BIGINT) AS path_len,
                 COUNT(*) AS n_sessions
          FROM p GROUP BY 1, 2
          ORDER BY n_sessions DESC, path LIMIT $TopPaths""")
}
