package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed ingest pipeline: near-dedup THEN windowed distinct —
  * two stateful operators chained in ONE streaming query, where the
  * `StreamNearDedup` and `StreamSketch` twins were each proven alone.
  * This is the shape a real training-data ingest runs: drop
  * near-duplicates at the door, then report per-window unique-survivor
  * counts downstream.
  *
  * The chain works because (a) the dedup stage's
  * `flatMapGroupsWithState` runs in Append mode with EVENT-TIME
  * timeout, the one configuration Spark permits upstream of further
  * stateful operators, and (b) its output carries the event-time
  * column ([[StreamNearDedup.FlagTs]]), re-declared with
  * `withWatermark` so the downstream window aggregation closes on the
  * same global watermark. State stays bounded at both stages: the
  * dedup buckets prune to the watermark, and HLL++ registers are
  * fixed-size per open window.
  *
  * Spark's `statefulOperator.checkCorrectness` flags EVERY
  * fMGWS→aggregation chain, because an arbitrary stateful function
  * may hold rows back and emit them after the watermark has passed
  * them downstream. THIS function cannot: `scanBucket` emits each
  * doc's flag in the micro-batch the doc arrives in (no holdback),
  * input rows older than the watermark were already dropped at the
  * source watermark, late-row filtering downstream uses the
  * batch-START watermark (the same one the input passed), and both
  * stages declare the SAME delay — so no emitted row can be late for
  * the aggregation. The check is therefore disabled for exactly this
  * query shape (the documented escape hatch for pass-through
  * stateful stages); the spec proves the composition batch-identical
  * on shuffled arrivals.
  */
object StreamDedupSketch {

  val WindowLength = "1 day"

  /** The session conf this chain requires, surfaced so callers don't
    * have to discover it from the spec: Spark's blanket
    * fMGWS→aggregation check must be off for THIS query (see the
    * class doc for why the chain is nevertheless watermark-correct).
    * Set it before `writeStream.start()`:
    * `spark.conf.set(RequiredConf._1, RequiredConf._2)`.
    */
  val RequiredConf: (String, String) =
    ("spark.sql.streaming.statefulOperator.checkCorrectness.enabled",
      "false")

  /** docs: streaming frame with (doc_id, `timeCol` timestamp, text).
    * Emits one (day_start, approx_unique_docs) row per closed day
    * window, counting only the docs the dedup stage kept.
    */
  def apply(
      docs: DataFrame, timeCol: String, delay: String): DataFrame = {
    val conf = docs.sparkSession.conf
    require(
      conf.getOption(RequiredConf._1).contains(RequiredConf._2),
      s"StreamDedupSketch chains flatMapGroupsWithState into a windowed " +
        s"aggregation, which Spark's blanket correctness check rejects at " +
        s"query start even though this chain holds no rows back (see the " +
        s"Scaladoc). Set ${RequiredConf._1}=${RequiredConf._2} before " +
        s"building the query — e.g. spark.conf.set(StreamDedupSketch." +
        s"RequiredConf._1, StreamDedupSketch.RequiredConf._2).")
    StreamNearDedup.withTime(docs, timeCol, delay)
      .filter(col("dupOf") === -1L)
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), WindowLength))
      .agg(approx_count_distinct(col("docId")).as("approx_unique_docs"))
      .select(
        col("window.start").as("day_start"),
        col("approx_unique_docs"))
  }
}
