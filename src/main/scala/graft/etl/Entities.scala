package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity alignment (SURVEY.md §3.2 tail, reference `lambda_72.py`):
  * entity char offsets → sentence index via running spans + a range
  * join, then entity_dimension facts.
  */
object Entities {

  /** W2 — running character spans per sentence (`lambda_72.py:66-71`):
    * each sentence occupies [span_start, span_start+len] in the
    * newline-joined text, +1 for its trailing '\n'
    * (`lambda_72.py:60`). Window is per-episode — parallel across
    * episodes.
    */
  def sentenceSpans(sentences: DataFrame): DataFrame = {
    val w = Window
      .partitionBy(col("episode_id"))
      .orderBy(col("sentence_index"))
      .rowsBetween(Window.unboundedPreceding, -1)
    sentences
      .withColumn("len", length(col("sentence_text")).cast("long"))
      .withColumn(
        "span_start",
        coalesce(sum(col("len") + 1).over(w), lit(0L)))
      .select(
        col("episode_id"), col("sentence_index"),
        col("span_start"), (col("span_start") + col("len")).as("span_end"))
  }

  /** J3 — the two-pointer interval alignment (`lambda_72.py:83-118`) as
    * a range join: an entity belongs to the last sentence whose span has
    * begun and not been passed — `begin_off >= span_start AND
    * begin_off < span_end + 1`. This reproduces both the "clean capture"
    * (strictly inside) and the "messy capture" (straddling a boundary →
    * assigned to the sentence where it begins, `lambda_72.py:105-116`).
    *
    * Physically an equi-join on episode_id with the range predicate as
    * residual — co-partitions at any scale.
    */
  def align(entities: DataFrame, spans: DataFrame): DataFrame =
    entities.join(
      spans,
      entities("episode_id") === spans("episode_id") &&
        col("begin_off") >= col("span_start") &&
        col("begin_off") < col("span_end") + 1)
      .select(
        entities("episode_id"), col("entity_text"), col("entity_type"),
        col("sentence_index"), col("begin_off"))

  /** Facts rows (`lambda_2.py:73-82`). entity_id is a content hash, NOT
    * a unique key — the table has none in the reference, so replays
    * append duplicates (hazard preserved; see
    * WarehouseWriter.appendFacts).
    */
  def entityDimension(
      entities: DataFrame,
      sentences: DataFrame): DataFrame =
    align(entities, sentenceSpans(sentences))
      .select(
        xxhash64(
          col("episode_id"), col("begin_off"), col("entity_text"))
          .as("entity_id"),
        col("episode_id"),
        col("entity_text"),
        col("entity_type"),
        col("sentence_index"))
}
