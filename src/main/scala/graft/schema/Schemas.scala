package graft.schema

import org.apache.spark.sql.types._

/** Explicit StructTypes for the five warehouse tables (SURVEY.md §1.2,
  * reference DDL `lambda_2.py:24-88`). Divergences from the reference,
  * both documented in SURVEY §1.3: surrogate keys are stable `xxhash64`
  * of the natural key instead of AUTO_INCREMENT (deterministic and
  * retry-safe at 100 TB), and sentiment scores are full doubles instead
  * of MySQL FLOAT(4,4) (whose 0.9999 cap truncates real Comprehend
  * scores).
  */
object Schemas {

  /** `lambda_2.py:24-32` — time modeled as an explicit dimension. */
  val timeDimension: StructType = StructType(Seq(
    StructField("date", DateType, nullable = false),
    StructField("year", IntegerType, nullable = false),
    StructField("month", StringType, nullable = false),
    StructField("month_number", IntegerType, nullable = false),
    StructField("day", IntegerType, nullable = false)))

  /** `lambda_2.py:34-40`; unique key podcast_title. */
  val podcastDimension: StructType = StructType(Seq(
    StructField("podcast_id", LongType, nullable = false),
    StructField("podcast_title", StringType, nullable = false),
    StructField("description", StringType)))

  /** `lambda_2.py:42-55`; unique key link; FK podcast_id, release date. */
  val episodeDimension: StructType = StructType(Seq(
    StructField("episode_id", LongType, nullable = false),
    StructField("link", StringType, nullable = false),
    StructField("podcast_id", LongType),
    StructField("episode_release_date", DateType),
    StructField("episode_title", StringType),
    StructField("episode_description", StringType),
    StructField("downloaded", BooleanType, nullable = false),
    StructField("num_chunks", IntegerType, nullable = false)))

  /** `lambda_2.py:57-71`; unique key (sentence_index, episode_id). */
  val sentenceDimension: StructType = StructType(Seq(
    StructField("sentence_id", LongType, nullable = false),
    StructField("sentence_text", StringType),
    StructField("sentence_index", IntegerType, nullable = false),
    StructField("overall_sentiment", StringType),
    StructField("negative_score", DoubleType),
    StructField("neutral_score", DoubleType),
    StructField("positive_score", DoubleType),
    StructField("mixed_score", DoubleType),
    StructField("episode_id", LongType, nullable = false)))

  /** `lambda_2.py:73-82` — the facts table; deliberately NO unique key
    * (the reference's INSERT IGNORE can therefore never dedup it and
    * replays duplicate facts — hazard preserved, see
    * WarehouseWriter.appendFacts).
    */
  val entityDimension: StructType = StructType(Seq(
    StructField("entity_id", LongType, nullable = false),
    StructField("episode_id", LongType, nullable = false),
    StructField("entity_text", StringType),
    StructField("entity_type", StringType),
    StructField("sentence_index", IntegerType)))
}
