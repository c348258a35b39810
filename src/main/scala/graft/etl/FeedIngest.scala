package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Metadata ingest (SURVEY.md §3.1, reference `lambda_2.py`): RSS XML →
  * time / podcast / episode dimensions. One declarative DAG replaces the
  * scrape→S3→Lambda choreography: XML read → nested projection →
  * explode(item) → date parse → dedup → surrogate keys.
  */
object FeedIngest {

  /** E5 — RSS source (`lambda_2.py:168-189`, xmltodict): Spark 4
    * built-in XML, one row per `<channel>`. Works on a directory of
    * feeds — each file is a row, schema inferred or fixed.
    */
  def readRss(spark: SparkSession, path: String): DataFrame =
    spark.read.format("xml").option("rowTag", "channel").load(path)

  case class FeedDims(time: DataFrame, podcast: DataFrame, episode: DataFrame)

  /** S9 — RFC-822 pubDate → date, null on failure (`lambda_2.py:108-114`).
    * Spark's post-3.0 parser rejects `EEE` in parse patterns — the
    * weekday prefix is stripped first. Legal RFC-822 varies: single-digit
    * days ('5 Jun'), named zones ('GMT', 'EST'), and second-less times —
    * coalesce over the pattern matrix ('d' also matches 2-digit days,
    * 'zzz' the zone names), still null when nothing matches.
    */
  def parsePubDate(pubDate: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    coalesce(
      Seq("d MMM yyyy HH:mm:ss Z", "d MMM yyyy HH:mm:ss zzz",
          "d MMM yyyy HH:mm Z", "d MMM yyyy HH:mm zzz").map { p =>
        try_to_timestamp(
          regexp_replace(pubDate, "^[A-Za-z]{3},\\s*", ""), lit(p))
      }: _*)
      .cast("date")

  /** The ingest proper (`lambda_2.py:173-238`). Surrogate keys are
    * xxhash64 of the natural unique key (podcast_title / link) — stable
    * across retries, no driver-side sequence at 100 TB. pubDate parses
    * RFC-822 with null-on-failure (S9, `lambda_2.py:108-114`) via
    * try_to_timestamp (ANSI-safe).
    */
  def ingest(channels: DataFrame): FeedDims = {
    val podcast = channels
      .select(
        xxhash64(col("title")).as("podcast_id"),
        col("title").as("podcast_title"),
        col("description"))
      .dropDuplicates("podcast_title")

    val items = channels
      .select(col("title").as("podcast_title"), explode(col("item")).as("it"))
      .select(
        col("podcast_title"),
        col("it.enclosure._url").as("link"),
        parsePubDate(col("it.pubDate")).as("episode_release_date"),
        col("it.title").as("episode_title"),
        col("it.description").as("episode_description"))

    val episode = items
      .join(
        broadcast(podcast.select(col("podcast_title"), col("podcast_id"))),
        Seq("podcast_title"))                       // J1 lookup join
      .select(
        xxhash64(col("link")).as("episode_id"),
        col("link"),
        col("podcast_id"),
        col("episode_release_date"),
        col("episode_title"),
        col("episode_description"),
        lit(false).as("downloaded"),
        lit(0).as("num_chunks"))
      .dropDuplicates("link")                       // unique key on link

    // A4 + S10 — distinct dates with derived parts (`lambda_2.py:93-106,
    // 192-202`); month name via date_format, no lookup dict needed.
    val time = episode
      .select(col("episode_release_date").as("date"))
      .filter(col("date").isNotNull)
      .distinct()
      .select(
        col("date"),
        year(col("date")).as("year"),
        date_format(col("date"), "MMMM").as("month"),
        month(col("date")).as("month_number"),
        dayofmonth(col("date")).as("day"))

    FeedDims(time, podcast, episode)
  }
}
