package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E3/E4/U2 — the feed-list JSON interchange (reference
  * `lambda_1.py:74-82` writes a JSON array of [name, url] pairs with a
  * header pair first; `lambda_2.py:155-162` reads it back and drops the
  * header row). The header row is a schema artifact (SURVEY §2.7 U2) —
  * the engine's schema lives in metadata, but both directions keep
  * wire-format compatibility with the reference.
  */
object FeedList {

  /** E4 — read the reference's feed-list format: a single JSON document
    * `[["podcast_name","rss_feed"], ["name","url"], ...]`; header
    * dropped (`lambda_2.py:157`).
    */
  def read(spark: SparkSession, path: String): DataFrame =
    // rows are JSON arrays, not objects — whole-doc read + from_json.
    // The header is POSITIONAL (always the first pair, `lambda_1.py:74`):
    // drop element 0, not rows whose name happens to equal the header
    // text (a feed literally named "podcast_name", or a null name, is a
    // legal data row).
    spark.read
      .option("wholetext", true)
      .text(path)
      .select(posexplode(from_json(
        col("value"),
        org.apache.spark.sql.types.DataType.fromDDL("array<array<string>>"))))
      .filter(col("pos") > 0)
      .select(
        element_at(col("col"), 1).as("podcast_name"),
        element_at(col("col"), 2).as("rss_feed"))

  /** E3 — write the same wire format (header pair first,
    * `lambda_1.py:74-76`). Driver-side single-doc JSON: the feed list
    * is tiny control metadata (tens of rows), not data — collect is
    * intentional and bounded.
    */
  /** JSON string escape — naked interpolation would emit an invalid
    * wire file for names containing quotes (shared impl:
    * functions.JsonText).
    */
  private def jstr(s: String): String = graft.functions.JsonText.quote(s)

  def write(df: DataFrame, path: String): Unit = {
    val rows = df
      .select(col("podcast_name"), col("rss_feed"))
      .collect()
      .map(r => s"[${jstr(r.getString(0))},${jstr(r.getString(1))}]")
    val json =
      ("""["podcast_name","rss_feed"]""" +: rows).mkString("[", ",", "]")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)
  }

  /** U1 — the hardcoded-feeds union (`lambda_1.py:70-72`): static feeds
    * prepended to scraped ones; on a duplicate feed URL the static row
    * wins (anti-join, deterministic — dropDuplicates would pick an
    * arbitrary row).
    */
  def withStaticFeeds(scraped: DataFrame, static: DataFrame): DataFrame =
    static.unionByName(
      scraped.join(static.select(col("rss_feed")), Seq("rss_feed"), "left_anti")
        .select(static.columns.map(col): _*))
}
