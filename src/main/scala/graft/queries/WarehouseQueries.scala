package graft.queries

import graft.etl.Pipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference dashboard's queries VERBATIM over the real warehouse
  * tables (podcast/episode/sentence/entity dims built by the ETL from
  * the checked-in fixtures) — a user of the reference can run every
  * query they run today, same shapes, same parameters-with-defaults
  * (S16), same J2 bug. These entries have no DuckDB oracle (the
  * warehouse isn't a driver testdata table) → rows-only check; their
  * *semantics* are oracle-checked via the testdata analogs in
  * `Dashboard` and spec-checked in `etl/`.
  *
  * The warehouse materializes once per session (cached) — queries after
  * the first reuse it.
  */
object WarehouseQueries {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, Pipeline.Warehouse]()

  /** Fixture roots resolve against CWD first, then the repo's absolute
    * location — the driver may invoke Verify from elsewhere.
    */
  private def fixture(rel: String): String = {
    val cwd = new java.io.File(rel)
    if (cwd.isDirectory) cwd.getAbsolutePath
    else s"/root/repo/$rel"
  }

  private def wh(spark: SparkSession): Pipeline.Warehouse =
    cache.computeIfAbsent(spark, { s =>
      import s.implicits._
      val w = Pipeline.run(
        s,
        fixture("src/test/resources/feeds"),
        fixture("src/test/resources/chunks"),
        Seq((1L, 3), (2L, 2), (3L, 1)).toDF("episode_id", "num_chunks"))
      Pipeline.Warehouse(
        w.time.persist(), w.podcast.persist(), w.episode.persist(),
        w.sentence.persist(), w.entity.persist())
    })

  /** Q1 (`app.py:39`): distinct podcasts. */
  def q1(spark: SparkSession, dir: String): DataFrame =
    wh(spark).podcast.select(col("podcast_title")).distinct()
      .orderBy(col("podcast_title"))

  /** Q2 (`app.py:97-102`): episode ids of a podcast, most recent first
    * (MySQL's ORDER BY a non-selected column — episode_id kept through
    * the dedup then date dropped, SURVEY §2.4 A5 note).
    */
  def q2(spark: SparkSession, dir: String): DataFrame = {
    val w = wh(spark)
    val pid = w.podcast.orderBy(col("podcast_title")) // default param: first podcast
    w.episode
      .join(broadcast(pid.limit(1)), Seq("podcast_id"))
      .select(col("episode_id"), col("episode_release_date")).distinct()
      .orderBy(col("episode_release_date").desc, col("episode_id"))
      .select(col("episode_id"))
  }

  /** Q3 (`app.py:132-136`): entity types present in an episode (default
    * episode per S16).
    */
  def q3(spark: SparkSession, dir: String): DataFrame =
    wh(spark).entity.filter(col("episode_id") === 1L)
      .select(col("entity_type")).distinct().orderBy(col("entity_type"))

  /** Q4 (`app.py:180-187`): mention counts per entity text. */
  def q4(spark: SparkSession, dir: String): DataFrame =
    wh(spark).entity
      .filter(col("entity_type") === "ORGANIZATION" && col("episode_id") === 1L)
      .groupBy(col("entity_text"))
      .agg(count(lit(1)).as("num_occurences"))
      .orderBy(col("num_occurences").desc, col("entity_text"))

  /** Q5 (`app.py:230-238`) with the J2 BUG preserved: the LEFT JOIN is
    * on sentence_index ONLY (the sentence dim's unique key is
    * (sentence_index, episode_id), `lambda_2.py:68`) — with multiple
    * episodes loaded, same-index sentences from other episodes match.
    * The WHERE filters only the entity side (`app.py:232-234`).
    */
  def q5Bug(spark: SparkSession, dir: String): DataFrame = {
    val w = wh(spark)
    w.entity.filter(col("episode_id") === 1L)
      .select(col("sentence_index"))
      .join(
        w.sentence.select(col("sentence_index"), col("overall_sentiment")),
        Seq("sentence_index"), "left")
      .groupBy(col("overall_sentiment"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("overall_sentiment"))
  }

  /** Q5 corrected: strict join on (sentence_index, episode_id). */
  def q5Strict(spark: SparkSession, dir: String): DataFrame = {
    val w = wh(spark)
    w.entity.filter(col("episode_id") === 1L)
      .select(col("sentence_index"), col("episode_id"))
      .join(
        w.sentence.select(
          col("sentence_index"), col("episode_id"), col("overall_sentiment")),
        Seq("sentence_index", "episode_id"), "left")
      .groupBy(col("overall_sentiment"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("overall_sentiment"))
  }

  /** Q6 (`app.py:270,282-305`): rolling-50 mean of (positive - negative)
    * over sentence order (S11 arithmetic, W1 window, entity_text
    * lowercased tiebreak per SURVEY W1 determinism note).
    */
  def q6(spark: SparkSession, dir: String): DataFrame = {
    val w = wh(spark)
    val joined = w.entity.filter(col("episode_id") === 1L)
      .select(col("sentence_index"), lower(col("entity_text")).as("entity_text"))
      .join(
        w.sentence.select(
          col("sentence_index"), col("positive_score"), col("negative_score")),
        Seq("sentence_index"), "left")
    val win = Window.orderBy(col("sentence_index"), col("entity_text"))
      .rowsBetween(-49, 0)
    joined
      .withColumn("score", col("positive_score") - col("negative_score"))
      .withColumn("rolling", avg(col("score")).over(win))
      .orderBy(col("sentence_index"), col("entity_text"))
  }

  /** Q7 (`app.py:333-346`): normalized sentiment proportions per entity. */
  def q7(spark: SparkSession, dir: String): DataFrame = {
    val w = wh(spark)
    val total = col("avg_neu") + col("avg_pos") + col("avg_neg")
    w.entity.filter(col("episode_id") === 1L)
      .select(col("sentence_index"), col("entity_text"))
      .join(
        w.sentence.select(
          col("sentence_index"), col("neutral_score"),
          col("positive_score"), col("negative_score")),
        Seq("sentence_index"), "left")
      .groupBy(col("entity_text"))
      .agg(
        avg(col("neutral_score")).as("avg_neu"),
        avg(col("positive_score")).as("avg_pos"),
        avg(col("negative_score")).as("avg_neg"))
      .select(
        col("entity_text"),
        (col("avg_pos") / total).as("pos_prop"),
        (col("avg_neu") / total).as("neu_prop"),
        (col("avg_neg") / total).as("neg_prop"))
      .orderBy(col("pos_prop").desc, col("entity_text"))
  }

  /** Q8 (`app.py:365-367,385-399`): word frequency over the episode's
    * sentences after stopword removal (S15 newline flatten included).
    */
  def q8(spark: SparkSession, dir: String): DataFrame =
    wh(spark).sentence.filter(col("episode_id") === 1L)
      .select(regexp_replace(col("sentence_text"), "\n", " ").as("t"))
      .select(explode(split(lower(col("t")), "\\s+")).as("word"))
      .filter(col("word") =!= "" && !col("word").isin(Dashboard.Stopwords: _*))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "wh_q1_podcasts" -> q1,
    "wh_q2_episodes" -> q2,
    "wh_q3_entity_types" -> q3,
    "wh_q4_mentions" -> q4,
    "wh_q5_sentiment_bugcompat" -> q5Bug,
    "wh_q5_sentiment_strict" -> q5Strict,
    "wh_q6_rolling" -> q6,
    "wh_q7_proportions" -> q7,
    "wh_q8_wordcloud" -> q8)

  /** No oracle entries: the warehouse isn't visible to the driver's
    * DuckDB; rows-only check applies. Semantics are oracle-checked via
    * the Dashboard analogs.
    */
  val oracleSql: Map[String, String] = Map.empty
}
