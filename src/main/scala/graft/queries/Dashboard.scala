package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference dashboard's 8 analytical queries (SURVEY.md §2.4–§2.6,
  * §3.3), re-expressed over the driver testdata tables. Each query keeps
  * the reference's relational shape (the operator under test) while
  * swapping the podcast warehouse tables for their TPC-H-ish analogs
  * (FIXTURES.md §B mapping).
  *
  * Determinism: every query ends in a total order (explicit tiebreaks) so
  * the DuckDB oracle hash-compares exactly. Floating aggregates are
  * rounded to a fixed scale in BOTH engines (SURVEY §7.3).
  */
object Dashboard {

  /** Q1 — `SELECT DISTINCT podcast_title FROM podcast_dimension`
    * (reference `ec2_data/app.py:39`). Analog: distinct market segments.
    * Scale: distinct on a low-cardinality column → partial-agg map side,
    * tiny shuffle.
    */
  def q1DistinctPodcasts(spark: SparkSession, dir: String): DataFrame =
    customer(spark, dir)
      .select(col("c_mktsegment"))
      .distinct()
      .orderBy(col("c_mktsegment"))

  /** Q2 — distinct episode ids of one podcast, most recent first
    * (reference `ec2_data/app.py:97-102`; MySQL permits ORDER BY a column
    * outside the DISTINCT list — here the ordered column is kept in the
    * output, the documented-divergence variant from SURVEY §2.4 A5).
    * Analog: distinct order dates of one customer, newest first.
    */
  def q2EpisodesByPodcast(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .filter(col("o_custkey") === lit(7))
      .select(col("o_orderdate"))
      .distinct()
      .orderBy(col("o_orderdate").desc)

  /** Q3 — distinct entity types present in one episode
    * (reference `ec2_data/app.py:132-136`). Analog: distinct return flags
    * in a key range. Filter is pushed to the parquet scan.
    */
  def q3EntityTypes(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .filter(col("l_orderkey") <= lit(100))
      .select(col("l_returnflag"))
      .distinct()
      .orderBy(col("l_returnflag"))

  /** Q4 [A1] — mention counts per entity, descending
    * (reference `ec2_data/app.py:180-187`):
    * `SELECT entity_text, COUNT(*) WHERE entity_type=? AND episode_id=?
    *  GROUP BY entity_text ORDER BY num_occurences DESC`.
    * Analog: part brands under a size filter. Hash aggregate with map-side
    * partial combine; the global sort is over group cardinality (small),
    * not input rows.
    */
  def q4MentionCounts(spark: SparkSession, dir: String): DataFrame =
    part(spark, dir)
      .filter(col("p_size") < lit(20))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("num_occurences"))
      .orderBy(col("num_occurences").desc, col("p_brand"))

  /** Q5 [A2+J2] — sentiment distribution: LEFT JOIN then group-count
    * (reference `ec2_data/app.py:230-238`). Analog: lineitem ⟕ orders on
    * the order key, counts per order status.
    * Scale: the dimension side auto-broadcasts under the 10 MB threshold;
    * at 100 TB the same plan AQE-selects sort-merge with both sides
    * shuffled on the equi-key — no code change needed.
    */
  def q5SentimentPie(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .join(
        orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"),
        "left")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("num_sentences"))
      .orderBy(col("num_sentences").desc, col("o_orderstatus"))

  /** Q6 [W1] — rolling mean over 50 rows, min_periods=1
    * (reference `ec2_data/app.py:270,282-305`: pandas
    * `rolling(window=50, min_periods=1).mean()` after SQL
    * `ORDER BY sentence_index`). Analog: rolling average event value over
    * time order, `event_id` as the total-order tiebreak (SURVEY §2.5 W1
    * determinism note).
    *
    * Scale note: the reference semantics are a single global ordering.
    * Round 1 implemented it as one unpartitioned window (single-task
    * sort); this is the two-phase range-partitioned formulation — same
    * exact results, every stage partition-parallel.
    *
    * Exactness: `round(avg, k)` diverges between engines at decimal
    * midpoints (observed at sf0.001). The testdata values are exact
    * 2-decimal numbers, so the mean is computed over integer cents —
    * the windowed sum is exact in both engines and the final IEEE double
    * division of identical integers is bit-identical. No rounding needed.
    */
  /** q6's prefix frame BEFORE the shared checkpoint — exposed so the
    * plan audit can still see the window machinery (all `__pid`-bucket
    * partitioned): the registered query checkpoints this frame, which
    * truncates its lineage out of the final plan.
    */
  def q6PrefixFrame(spark: SparkSession, dir: String): DataFrame = {
    // Two-phase rolling window — no single-partition Window.orderBy
    // (round 1 shipped the naive global window: one task sorts and
    // scans ALL rows, the 100×-scale bottleneck).
    //
    //   rolling_sum(i) = prefix(i) - prefix(i-50)   [prefix(j<=0) = 0]
    //
    // The global index + running sum come from operators.GlobalPrefix
    // (quantile-bucketed two-phase prefix scan, every stage partition-
    // parallel, data-derived bucket ids — see its scaladoc for the AQE
    // recomputation hazard that rules out spark_partition_id). The
    // prefix 50 rows back is then an equi-join on the global index.
    // All sums are exact integer cents; the final division is the same
    // IEEE op as the single-window form, so values are unchanged.
    val base = events(spark, dir)
      .select(col("event_id"), col("ts"), col("value"))
      .withColumn("cents", round(col("value") * 100).cast("long"))
    graft.operators.GlobalPrefix.withPrefix(
      base, col("ts"), Seq(col("event_id")), col("cents"),
      // the input is a bare parquet scan + projection: re-reading it for
      // the two prefix passes is cheaper than writing + reading a
      // per-invocation checkpoint copy of the whole event stream
      checkpointInput = false)
  }

  def q6RollingSentiment(spark: SparkSession, dir: String): DataFrame = {
    // lazy local checkpoint (r17 opt): the self-join below consumes
    // the prefix frame twice, and only the bucket Exchange of the
    // duplicated subtree was AQE-reusable — the per-bucket window pass
    // ran TWICE. Checkpointing materializes the prefix frame once and
    // both join sides read it; lazy, so the one materialization happens
    // inside the query's own first job (values unchanged).
    val glob = q6PrefixFrame(spark, dir)
      .localCheckpoint(eager = false)
    val back50 = glob.select(
      (col("gidx") + 50).as("pidx"), col("prefix").as("ppre"))
    glob.join(back50, col("gidx") === col("pidx"), "left")
      .withColumn("sum_cents", col("prefix") - coalesce(col("ppre"), lit(0L)))
      .withColumn("cnt", least(col("gidx"), lit(50L)))
      .withColumn(
        "rolling_avg",
        col("sum_cents").cast("double") / (lit(100.0) * col("cnt").cast("double")))
      .select(col("event_id"), col("value"), col("rolling_avg"))
      .orderBy(col("event_id"))
  }

  /** Q7 [A3+S12] — per-group sentiment proportions: three AVGs normalized
    * by their sum, ordered by the positive share
    * (reference `ec2_data/app.py:333-346`). Analog: discount/tax/quantity
    * shares per return flag. Single hash aggregate; the ratio is a
    * post-aggregation projection exactly as in the reference SQL.
    *
    * Exactness: AVG(x)/(ΣAVG) over one group = SUM(x)/(ΣSUM) — the group
    * count cancels — so the proportions are IEEE divisions of exact
    * integer cent sums, bit-identical across engines (see q6 note).
    */
  def q7SentimentProportions(spark: SparkSession, dir: String): DataFrame = {
    def cents(c: String) = round(col(c) * 100).cast("long")
    val total = (col("sum_pos") + col("sum_neu") + col("sum_neg")).cast("double")
    lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        sum(cents("l_discount")).as("sum_pos"),
        sum(cents("l_tax")).as("sum_neu"),
        sum(cents("l_quantity")).as("sum_neg"))
      .select(
        col("l_returnflag"),
        (col("sum_pos").cast("double") / total).as("pos_prop"),
        (col("sum_neu").cast("double") / total).as("neu_prop"),
        (col("sum_neg").cast("double") / total).as("neg_prop"))
      .orderBy(col("pos_prop").desc, col("l_returnflag"))
  }

  /** Words the reference's wordcloud drops (`ec2_data/app.py:365-367`,
    * WordCloud STOPWORDS). Fixed list so engine and oracle agree.
    */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
      "for", "on", "with", "as", "at", "by")

  /** Q8 [A8] — word frequency after lowercasing + stopword removal
    * (reference `ec2_data/app.py:365-367,385-399`; the WordCloud
    * frequency computation moved into the engine per SURVEY §3.3).
    * explode → filter → hash-agg; top-200 under a total order.
    * Scale: `split`+`explode` is codegen'd and streaming-friendly; the
    * agg shuffles only (word, partial_count) pairs.
    */
  def q8WordFrequency(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(explode(split(lower(col("text")), "\\s+")).as("word"))
      .filter(col("word") =!= "" && !col("word").isin(Stopwords: _*))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(200)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_distinct_podcasts" -> q1DistinctPodcasts,
    "q2_episodes_by_podcast" -> q2EpisodesByPodcast,
    "q3_entity_types" -> q3EntityTypes,
    "q4_mention_counts" -> q4MentionCounts,
    "q5_sentiment_pie" -> q5SentimentPie,
    "q6_rolling_sentiment" -> q6RollingSentiment,
    "q7_sentiment_proportions" -> q7SentimentProportions,
    "q8_word_frequency" -> q8WordFrequency)

  val oracleSql: Map[String, String] = Map(
    "q1_distinct_podcasts" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
    "q2_episodes_by_podcast" ->
      "SELECT DISTINCT o_orderdate FROM orders WHERE o_custkey = 7 ORDER BY o_orderdate DESC",
    "q3_entity_types" ->
      "SELECT DISTINCT l_returnflag FROM lineitem WHERE l_orderkey <= 100 ORDER BY l_returnflag",
    "q4_mention_counts" ->
      """SELECT p_brand, COUNT(*) AS num_occurences FROM part WHERE p_size < 20
         GROUP BY p_brand ORDER BY num_occurences DESC, p_brand""",
    "q5_sentiment_pie" ->
      """SELECT o_orderstatus, COUNT(*) AS num_sentences
         FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
         GROUP BY o_orderstatus ORDER BY num_sentences DESC, o_orderstatus""",
    "q6_rolling_sentiment" ->
      """SELECT event_id, value,
                CAST(SUM(cents) OVER w AS DOUBLE)
                  / (100.0 * CAST(COUNT(cents) OVER w AS DOUBLE)) AS rolling_avg
         FROM (SELECT event_id, ts, value,
                      CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events)
         WINDOW w AS (ORDER BY ts, event_id ROWS BETWEEN 49 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",
    "q7_sentiment_proportions" ->
      """SELECT l_returnflag,
                CAST(sum_pos AS DOUBLE) / CAST(sum_pos + sum_neu + sum_neg AS DOUBLE) AS pos_prop,
                CAST(sum_neu AS DOUBLE) / CAST(sum_pos + sum_neu + sum_neg AS DOUBLE) AS neu_prop,
                CAST(sum_neg AS DOUBLE) / CAST(sum_pos + sum_neu + sum_neg AS DOUBLE) AS neg_prop
         FROM (SELECT l_returnflag,
                      SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS sum_pos,
                      SUM(CAST(ROUND(l_tax * 100) AS BIGINT)) AS sum_neu,
                      SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS sum_neg
               FROM lineitem GROUP BY l_returnflag)
         ORDER BY pos_prop DESC, l_returnflag""",
    "q8_word_frequency" ->
      s"""SELECT word, COUNT(*) AS cnt
          FROM (SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS word
                FROM documents)
          WHERE word <> '' AND word NOT IN (${Stopwords.map(w => s"'$w'").mkString(", ")})
          GROUP BY word ORDER BY cnt DESC, word LIMIT 200""")
}
