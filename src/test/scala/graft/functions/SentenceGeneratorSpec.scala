package graft.functions

import graft.SparkSpec
import graft.etl.Transcripts
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Custom Generator vs the split+posexplode declared-semantics
  * reference. The reference here is the INLINE regex formulation, not
  * `Transcripts.tokenize` (which routes through the Generator itself —
  * comparing against it would be vacuous).
  */
class SentenceGeneratorSpec extends SparkSpec {
  import spark.implicits._

  /** The declared semantics: split after `.!?` + `\s+` (Java regex \s =
    * ASCII space/\t/\n/VT/\f/\r — no UNICODE_CHARACTER_CLASS).
    */
  private def viaRegex(texts: DataFrame): Seq[(Long, Int, String)] =
    texts
      .select(
        col("episode_id"),
        posexplode(split(col("text"), "(?<=[.!?])\\s+"))
          .as(Seq("sentence_index", "sentence_text")))
      .orderBy("episode_id", "sentence_index")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq

  private def viaGenerator(texts: DataFrame): Seq[(Long, Int, String)] =
    texts
      .select(col("episode_id"), SentenceGenerator.sentences(col("text")))
      .orderBy("episode_id", "sentence_index")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq

  test("generator splits identically to the inline regex reference") {
    val texts = Seq(
      (1L, "Alice met Bob. They talked! Was it fun? Yes."),
      (2L, "No terminator here"),
      (3L, "Trailing space after dot. "),
      (4L, "a.b stays joined. but this splits."),
      (5L, "Tab.\tthen newline.\ncarriage.\rformfeed.\fvtab.VTdone"))
      .toDF("episode_id", "text")
    assert(viaGenerator(texts) == viaRegex(texts))
  }

  test("generator matches regex \\s (ASCII) on Unicode whitespace: no split") {
    // U+00A0 nbsp, U+2028 line sep, U+1680 ogham mark: Unicode
    // whitespace that Java regex \s does NOT match — neither splits.
    val texts = Seq(
      (1L, "End.\u00A0NoSplit here. real split"),
      (2L, "Line.\u2028Sep stays joined! yes"),
      (3L, "Ogham.\u1680Mark? still joined. done"))
      .toDF("episode_id", "text")
    val gen = viaGenerator(texts)
    assert(gen == viaRegex(texts))
    // and explicitly: the Unicode-whitespace terminators did not split
    assert(gen.count(_._1 == 1L) == 2 && gen.exists(_._3.contains("\u00A0")))
  }

  test("generator handles nulls and fixture transcripts") {
    val withNull = Seq((1L, Option("One. Two.")), (2L, Option.empty[String]))
      .toDF("episode_id", "text")
    val rows = withNull
      .select(col("episode_id"), SentenceGenerator.sentences(col("text")))
      .collect()
    assert(rows.count(_.getLong(0) == 1L) == 2)
    assert(!rows.exists(_.getLong(0) == 2L)) // null input generates nothing

    val chunks = Transcripts.readChunks(spark, res("chunks"))
    val t = Transcripts.reduceTranscripts(chunks.filter($"episode_id" === 1L))
    val gen = t.select(SentenceGenerator.sentences(col("text")))
      .orderBy("sentence_index").select("sentence_text").as[String].collect()
    assert(gen.length == 6 && gen.head == "Alice met Bob in Paris.")
  }
}
