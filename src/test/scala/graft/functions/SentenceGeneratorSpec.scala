package graft.functions

import graft.SparkSpec
import graft.etl.Transcripts
import org.apache.spark.sql.functions._

/** Custom Generator vs the split+posexplode formulation. */
class SentenceGeneratorSpec extends SparkSpec {
  import spark.implicits._

  test("generator splits identically to the regex tokenizer") {
    val texts = Seq(
      (1L, "Alice met Bob. They talked! Was it fun? Yes."),
      (2L, "No terminator here"),
      (3L, "Trailing space after dot. "),
      (4L, "a.b stays joined. but this splits."))
      .toDF("episode_id", "text")
    val viaGenerator = texts
      .select(col("episode_id"), SentenceGenerator.sentences(col("text")))
      .orderBy("episode_id", "sentence_index")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val viaRegex = Transcripts.tokenize(texts)
      .orderBy("episode_id", "sentence_index")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(viaGenerator.toSeq == viaRegex.toSeq)
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
