package graft.etl

import graft.SparkSpec
import graft.nlp.Stubs
import org.apache.spark.sql.functions._

/** W2/J3 behavior per reference `lambda_72.py` (spans, clean + messy
  * capture, append-duplicates hazard).
  */
class EntitiesSpec extends SparkSpec {
  import spark.implicits._

  lazy val chunks = Transcripts.readChunks(spark, res("chunks"))
    .filter($"episode_id" === 1L)
  lazy val transcript = Transcripts.reduceTranscripts(chunks)
  lazy val sentences = Transcripts.tokenize(transcript)
  lazy val spans = Entities.sentenceSpans(sentences)

  test("spans partition the newline-joined text exactly (W2 invariant)") {
    val rows = spans.orderBy("sentence_index").collect()
    // consecutive: next start = previous end + 1 (the newline slot)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("span_start") == a.getAs[Long]("span_end") + 1)
      case _ =>
    }
    assert(rows.head.getAs[Long]("span_start") == 0L)
    // total span = Σ(len+1) = text length + number of sentences
    val text = transcript.select("text").as[String].head()
    assert(rows.last.getAs[Long]("span_end") == text.length)
  }

  test("stub entities carry valid offsets into the text") {
    val text = transcript.select("text").as[String].head()
    val ents = Stubs.stubEntities(transcript, "text").collect()
    assert(ents.nonEmpty)
    ents.foreach { e =>
      val b = e.getAs[Long]("begin_off").toInt
      val w = e.getAs[String]("entity_text")
      assert(text.substring(b, b + w.length) == w)
    }
  }

  test("clean capture: entity strictly inside a sentence aligns to it (J3)") {
    // "Bob" is word pos 2, begin 10, inside sentence 0
    val aligned = Entities.align(Stubs.stubEntities(transcript, "text"), spans)
    val bob = aligned.filter($"begin_off" === 10L).collect()
    assert(bob.length == 1 && bob.head.getAs[Int]("sentence_index") == 0)
  }

  test("messy capture: boundary offsets assign to the sentence where they begin") {
    val s0End = spans.orderBy("sentence_index")
      .select("span_end").as[Long].head()
    val probe = Seq(
      (1L, "x", "PERSON", s0End),      // ON the newline after sentence 0
      (1L, "y", "PERSON", s0End + 1))  // first char of sentence 1
      .toDF("episode_id", "entity_text", "entity_type", "begin_off")
    val got = Entities.align(probe, spans)
      .orderBy("begin_off")
      .select("sentence_index").as[Int].collect()
    assert(got.toSeq == Seq(0, 1)) // lambda_72.py:105-116 messy semantics
  }

  test("every in-range entity aligns to exactly one sentence (J3 totality)") {
    val ents = Stubs.stubEntities(transcript, "text")
    val aligned = Entities.align(ents, spans)
    assert(aligned.count() == ents.count())
    assert(aligned.groupBy("begin_off").count()
      .filter($"count" > 1).count() == 0)
  }

  test("entity dimension preserves append-duplicate hazard (no unique key)") {
    val ents = Stubs.stubEntities(transcript, "text")
    val dim = Entities.entityDimension(ents, sentences)
    val replayed = WarehouseWriter.appendFacts(dim, dim)
    assert(replayed.count() == dim.count() * 2) // replays double the facts
  }
}
