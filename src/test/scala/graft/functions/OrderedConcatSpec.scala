package graft.functions

import graft.SparkSpec

/** A7 typed Aggregator: equals the built-in formulation. */
class OrderedConcatSpec extends SparkSpec {
  import spark.implicits._

  test("ordered concat aggregator joins in chunk order") {
    val chunks = Seq(
      (1L, 3, "three."), (1L, 1, "One"), (1L, 2, "two"),
      (2L, 1, "solo")).toDS()
    val got = chunks
      .groupByKey(_._1)
      .agg(OrderedConcat.toColumn.name("text"))
      .collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "One two three."), (2L, "solo")))
  }

  test("matches Transcripts.reduceTranscripts on the fixtures") {
    val df = graft.etl.Transcripts.readChunks(spark, res("chunks"))
    val builtin = graft.etl.Transcripts.reduceTranscripts(df)
      .orderBy("episode_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val agg = df.as[(Long, Int, String)]
      .groupByKey(_._1)
      .agg(OrderedConcat.toColumn.name("text"))
      .collect().sortBy(_._1).toSeq
    assert(agg == builtin)
  }
}
