package graft.etl

import graft.SparkSpec

/** Keeps `tools/PipelineDemo.trace` green: the one-invocation
  * feed→transcript→sentence→entity→Q1–Q8 walk the README points users
  * at. Row counts pinned where the fixture makes them exact; queries
  * asserted non-empty (their VALUES are the DuckDB oracle's job).
  */
class PipelineDemoSpec extends SparkSpec {

  lazy val counts: Map[String, Long] =
    graft.tools.PipelineDemo.trace(spark).toMap

  test("the trace covers the five tables and every wh_* registry query") {
    val expectedKeys = Set("time_dimension", "podcast_dimension",
      "episode_dimension", "sentence_dimension", "entity_dimension") ++
      graft.queries.WarehouseQueries.queries.keySet
    assert(counts.keySet == expectedKeys)
  }

  test("fixture-exact table counts") {
    assert(counts("podcast_dimension") == 2)
    assert(counts("episode_dimension") == 4)
    assert(counts("time_dimension") == 2)
    // episodes 1 (6 sentences) + 3 (2); episode 2 is chunk-incomplete
    // and must be held back by the A6 barrier
    assert(counts("sentence_dimension") == 8)
    assert(counts("entity_dimension") > 0)
  }

  test("every dashboard query returns rows over the pipeline's warehouse") {
    val empty = graft.queries.WarehouseQueries.queries.keySet
      .filter(counts(_) == 0L)
    assert(empty.isEmpty, s"dashboard queries returned no rows: $empty")
  }

  test("the J2 bug-compat join fans out beyond its strict variant") {
    // the reference's sentence_index-only join matches same-index
    // sentences across episodes; the strict (index, episode) join does
    // not — the demo trace exhibits the bug the queries preserve
    assert(counts("wh_q5_sentiment_bugcompat") >= counts("wh_q5_sentiment_strict"))
  }
}
