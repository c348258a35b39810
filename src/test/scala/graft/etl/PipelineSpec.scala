package graft.etl

import graft.SparkSpec

/** End-to-end composition (SURVEY §3): fixtures → five warehouse tables. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  lazy val wh: Pipeline.Warehouse = Pipeline.run(
    spark, res("feeds"), res("chunks"),
    Seq((1L, 3), (2L, 2), (3L, 1)).toDF("episode_id", "num_chunks"))

  test("all five warehouse tables materialize") {
    assert(wh.podcast.count() == 2)
    assert(wh.episode.count() == 4)
    assert(wh.time.count() == 2)
    assert(wh.sentence.count() == 8) // episodes 1 (6) + 3 (2); 2 is incomplete
    assert(wh.entity.count() > 0)
  }

  test("Q4 shape over the warehouse: mention counts per entity") {
    import org.apache.spark.sql.functions._
    val q4 = wh.entity
      .groupBy($"entity_text")
      .agg(count(lit(1)).as("num_occurences"))
      .orderBy($"num_occurences".desc, $"entity_text")
    assert(q4.count() > 0)
  }

  test("Q5 shape: entity ⟕ sentence join on sentence_index + episode strict variant") {
    val j = wh.entity.join(
      wh.sentence, Seq("sentence_index", "episode_id"), "left")
    assert(j.count() == wh.entity.count()) // strict join loses nothing
  }
}
