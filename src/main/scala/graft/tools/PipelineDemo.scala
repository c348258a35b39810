package graft.tools

import graft.etl.Pipeline
import org.apache.spark.sql.SparkSession

/** Drive the full reference dataflow (RSS → dims; chunks → sentences →
  * entities) on the checked-in fixtures and print the warehouse.
  *
  * Usage: runMain graft.tools.PipelineDemo [feedsDir chunksDir]
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val feeds = if (args.length > 0) args(0) else "src/test/resources/feeds"
    val chunks = if (args.length > 1) args(1) else "src/test/resources/chunks"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val expected = Seq((1L, 3), (2L, 2), (3L, 1)).toDF("episode_id", "num_chunks")
    val wh = Pipeline.run(spark, feeds, chunks, expected)
    Seq(
      "time_dimension" -> wh.time, "podcast_dimension" -> wh.podcast,
      "episode_dimension" -> wh.episode, "sentence_dimension" -> wh.sentence,
      "entity_dimension" -> wh.entity).foreach { case (n, df) =>
      println(s"== $n (${df.count()} rows)")
      df.show(5, truncate = 48)
    }
    spark.stop()
  }
}
