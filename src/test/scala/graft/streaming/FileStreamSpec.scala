package graft.streaming

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.10 file-arrival triggers: the reference's S3 ObjectCreated events
  * (suffix-filtered, `main.tf:278-287` etc.) map to a Structured
  * Streaming file source with pathGlobFilter — files dropped into the
  * directory between micro-batches are picked up incrementally, exactly
  * once.
  */
class FileStreamSpec extends SparkSpec {

  test("file source picks up suffix-filtered files incrementally") {
    val dir = Files.createTempDirectory("filestream").toString
    val schema = StructType(Seq(
      StructField("episode_id", LongType),
      StructField("text", StringType)))
    val stream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "*.json")   // suffix filter like the S3 trigger
      .json(dir)
      .groupBy(col("episode_id"))
      .agg(count(lit(1)).as("n_files"))
    val q = stream.writeStream
      .format("memory").queryName("file_out")
      .outputMode("complete").start()
    try {
      Files.writeString(Paths.get(s"$dir/a.json"), """{"episode_id":1,"text":"x"}""")
      Files.writeString(Paths.get(s"$dir/skip.txt"), "not json - filtered")
      q.processAllAvailable()
      assert(spark.table("file_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 1L)))
      // second arrival event → incremental pickup, no reprocessing
      Files.writeString(Paths.get(s"$dir/b.json"), """{"episode_id":1,"text":"y"}""")
      Files.writeString(Paths.get(s"$dir/c.json"), """{"episode_id":2,"text":"z"}""")
      q.processAllAvailable()
      assert(spark.table("file_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet ==
        Set((1L, 2L), (2L, 1L)))
    } finally q.stop()
  }
}
