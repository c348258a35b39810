package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** E6/J4/E13 write semantics per reference `lambda_2.py:205-238`,
  * `lambda_3.py:127-133`.
  */
class WarehouseWriterSpec extends SparkSpec {
  import spark.implicits._

  test("insertIgnore drops existing keys and in-batch duplicates") {
    val existing = Seq((1L, "old")).toDF("k", "v")
    val incoming = Seq((1L, "new"), (2L, "a"), (2L, "b")).toDF("k", "v")
    val out = WarehouseWriter
      .insertIgnore(existing, incoming, Seq("k"), Seq("v"))
      .orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "old"), (2L, "a"))) // k=1 keeps existing; k=2 keeps first
  }

  test("insertIgnore is idempotent (at-least-once replay safety)") {
    val existing = Seq((1L, "old")).toDF("k", "v")
    val incoming = Seq((2L, "a"), (3L, "c")).toDF("k", "v")
    val once = WarehouseWriter.insertIgnore(existing, incoming, Seq("k"), Seq("v"))
    val twice = WarehouseWriter.insertIgnore(once, incoming, Seq("k"), Seq("v"))
    assert(once.count() == twice.count())
    assert(once.except(twice).count() == 0)
  }

  test("pointUpdate patches only matched keys (E13)") {
    val episodes = Seq(
      (1L, false, 0), (2L, false, 0)).toDF("episode_id", "downloaded", "num_chunks")
    val updates = Seq((1L, true, 7)).toDF("episode_id", "downloaded", "num_chunks")
    val out = WarehouseWriter.pointUpdate(episodes, updates, "episode_id")
      .orderBy("episode_id").collect()
    assert(out(0).getAs[Boolean]("downloaded") && out(0).getAs[Int]("num_chunks") == 7)
    assert(!out(1).getAs[Boolean]("downloaded") && out(1).getAs[Int]("num_chunks") == 0)
  }

  test("appendFacts never dedups (reference entity-table hazard)") {
    val a = Seq((1L, "x")).toDF("k", "v")
    assert(WarehouseWriter.appendFacts(a, a).count() == 2)
  }

  test("createTableIfNotExists is idempotent with the declared schema (E8)") {
    import graft.schema.Schemas
    spark.sql("DROP TABLE IF EXISTS podcast_dimension_spec")
    WarehouseWriter.createTableIfNotExists(
      spark, "podcast_dimension_spec", Schemas.podcastDimension)
    WarehouseWriter.createTableIfNotExists(
      spark, "podcast_dimension_spec", Schemas.podcastDimension) // no-op
    assert(spark.catalog.tableExists("podcast_dimension_spec"))
    assert(spark.table("podcast_dimension_spec").schema.fieldNames.toSeq ==
      Schemas.podcastDimension.fieldNames.toSeq)
    spark.sql("DROP TABLE podcast_dimension_spec")
  }

  test("partitioned write lays out per-key directories and prunes reads") {
    val dir = java.nio.file.Files.createTempDirectory("colo").toString
    val df = Seq((1L, 1, "a"), (1L, 2, "b"), (2L, 1, "c"))
      .toDF("episode_id", "chunk_num", "v")
    WarehouseWriter.writePartitioned(df, dir, Seq("episode_id"))
    assert(new java.io.File(s"$dir/episode_id=1").isDirectory)
    val pruned = spark.read.parquet(dir).filter(col("episode_id") === 1L)
    assert(pruned.count() == 2)
    // partition filter reaches the scan (pruning, not a full read)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") ||
      scan.contains("episode_id=1") || pruned.inputFiles.length == 1)
  }
}
