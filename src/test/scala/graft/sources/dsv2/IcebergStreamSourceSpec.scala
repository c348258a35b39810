package graft.sources.dsv2

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.IcebergExport
import org.apache.spark.sql.functions._

/** The Iceberg STREAMING SOURCE
  * (`spark.readStream.format("graft-iceberg")`) — the Delta source's
  * format twin: initial snapshot + per-snapshot appended files,
  * sequence-number offsets (exact checkpoint resume), append-only
  * contract with `skipChangeCommits`. The initial snapshot carries
  * the table's MoR delete state (position/equality deletes applied),
  * exactly like the batch read.
  */
class IcebergStreamSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def df(ids: Range) =
    ids.map(i => (i.toLong, s"v$i")).toDF("id", "s")

  test("snapshot + appended tail; checkpoint restart resumes exactly") {
    val t = tmp("ice_stream")
    val ckpt = tmp("ice_stream_ckpt")
    IcebergExport.create(df(0 until 10).coalesce(1), t)
    IcebergExport.append(df(10 until 20).coalesce(1), t)

    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def sink(batch: org.apache.spark.sql.DataFrame, id: Long): Unit =
      batch.collect().foreach(r => seen.add(r.getLong(0)))
    import scala.jdk.CollectionConverters._

    val q1 = spark.readStream.format("graft-iceberg").load(t)
      .writeStream.foreachBatch(sink _)
      .option("checkpointLocation", ckpt).start()
    try {
      q1.processAllAvailable()
      assert(seen.asScala.toSet == (0L until 20L).toSet)
      IcebergExport.append(df(20 until 25).coalesce(1), t)
      q1.processAllAvailable()
      assert(seen.asScala.toSet == (0L until 25L).toSet)
      assert(seen.size == 25, s"no duplicates expected, got ${seen.size}")
    } finally q1.stop()

    IcebergExport.append(df(25 until 30).coalesce(1), t)
    seen.clear()
    val q2 = spark.readStream.format("graft-iceberg").load(t)
      .writeStream.foreachBatch(sink _)
      .option("checkpointLocation", ckpt).start()
    try {
      q2.processAllAvailable()
      val got = seen.asScala.toSeq
      assert(got.toSet == (25L until 30L).toSet && got.size == 5,
        s"restart must resume at the checkpointed sequence, got $got")
    } finally q2.stop()
  }

  test("initial snapshot applies MoR deletes; non-append snapshots fail") {
    val t = tmp("ice_stream_mor")
    val ckpt = tmp("ice_stream_mor_ckpt")
    IcebergExport.create(df(0 until 10).coalesce(1), t)
    IcebergExport.deleteWhere(spark, t, col("id") % 3 === 0)

    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def sink(batch: org.apache.spark.sql.DataFrame, id: Long): Unit =
      batch.collect().foreach(r => seen.add(r.getLong(0)))
    import scala.jdk.CollectionConverters._

    val q = spark.readStream.format("graft-iceberg").load(t)
      .writeStream.foreachBatch(sink _)
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(seen.asScala.toSet ==
        (0L until 10L).filterNot(_ % 3 == 0).toSet,
        s"initial snapshot must apply the position deletes: " +
          s"${seen.asScala.toSeq.sorted}")
      // a delete AFTER the stream started is a change commit: fail
      IcebergExport.deleteWhere(spark, t, col("id") === 1L)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("not an append") ||
        Option(e.getCause).exists(_.getMessage.contains("not an append")),
        e.getMessage)
    } finally q.stop()

    // skipChangeCommits drops the delete snapshot; later appends flow
    val ckpt2 = tmp("ice_stream_mor_ckpt2")
    IcebergExport.append(df(10 until 12).coalesce(1), t)
    seen.clear()
    val q2 = spark.readStream.format("graft-iceberg")
      .option("skipChangeCommits", "true").load(t)
      .writeStream.foreachBatch(sink _)
      .option("checkpointLocation", ckpt2).start()
    try {
      q2.processAllAvailable()
      // fresh stream: snapshot reflects BOTH deletes, plus the append
      assert(seen.asScala.toSet ==
        ((0L until 10L).filterNot(i => i % 3 == 0 || i == 1L)
          ++ (10L until 12L)).toSet,
        seen.asScala.toSeq.sorted.toString)
    } finally q2.stop()
  }
}
