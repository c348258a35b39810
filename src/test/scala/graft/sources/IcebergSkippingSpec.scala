package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Manifest-level file skipping + snapshot expiry for the Iceberg
  * tier — the DeltaSkippingSpec twin: per-file `lower_bounds`/
  * `upper_bounds` (spec single-value serialization) written from
  * parquet footers, identity-partition VALUES pruning directly, range
  * reads row-identical to the unpruned filtered read, and
  * expireSnapshots reclaiming exactly the expired-only files.
  */
class IcebergSkippingSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("iceberg_skip_").resolve("t").toString

  /** Three one-file snapshots with DISJOINT id ranges. */
  private def threeFiles(): String = {
    val t = tmpTable()
    IcebergExport.create(
      (0L until 10L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    IcebergExport.append(
      (10L until 20L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    IcebergExport.append(
      (20L until 30L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    t
  }

  test("manifest bounds prune disjoint ranges; readRange equals the filtered read") {
    val t = threeFiles()
    val (kept, total) = IcebergTable.prunedDataFiles(t, "id", 12L, 18L)
    assert(total == 3 && kept.size == 1,
      s"[12,18] lives in exactly the middle file: $kept of $total")
    assert(IcebergTable.prunedDataFiles(t, "id", 100L, 200L)._1.isEmpty)
    val pruned = IcebergTable.readRange(spark, t, "id", 7L, 23L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val full = IcebergTable.read(spark, t)
      .filter(col("id").between(7L, 23L))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(pruned == full && full.size == 17)
  }

  test("string bounds prune too; an all-null column drops its file") {
    val t = tmpTable()
    IcebergExport.create(
      Seq((1L, Some("apple")), (2L, Some("banana")))
        .toDF("id", "w").coalesce(1), t)
    IcebergExport.append(
      Seq((3L, None: Option[String]), (4L, None)).toDF("id", "w").coalesce(1), t)
    IcebergExport.append(
      Seq((5L, Some("plum")), (6L, Some("zebra"))).toDF("id", "w").coalesce(1), t)
    val (kept, total) = IcebergTable.prunedDataFiles(t, "w", "aaa", "cherry")
    assert(total == 3 && kept.size == 1,
      s"only the apple/banana file can match [aaa,cherry] (all-null drops): $kept")
    val got = IcebergTable.readRange(spark, t, "w", "aaa", "cherry")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
  }

  test("identity-partition VALUES prune without any data-file bounds") {
    val t = tmpTable()
    IcebergExport.create(
      Seq((1L, "us", 1.0), (2L, "us", 2.0), (3L, "de", 3.0), (4L, "fr", 4.0))
        .toDF("id", "region", "score").coalesce(1),
      t, Seq("region"))
    // partition source columns are NOT in the data files — the pruning
    // must come from the manifests' typed partition structs
    val (kept, total) = IcebergTable.prunedDataFiles(t, "region", "de", "fr")
    assert(total == 3 && kept.size == 2,
      s"de+fr partitions of 3: $kept")
    val got = IcebergTable.readRange(spark, t, "region", "de", "fr")
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(3L, 4L))
    // ...and bounds on a DATA column still work on the same table
    val (keptId, _) = IcebergTable.prunedDataFiles(t, "id", 4L, 4L)
    assert(keptId.size == 1)
  }

  test("UniForm-converted tables carry bounds from the Delta files") {
    val t = tmpTable()
    DeltaExport.create(
      (0L until 10L).map(i => (i, i * 2.0)).toDF("id", "v").coalesce(1), t)
    DeltaExport.append(
      (10L until 20L).map(i => (i, i * 2.0)).toDF("id", "v").coalesce(1), t)
    IcebergExport.fromDelta(spark, t)
    val (kept, total) = IcebergTable.prunedDataFiles(t, "id", 12L, 13L)
    assert(total == 2 && kept.size == 1,
      s"the conversion must bound the SAME delta files: $kept of $total")
    assert(IcebergTable.readRange(spark, t, "v", 4.0, 6.0)
      .collect().map(_.getLong(0)).toSet == Set(2L, 3L))
  }

  test("expireSnapshots drops old snapshots, reclaims their manifest lists, keeps reads") {
    val t = threeFiles()
    val idsBefore = IcebergTable.snapshotIds(t)
    assert(idsBefore.size == 3)
    val metaBefore = IcebergTable.metadataJson(t)
    val expiredList = metaBefore.get("snapshots").elements()
      .next().get("manifest-list").asText() // the OLDEST snapshot's
    val deleted = IcebergExport.expireSnapshots(t, keepLast = 2)
    assert(deleted.nonEmpty && deleted.exists(_ == expiredList),
      s"the expired snapshot's manifest list must be reclaimed: $deleted")
    assert(IcebergTable.snapshotIds(t) == idsBefore.takeRight(2))
    // current read intact (the expired snapshot's DATA files are still
    // referenced by the kept cumulative snapshots — never deleted)
    assert(IcebergTable.read(spark, t).count() == 30L)
    assert(IcebergTable.read(spark, t, Some(idsBefore(1))).count() == 20L)
    // time travel to the expired snapshot now fails loudly
    val e = intercept[IllegalArgumentException] {
      IcebergTable.read(spark, t, Some(idsBefore.head))
    }
    assert(e.getMessage.contains("expired or never existed"), e.getMessage)
    // idempotent: nothing further to expire
    assert(IcebergExport.expireSnapshots(t, keepLast = 2).isEmpty)
  }

  test("expire on a UniForm table never touches the Delta-owned data files") {
    val t = tmpTable()
    DeltaExport.create(Seq((1L, "a")).toDF("id", "s").coalesce(1), t)
    IcebergExport.fromDelta(spark, t)
    DeltaExport.append(Seq((2L, "b")).toDF("id", "s").coalesce(1), t)
    IcebergExport.fromDelta(spark, t)
    // re-syncs reference overlapping Delta files; expiring the first
    // sync must reclaim only ICEBERG metadata, never a data file the
    // Delta log still owns
    val deltaActive = DeltaLog.activeFiles(spark, t)
      .collect().map(_.getString(0)).toSet
    val deleted = IcebergExport.expireSnapshots(t, keepLast = 1)
    assert(deleted.forall(p => !deltaActive.contains(p)),
      s"expire deleted a Delta-active file: $deleted")
    assert(DeltaLog.read(spark, t).count() == 2L)
    assert(IcebergTable.read(spark, t).count() == 2L)
  }
}
