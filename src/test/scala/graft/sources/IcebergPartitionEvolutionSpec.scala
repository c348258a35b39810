package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Iceberg PARTITION EVOLUTION (r14): updateSpec changes the default
  * spec without rewriting a byte; each file era keeps its own spec,
  * the reader reconstructs identity columns PER ERA (from partition
  * metadata where the era identity-partitioned, from the data files
  * everywhere else), pruning keeps what it cannot prove, and deletes
  * cut across eras.
  */
class IcebergPartitionEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(): String =
    Files.createTempDirectory("iceberg_pe_").resolve("t").toString

  private def rows(t: String): Set[(Long, String, String, String)] =
    IcebergTable.read(spark, t)
      .select(col("id"), col("p"), col("q"), col("s"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet

  test("identity → identity evolution: each era reconstructs its own columns") {
    val t = tbl()
    val era1 = (0L until 6L).map(i =>
      (i, s"p${i % 2}", s"q${i % 3}", s"r$i"))
    IcebergExport.create(era1.toDF("id", "p", "q", "s"), t,
      partitionBy = Seq("p"))
    val newId = IcebergExport.updateSpec(t, Seq(("identity", "q")))
    assert(newId == 1)
    val era2 = (10L until 16L).map(i =>
      (i, s"p${i % 2}", s"q${i % 3}", s"r$i"))
    IcebergExport.append(era2.toDF("id", "p", "q", "s"), t)
    // era-1 files: p from metadata, q from the file;
    // era-2 files: q from metadata, p from the file
    assert(rows(t) == (era1 ++ era2).toSet,
      "every column must reconstruct correctly in BOTH eras")
    // new-era files land under the NEW hive layout
    val meta = IcebergTable.metadataJson(t)
    val paths = IcebergTable.dataFilesOf(
      t, meta, IcebergTable.currentSnapshotNode(meta))
    assert(paths.exists(_.contains("/p=")), "era-1 layout present")
    assert(paths.exists(_.contains("/q=")), "era-2 layout present")
    // both specs live in the metadata; the new one is the default
    assert(meta.get("default-spec-id").asInt() == 1)
    assert(meta.get("partition-specs").size() == 2)
  }

  test("evolution to UNPARTITIONED keeps old identity columns readable") {
    val t = tbl()
    IcebergExport.create(
      (0L until 4L).map(i => (i, s"p${i % 2}", "x", s"r$i"))
        .toDF("id", "p", "q", "s"), t, partitionBy = Seq("p"))
    IcebergExport.updateSpec(t, Nil)
    IcebergExport.append(
      Seq((10L, "pX", "x", "new")).toDF("id", "p", "q", "s"), t)
    val got = rows(t)
    assert(got.count(_._2 == "p0") == 2 && got.count(_._2 == "p1") == 2,
      "old-era identity values must come from partition metadata")
    assert(got.contains((10L, "pX", "x", "new")),
      "new-era values come from the data file itself")
  }

  test("deletes cut across partition eras; pruning keeps unprovable files") {
    val t = tbl()
    IcebergExport.create(
      (0L until 6L).map(i => (i, s"p${i % 2}", s"q$i", s"r$i"))
        .toDF("id", "p", "q", "s"), t, partitionBy = Seq("p"))
    IcebergExport.updateSpec(t, Seq(("identity", "q")))
    IcebergExport.append(
      (10L until 14L).map(i => (i, s"p${i % 2}", s"q${i % 2}", s"r$i"))
        .toDF("id", "p", "q", "s"), t)
    // equality delete across both eras
    IcebergExport.deleteWhereEquality(spark, t,
      Seq(1L, 11L).toDF("id"))
    // position delete hitting an OLD-era file
    IcebergExport.deleteWhere(spark, t, col("id") === 2L)
    assert(rows(t).map(_._1) == Set(0L, 3L, 4L, 5L, 10L, 12L, 13L))
    // pruning on p: era-2 files carry no p metadata — kept, never
    // wrongly dropped (the pre-evolution reader attached NULLS here)
    val (kept, total) = IcebergTable.prunedDataFiles(t, "p", "p0", "p0")
    assert(kept.size < total, "era-1 p=p1 files must prune")
    val keptRows = IcebergTable.readKeep(spark, t, kept.toSet)
      .filter(col("p") === "p0").select(col("id"))
      .collect().map(_.getLong(0)).toSet
    assert(keptRows == Set(0L, 4L, 10L, 12L),
      s"pruned read lost or invented p0 rows: $keptRows")
  }

  test("compaction refuses cross-era relayouts; same-era tables still compact") {
    val t = tbl()
    IcebergExport.create(
      (0L until 4L).map(i => (i, s"p${i % 2}", "x", s"r$i"))
        .toDF("id", "p", "q", "s"), t, partitionBy = Seq("p"))
    IcebergExport.updateSpec(t, Nil)
    IcebergExport.append(
      Seq((10L, "pX", "x", "n")).toDF("id", "p", "q", "s"), t)
    val e = intercept[IllegalArgumentException] {
      IcebergExport.rewriteDataFiles(spark, t, 64L * 1024 * 1024)
    }
    assert(e.getMessage.contains("relayout"))
  }

  test("a changelog spans the evolution boundary") {
    val t = tbl()
    IcebergExport.create(
      (0L until 4L).map(i => (i, s"p${i % 2}", "x", s"r$i"))
        .toDF("id", "p", "q", "s"), t, partitionBy = Seq("p"))
    IcebergExport.updateSpec(t, Seq(("identity", "q")))
    IcebergExport.append(
      Seq((10L, "pA", "qA", "n")).toDF("id", "p", "q", "s"), t)
    val got = IcebergChangelog.changelog(spark, t)
      .select(col("id"), col("p"), col("q"), col("_change_type"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet
    assert(got == ((0L until 4L).map(i =>
      (i, s"p${i % 2}", "x", "insert")).toSet +
      ((10L, "pA", "qA", "insert"))),
      s"changelog drifted across the spec boundary: $got")
  }
}
