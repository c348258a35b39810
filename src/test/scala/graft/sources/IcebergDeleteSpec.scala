package graft.sources

import java.nio.file.Files
import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Iceberg v2 merge-on-read deletes, both kinds. POSITION deletes —
  * the Delta deletion-vector analog: deleteWhere names (file, row
  * index) in a position-delete parquet file carried by a content=1
  * manifest; no data file is rewritten, time travel sees pre-delete
  * rows, deletes accumulate across snapshots, appends after a delete
  * keep both the new rows and the old deletions. EQUALITY deletes —
  * the CDC-writer form: deleteWhereEquality commits key rows blind
  * (no table read), scoped by sequence number so rows appended AFTER
  * the delete survive even when their keys match.
  */
class IcebergDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(): String =
    Files.createTempDirectory("iceberg_del_").resolve("t").toString

  test("deleteWhere removes rows without rewriting files; time travel sees them") {
    val t = tbl()
    val s1 = IcebergExport.create(
      (0L until 20L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    val before = {
      val meta = IcebergTable.metadataJson(t)
      IcebergTable.dataFilesOf(
        t, meta, IcebergTable.currentSnapshotNode(meta)).toSet
    }
    val s2 = IcebergExport.deleteWhere(spark, t, col("id") % 2 === 0)
    assert(s2.isDefined && !s2.contains(s1))
    val got = IcebergTable.read(spark, t)
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(got == (1L until 20L by 2), s"evens must be gone: $got")
    // the SAME data files serve the table — no rewrite happened
    val after = {
      val meta = IcebergTable.metadataJson(t)
      IcebergTable.dataFilesOf(
        t, meta, IcebergTable.currentSnapshotNode(meta)).toSet
    }
    assert(after == before, "position deletes must not rewrite data files")
    // pre-delete snapshot still shows everything
    assert(IcebergTable.read(spark, t, Some(s1)).count() == 20L)
    // the table upgraded to format-version 2
    assert(IcebergTable.metadataJson(t).get("format-version").asInt() == 2)
    // a no-match delete is a no-op
    assert(IcebergExport.deleteWhere(spark, t, col("id") > 999L).isEmpty)
  }

  test("deletes accumulate; appends after a delete keep both semantics") {
    val t = tbl()
    IcebergExport.create(
      (0L until 10L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    IcebergExport.deleteWhere(spark, t, col("id") < 3L)
    IcebergExport.deleteWhere(spark, t, col("id") === 9L)
    assert(IcebergTable.read(spark, t).collect().map(_.getLong(0)).toSeq.sorted ==
      (3L until 9L))
    // an append AFTER deletes: new rows visible, old deletions intact
    IcebergExport.append(
      Seq((100L, "new")).toDF("id", "s").coalesce(1), t)
    val got = IcebergTable.read(spark, t)
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(got == ((3L until 9L) :+ 100L),
      s"append must carry the delete manifest forward: $got")
    // re-deleting an already-deleted row is a no-op (it no longer
    // matches the scan of LIVE rows... it matches the RAW scan, which
    // is harmless-by-dedup; assert the visible result either way)
    IcebergExport.deleteWhere(spark, t, col("id") === 100L)
    assert(IcebergTable.read(spark, t).collect().map(_.getLong(0)).toSeq.sorted ==
      (3L until 9L))
  }

  test("partitioned tables delete with conditions on the partition source") {
    val t = tbl()
    IcebergExport.create(
      Seq((1L, "us", 1.0), (2L, "us", 2.0), (3L, "de", 3.0), (4L, "fr", 4.0))
        .toDF("id", "region", "score").coalesce(1),
      t, Seq("region"))
    IcebergExport.deleteWhere(
      spark, t, col("region") === "us" && col("id") === 2L)
    val got = IcebergTable.read(spark, t)
      .select("id", "region").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "us"), (3L, "de"), (4L, "fr")), got)
  }

  test("file skipping and expire compose with deletes") {
    val t = tbl()
    IcebergExport.create(
      (0L until 10L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    IcebergExport.append(
      (10L until 20L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    IcebergExport.deleteWhere(spark, t, col("id") === 15L)
    // bounds pruning still sound (supersets) and the pruned read
    // applies the deletes
    val got = IcebergTable.readRange(spark, t, "id", 14L, 16L)
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(got == Seq(14L, 16L), s"pruned read must honour deletes: $got")
    // expire to the delete snapshot only: reads stay correct
    IcebergExport.expireSnapshots(t, keepLast = 1)
    assert(IcebergTable.read(spark, t).count() == 19L)
  }

  test("equality deletes remove matching rows from OLDER files only") {
    val t = tbl()
    IcebergExport.create(
      (0L until 10L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    val sd = IcebergExport.deleteWhereEquality(
      spark, t, Seq(2L, 5L, 7L).toDF("id"))
    assert(sd.isDefined)
    assert(IcebergTable.read(spark, t).collect().map(_.getLong(0)).toSeq.sorted ==
      Seq(0L, 1L, 3L, 4L, 6L, 8L, 9L))
    // time travel to the pre-delete snapshot sees all rows
    val firstSnap = IcebergTable.snapshotIds(t).head
    assert(IcebergTable.read(spark, t, Some(firstSnap)).count() == 10L)
    // the SEQUENCE SCOPE: re-insert a deleted key AFTER the delete —
    // the new row must survive (its file's data sequence number is
    // above the delete's)
    IcebergExport.append(Seq((5L, "reborn")).toDF("id", "s").coalesce(1), t)
    val got = IcebergTable.read(spark, t)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got.contains((5L, "reborn")),
      s"a row appended after the equality delete must survive: $got")
    assert(got.map(_._1) == Set(0L, 1L, 3L, 4L, 5L, 6L, 8L, 9L), got)
    // a later equality delete hits BOTH eras below it
    IcebergExport.deleteWhereEquality(spark, t, Seq(5L, 0L).toDF("id"))
    assert(IcebergTable.read(spark, t).collect().map(_.getLong(0)).toSeq.sorted ==
      Seq(1L, 3L, 4L, 6L, 8L, 9L))
    // an empty key frame is a no-op
    assert(IcebergExport.deleteWhereEquality(
      spark, t, Seq.empty[Long].toDF("id")).isEmpty)
  }

  test("position and equality deletes compose in one table") {
    val t = tbl()
    IcebergExport.create(
      (0L until 12L).map(i => (i, i % 3L)).toDF("id", "grp").coalesce(1), t)
    IcebergExport.deleteWhere(spark, t, col("id") === 11L) // position
    IcebergExport.deleteWhereEquality(spark, t, Seq(1L).toDF("grp")) // equality
    val expected = (0L until 12L)
      .filterNot(_ == 11L).filterNot(_ % 3 == 1L)
    val got = IcebergTable.read(spark, t)
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(got == expected, s"mixed deletes drifted: $got vs $expected")
    // readRange still honours both
    assert(IcebergTable.readRange(spark, t, "id", 0L, 5L)
      .collect().map(_.getLong(0)).toSeq.sorted == Seq(0L, 2L, 3L, 5L))
  }

  test("multi-column equality keys null-safe-match; type mismatches refused") {
    val t = tbl()
    IcebergExport.create(
      Seq((1L, Some("a")), (2L, None: Option[String]), (3L, Some("a")),
        (2L, Some("b")))
        .toDF("k", "tag").coalesce(1), t)
    // (2, null) must match ONLY the null-tagged row (null = null in
    // equality delete matching)
    IcebergExport.deleteWhereEquality(
      spark, t, Seq((2L, None: Option[String])).toDF("k", "tag"))
    val got = IcebergTable.read(spark, t)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(got == Set((1L, Some("a")), (3L, Some("a")), (2L, Some("b"))), got)
    // wrong key type is refused, not coerced
    val ex = intercept[IllegalArgumentException] {
      IcebergExport.deleteWhereEquality(spark, t, Seq(1).toDF("k"))
    }
    assert(ex.getMessage.contains("type"), ex.getMessage)
    // unknown key column is refused
    val ex2 = intercept[IllegalArgumentException] {
      IcebergExport.deleteWhereEquality(spark, t, Seq(1L).toDF("nope"))
    }
    assert(ex2.getMessage.contains("top-level"), ex2.getMessage)
  }

  test("equality deletes work on partitioned tables, incl. partition-source keys") {
    val t = tbl()
    IcebergExport.create(
      Seq((1L, "us"), (2L, "us"), (3L, "de"), (4L, "fr"))
        .toDF("id", "region").coalesce(1),
      t, Seq("region"))
    // key on the partition source column (lives only in metadata)
    IcebergExport.deleteWhereEquality(spark, t, Seq("us").toDF("region"))
    val got = IcebergTable.read(spark, t)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((3L, "de"), (4L, "fr")), got)
    // the delete manifest declares an UNPARTITIONED spec, not spec 0
    // (its partition struct is empty; a spec-compliant reader projects
    // the declared spec's partition type)
    val meta = IcebergTable.metadataJson(t)
    val specs = meta.get("partition-specs").elements()
    var sawEmpty = false
    while (specs.hasNext) {
      val s = specs.next()
      if (s.get("spec-id").asInt() != 0) {
        assert(s.get("fields").isEmpty, "delete spec must be unpartitioned")
        sawEmpty = true
      }
    }
    assert(sawEmpty, "partitioned table deletes must add an unpartitioned spec")
    // and a data-column key still works
    IcebergExport.deleteWhereEquality(spark, t, Seq(3L).toDF("id"))
    assert(IcebergTable.read(spark, t).collect().map(_.getLong(0)).toSet ==
      Set(4L))
  }

  test("position-delete files carry the spec's reserved parquet field-ids") {
    val t = tbl()
    IcebergExport.create(
      (0L until 6L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    IcebergExport.deleteWhere(spark, t, col("id") === 2L)
    val meta = IcebergTable.metadataJson(t)
    val delPath = IcebergTable.positionDeleteFiles(
      t, meta, IcebergTable.currentSnapshotNode(meta)).head
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(delPath),
        spark.sparkContext.hadoopConfiguration))
    val ids = try {
      reader.getFooter.getFileMetaData.getSchema.getFields
        .asScala.map(f => f.getName -> Option(f.getId).map(_.intValue())).toMap
    } finally reader.close()
    assert(ids.get("file_path").flatten.contains(2147483546),
      s"file_path must carry reserved field-id 2147483546: $ids")
    assert(ids.get("pos").flatten.contains(2147483545),
      s"pos must carry reserved field-id 2147483545: $ids")
  }

  test("deleteWhere works AFTER schema evolution (per-era position scan)") {
    val t = tbl()
    IcebergExport.create(
      Seq((1L, "keep"), (2L, "drop")).toDF("id", "name").coalesce(1), t)
    IcebergExport.renameColumn(t, "name", "title")
    IcebergExport.append(
      Seq((3L, "drop"), (4L, "keep")).toDF("id", "title").coalesce(1), t)
    // the condition uses the CURRENT name and must hit BOTH eras —
    // the old file resolves 'title' to its physical 'name' by field-id
    IcebergExport.deleteWhere(spark, t, col("title") === "drop")
    val got = IcebergTable.read(spark, t)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "keep"), (4L, "keep")),
      s"evolution-era delete drifted: $got")
  }

  test("equality deletes without equality_ids are refused loudly") {
    val t = tbl()
    IcebergExport.create(Seq((1L, "a")).toDF("id", "s").coalesce(1), t)
    IcebergExport.deleteWhere(spark, t, col("id") === 99L) // no-op, stays v1
    IcebergExport.deleteWhere(spark, t, col("id") === 1L)
    // forge the delete manifest's entry content to 2 (equality)
    val meta = IcebergTable.metadataJson(t)
    val snap = IcebergTable.currentSnapshotNode(meta)
    import org.apache.avro.file.{DataFileReader, DataFileWriter}
    import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
    val ml = snap.get("manifest-list").asText()
    val r = new DataFileReader[GenericRecord](
      new java.io.File(ml), new GenericDatumReader[GenericRecord]())
    val (rows, sch) = try {
      val it = r.iterator(); val b = Vector.newBuilder[GenericRecord]
      while (it.hasNext) b += it.next()
      (b.result(), r.getSchema)
    } finally r.close()
    val delManifest = rows.find(x =>
      x.get("content").toString.toInt == 1).get.get("manifest_path").toString
    val r2 = new DataFileReader[GenericRecord](
      new java.io.File(delManifest), new GenericDatumReader[GenericRecord]())
    val (entries, esch) = try {
      val it = r2.iterator(); val b = Vector.newBuilder[GenericRecord]
      while (it.hasNext) b += it.next()
      (b.result(), r2.getSchema)
    } finally r2.close()
    Files.delete(java.nio.file.Paths.get(delManifest))
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](esch))
    w.create(esch, new java.io.File(delManifest))
    try entries.foreach { e =>
      e.get("data_file").asInstanceOf[GenericRecord].put("content", 2)
      w.append(e)
    } finally w.close()
    val ex = intercept[IllegalArgumentException] {
      IcebergTable.read(spark, t).collect()
    }
    assert(ex.getMessage.contains("equality"), ex.getMessage)
  }

  test("v2 tables stamp format-version=2 on their avro manifests") {
    // a v2 manifest whose avro meta still says format-version=1 makes
    // real readers pick the v1 projection — sequence numbers ignored,
    // delete manifests rejected
    val t = tbl()
    IcebergExport.create(
      (0L until 10L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    IcebergExport.deleteWhere(spark, t, col("id") === 3L)
    IcebergExport.append(Seq((100L, "x")).toDF("id", "s").coalesce(1), t)
    def metaOf(path: String): (String, Option[String]) = {
      val r = new org.apache.avro.file.DataFileReader[
        org.apache.avro.generic.GenericRecord](
        new java.io.File(path.replaceFirst("^file:/*", "/")),
        new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
      try (r.getMetaString("format-version"),
        Option(r.getMetaString("content")))
      finally r.close()
    }
    val meta = IcebergTable.metadataJson(t)
    assert(meta.get("format-version").asInt() == 2)
    val snap = IcebergTable.currentSnapshotNode(meta)
    val ml = snap.get("manifest-list").asText()
    assert(metaOf(ml)._1 == "2", "manifest list must stamp v2")
    // every manifest WRITTEN AT OR AFTER the upgrade stamps v2 with
    // the content key; the pre-upgrade v1 manifest legitimately
    // carries "1" (it was written by a v1 table)
    val manifests = IcebergTable.manifestPathsOf(snap).map(metaOf)
    assert(manifests.exists(m => m._1 == "2" && m._2.contains("deletes")),
      s"delete manifest must stamp v2/deletes: $manifests")
    assert(manifests.exists(m => m._1 == "2" && m._2.contains("data")),
      s"post-upgrade data manifest must stamp v2/data: $manifests")
    // the entry schema carries the v2 file_sequence_number field
    val r = new org.apache.avro.file.DataFileReader[
      org.apache.avro.generic.GenericRecord](
      new java.io.File(IcebergTable.manifestPathsOf(snap).head
        .replaceFirst("^file:/*", "/")),
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    val fields =
      try r.getSchema.getFields.asScala.map(_.name()).toSet
      finally r.close()
    assert(fields.contains("file_sequence_number"), fields)
  }
}
