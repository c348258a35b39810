package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Iceberg FORMAT-VERSION 3 (r14): puffin-stored DELETION VECTORS
  * replace parquet position-delete files, and ROW LINEAGE gives every
  * row a stable `_row_id` + `_last_updated_sequence_number`. The
  * table authors itself (createV3 / append / deleteWhereDv) and reads
  * back through [[IcebergTable]] — DV'd rows absent, lineage correct
  * across appends and deletes, the at-most-one-DV-per-file invariant
  * maintained by whole-set rewrite, equality deletes coexisting, and
  * the old v3 refusal narrowed to genuinely unknown versions.
  */
class IcebergV3Spec extends SparkSpec {
  import spark.implicits._

  private def tbl(): String =
    Files.createTempDirectory("iceberg_v3_").resolve("t").toString

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("puffin codec: blobs round-trip; DV blob frames per the spec") {
    val tmp = Files.createTempDirectory("puffin_").resolve("p.puffin")
    val idxs = Array(0L, 5L, 6L, 7L, 70000L)
    val blob = Puffin.dvBlobBytes(idxs)
    // spec framing: BE length of magic+vector, then the 4-byte magic
    // sequence D1 D3 39 64 (int 1681511377 little-endian)
    val len = java.nio.ByteBuffer.wrap(blob.take(4)).getInt
    assert(len == blob.length - 8, s"BE length prefix: $len")
    assert((blob(4) & 0xFF) == 0xD1 && (blob(5) & 0xFF) == 0xD3 &&
      blob(6) == 0x39 && blob(7) == 0x64,
      "magic must be D1 D3 39 64")
    assert(Puffin.dvBlobIndexes(blob).toSeq == idxs.toSeq)
    val metas = Puffin.write(tmp, Seq(
      Puffin.Blob("deletion-vector-v1", Nil, 7L, 1L,
        Map("referenced-data-file" -> "/x.parquet",
          "cardinality" -> "5"), blob),
      Puffin.Blob("deletion-vector-v1", Nil, 7L, 1L,
        Map("referenced-data-file" -> "/y.parquet",
          "cardinality" -> "1"), Puffin.dvBlobBytes(Array(3L)))))
    assert(metas.size == 2 && metas.head.offset == 4L)
    val footer = Puffin.readFooter(tmp.toString)
    assert(footer.map(_.tpe).toSet == Set("deletion-vector-v1"))
    assert(footer.head.properties("referenced-data-file") == "/x.parquet")
    val back = Puffin.readBlob(
      tmp.toString, footer.head.offset, footer.head.length)
    assert(Puffin.dvBlobIndexes(back).toSeq == idxs.toSeq)
  }

  test("puffin compression: zstd/lz4 blobs and lz4 footers round-trip") {
    // the r14 "no codec in this environment" bound was wrong — Spark's
    // own classpath ships zstd-jni and lz4-java; sketches compress,
    // DVs must not (Iceberg spec: readers seek raw offsets)
    val tmp = Files.createTempDirectory("puffin_c_").resolve("c.puffin")
    val payload = Array.tabulate(5000)(i => (i % 251).toByte)
    val metas = Puffin.write(tmp, Seq(
      Puffin.Blob("apache-datasketches-theta-v1", Seq(1), 1L, 1L,
        Map.empty, payload, compressionCodec = Some("zstd")),
      Puffin.Blob("some-sketch", Seq(2), 1L, 1L,
        Map.empty, payload, compressionCodec = Some("lz4")),
      Puffin.Blob("plain", Nil, 1L, 1L, Map.empty, payload)),
      compressFooter = true)
    assert(metas(0).length < payload.length,
      s"zstd storage must shrink: ${metas(0).length}")
    assert(metas(2).length == payload.length)
    val footer = Puffin.readFooter(tmp.toString)
    assert(footer.map(_.compressionCodec)
      == Seq(Some("zstd"), Some("lz4"), None))
    footer.foreach { m =>
      assert(Puffin.readBlobDecoded(tmp.toString, m).toSeq
        == payload.toSeq, m.tpe)
    }
    // a DV blob with a codec refuses loudly per the Iceberg spec
    val e = intercept[IllegalArgumentException] {
      Puffin.write(
        Files.createTempDirectory("puffin_dv_").resolve("d.puffin"),
        Seq(Puffin.Blob("deletion-vector-v1", Nil, 1L, 1L, Map.empty,
          Puffin.dvBlobBytes(Array(1L)),
          compressionCodec = Some("zstd"))))
    }
    assert(e.getMessage.contains("must not be compressed"), e.getMessage)
  }

  test("createV3 + append: row lineage assigned, inherited and read back") {
    val t = tbl()
    IcebergExport.createV3(
      (0L until 10L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    val meta = IcebergTable.metadataJson(t)
    assert(meta.get("format-version").asInt() == 3)
    assert(meta.get("next-row-id").asLong() == 10L)
    IcebergExport.append(
      (10L until 14L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    assert(IcebergTable.metadataJson(t).get("next-row-id").asLong() == 14L)
    // single sorted file per commit → _row_id = id; second commit's
    // seq = 2
    val got = IcebergTable.readLineage(spark, t)
      .select(col("id"), col("_row_id"),
        col("_last_updated_sequence_number"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.map(_._2).toSeq == got.map(_._1).toSeq,
      s"_row_id must equal the write position here: ${got.toSeq}")
    assert(got.filter(_._1 < 10L).forall(_._3 == 1L) &&
      got.filter(_._1 >= 10L).forall(_._3 == 2L),
      s"_last_updated_sequence_number per commit: ${got.toSeq}")
  }

  test("deleteWhereDv: rows gone, files unrewritten, lineage and time travel intact") {
    val t = tbl()
    val s1 = IcebergExport.createV3(
      (0L until 20L).map(i => (i, s"r$i")).toDF("id", "s")
        .repartitionByRange(2, col("id")).sortWithinPartitions("id"), t)
    val filesBefore = {
      val m = IcebergTable.metadataJson(t)
      IcebergTable.dataFilesOf(t, m, IcebergTable.currentSnapshotNode(m)).toSet
    }
    val s2 = IcebergExport.deleteWhereDv(spark, t, col("id") % 4 === 0)
    assert(s2.isDefined && !s2.contains(s1))
    assert(ids(IcebergTable.read(spark, t))
      == (0L until 20L).filter(_ % 4 != 0).toSet)
    // merge-on-read: same data files serve the table
    val filesAfter = {
      val m = IcebergTable.metadataJson(t)
      IcebergTable.dataFilesOf(t, m, IcebergTable.currentSnapshotNode(m)).toSet
    }
    assert(filesAfter == filesBefore, "DV delete must not rewrite data")
    // time travel sees the pre-delete rows
    assert(ids(IcebergTable.read(spark, t, Some(s1))) == (0L until 20L).toSet)
    // survivors keep their ORIGINAL row ids (lineage survives deletes)
    val lin = IcebergTable.readLineage(spark, t)
      .select(col("id"), col("_row_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(lin.size == 15 && lin.forall { case (id, rid) => rid == id },
      s"surviving rows must keep their ids: $lin")
    // a matching-nothing delete is a no-op
    assert(IcebergExport.deleteWhereDv(spark, t, col("id") > 999L).isEmpty)
  }

  test("repeated DV deletes MERGE; at most one DV per file per snapshot") {
    val t = tbl()
    IcebergExport.createV3(
      (0L until 30L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    IcebergExport.deleteWhereDv(spark, t, col("id") < 5L)
    IcebergExport.deleteWhereDv(spark, t, col("id") >= 25L)
    assert(ids(IcebergTable.read(spark, t)) == (5L until 25L).toSet)
    // the CURRENT snapshot references exactly one DV per data file
    val meta = IcebergTable.metadataJson(t)
    val dvs = IcebergTable.deleteFilesOf(
      t, meta, IcebergTable.currentSnapshotNode(meta))
      .filter(_.format == "PUFFIN")
    assert(dvs.map(_.referencedDataFile.get).distinct.size == dvs.size,
      s"one DV per referenced file: $dvs")
    assert(dvs.size == 1, s"single data file → single merged DV: $dvs")
    // and its cardinality is the merged set
    val blob = Puffin.readBlob(
      dvs.head.path, dvs.head.contentOffset.get, dvs.head.contentSize.get)
    assert(Puffin.dvBlobIndexes(blob).length == 10)
  }

  test("equality deletes coexist with DVs on v3; scoping intact") {
    val t = tbl()
    IcebergExport.createV3(
      (0L until 12L).map(i => (i, s"tag${i % 3}")).toDF("id", "tag")
        .coalesce(1), t)
    IcebergExport.deleteWhereEquality(spark, t, Seq("tag0").toDF("tag"))
    // still v3 after the equality commit (no downgrade)
    assert(IcebergTable.metadataJson(t).get("format-version").asInt() == 3)
    IcebergExport.deleteWhereDv(spark, t, col("id") === 7L)
    assert(ids(IcebergTable.read(spark, t))
      == (0L until 12L).filter(i => i % 3 != 0 && i != 7L).toSet)
    // rows appended AFTER the equality delete survive despite key match
    IcebergExport.append(Seq((100L, "tag0")).toDF("id", "tag").coalesce(1), t)
    assert(ids(IcebergTable.read(spark, t)).contains(100L),
      "the equality delete must stay sequence-scoped")
  }

  test("lineage-preserving compaction: rewritten rows keep their ids") {
    val t = tbl()
    // three SMALL files (row ids 0-2 / 3-5 / 6-8) + one file above the
    // compaction target (ids 9-58) that must survive untouched
    IcebergExport.createV3(
      (0L until 3L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    IcebergExport.append(
      (3L until 6L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    IcebergExport.append(
      (6L until 9L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    val rnd = new scala.util.Random(42)
    IcebergExport.append(
      (9L until 59L).map(i => (i, rnd.alphanumeric.take(400).mkString))
        .toDF("id", "s").coalesce(1), t)
    // two DV generations before the rewrite: the dead positions must
    // stay dead THROUGH the rewrite, never resurrected
    IcebergExport.deleteWhereDv(spark, t, col("id") === 1L)
    IcebergExport.deleteWhereDv(spark, t, col("id") === 7L)
    val preSnap = IcebergTable.metadataJson(t)
      .get("current-snapshot-id").asLong()
    val preRows = IcebergTable.read(spark, t).collect().toSet
    val preLineage = IcebergTable.readLineage(spark, t)
      .select("id", "_row_id", "_last_updated_sequence_number").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val preNextRowId =
      IcebergTable.metadataJson(t).get("next-row-id").asLong()
    assert(preNextRowId == 59L)

    val (before, after) = IcebergExport.rewriteDataFiles(spark, t, 4096L)
    assert(before == 4 && after == 2, s"3 victims -> 1 + survivor: $after")
    val probes0 = IcebergTable.lineageProbes.get()

    // rows identical, lineage identical (ids AND last-updated seqs),
    // watermark untouched
    assert(IcebergTable.read(spark, t).collect().toSet == preRows)
    val postLineage = IcebergTable.readLineage(spark, t)
      .select("id", "_row_id", "_last_updated_sequence_number").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(postLineage == preLineage,
      s"lineage must survive the rewrite:\n$postLineage\nvs\n$preLineage")
    val meta = IcebergTable.metadataJson(t)
    assert(meta.get("next-row-id").asLong() == preNextRowId,
      "compaction assigns no new row ids")
    // the rewritten file carries MATERIALIZED lineage (null
    // first_row_id in its manifest entry + physical _row_id column);
    // the survivor keeps its inherited first_row_id
    val entries = IcebergTable.dataFilesWithPartitions(
      t, meta, IcebergTable.currentSnapshotNode(meta))
    val (mat, inherited) = entries.partition(_.firstRowId.isEmpty)
    assert(mat.size == 1 && inherited.size == 1, s"$entries")
    assert(inherited.head.firstRowId.contains(9L),
      "survivor keeps first_row_id = 9")
    val footer = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(mat.head.path),
        spark.sparkContext.hadoopConfiguration))
    val footerNames =
      try footer.getFooter.getFileMetaData.getSchema
        .getFields.asScala.map(_.getName).toSet
      finally footer.close()
    assert(footerNames.contains("_row_id") &&
      footerNames.contains("_last_updated_sequence_number"),
      s"materialized lineage columns in the rewritten file: $footerNames")
    // time travel to the pre-compaction snapshot still works
    assert(IcebergTable.read(spark, t, Some(preSnap)).collect().toSet
      == preRows)
    // post-compaction commits: appends take fresh ids from the
    // watermark; a DV delete on a REWRITTEN row lands on the new path
    IcebergExport.append(Seq((100L, "new")).toDF("id", "s").coalesce(1), t)
    val lin2 = IcebergTable.readLineage(spark, t)
      .select("id", "_row_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(lin2(100L) == 59L, s"fresh id from the watermark: $lin2")
    IcebergExport.deleteWhereDv(spark, t, col("id") === 3L)
    assert(ids(IcebergTable.read(spark, t))
      == ((0L until 59L).toSet -- Set(1L, 3L, 7L)) + 100L)
    val lin3 = IcebergTable.readLineage(spark, t)
      .select("id", "_row_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(lin3(4L) == 4L && lin3(8L) == 8L && !lin3.contains(3L),
      s"lineage intact after the post-rewrite delete: $lin3")
    // every lineage read above resolved materialized-vs-inherited from
    // the manifest's write-time marker — ZERO footer probes (r15; the
    // probe remains only for FOREIGN manifests without the meta key)
    assert(IcebergTable.lineageProbes.get() == probes0,
      "self-written manifests must answer lineage placement without " +
        "footer reads")
  }

  test("v3 column defaults: initial-default fills pre-existing rows") {
    val t = tbl()
    IcebergExport.createV3(
      (0L until 4L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    IcebergExport.addColumn(
      t, "score", org.apache.spark.sql.types.LongType, 42L)
    // rows written BEFORE the column existed read the default, never
    // null — the spec's initial-default rule
    val got = IcebergTable.read(spark, t)
      .select(col("id"), col("score")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == (0L until 4L).map(_ -> 42L).toMap, s"$got")
    // new appends present explicit values; old rows keep the default
    IcebergExport.append(
      Seq((10L, "x", 7L)).toDF("id", "s", "score").coalesce(1), t)
    val got2 = IcebergTable.read(spark, t)
      .select(col("id"), col("score")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got2 == ((0L until 4L).map(_ -> 42L) :+ (10L -> 7L)).toMap)
    // DV deletes and lineage compose with the defaulted column
    IcebergExport.deleteWhereDv(spark, t, col("id") === 1L)
    val lin = IcebergTable.readLineage(spark, t)
      .select(col("id"), col("score"), col("_row_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(lin == Set((0L, 42L, 0L), (2L, 42L, 2L), (3L, 42L, 3L),
      (10L, 7L, 4L)), s"$lin")
    // defaults are a v3 feature: v1/v2 tables refuse
    val t2 = tbl()
    IcebergExport.create(Seq((1L, "a")).toDF("id", "s").coalesce(1), t2)
    val e = intercept[IllegalArgumentException] {
      IcebergExport.addColumn(
        t2, "score", org.apache.spark.sql.types.LongType, 1L)
    }
    assert(e.getMessage.contains("format-version 3"), e.getMessage)
  }

  test("v3 guards: wrong-path deletes and wrong-version DV writes refuse") {
    val t = tbl()
    IcebergExport.createV3(
      (0L until 8L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    val e1 = intercept[IllegalArgumentException] {
      IcebergExport.deleteWhere(spark, t, col("id") === 1L)
    }
    assert(e1.getMessage.contains("deleteWhereDv"), e1.getMessage)
    // deleteWhereDv on a v2 table refuses
    val t2 = tbl()
    IcebergExport.create(Seq((1L, "a")).toDF("id", "s").coalesce(1), t2)
    val e3 = intercept[IllegalArgumentException] {
      IcebergExport.deleteWhereDv(spark, t2, col("id") === 1L)
    }
    assert(e3.getMessage.contains("format-version 3"), e3.getMessage)
  }

  test("snapshot refs, evolution and expire carry v3 state (next-row-id survives)") {
    val t = tbl()
    IcebergExport.createV3(
      (0L until 6L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    IcebergExport.renameColumn(t, "s", "name")
    assert(IcebergTable.metadataJson(t).get("next-row-id").asLong() == 6L,
      "schema evolution must carry next-row-id")
    IcebergExport.deleteWhereDv(spark, t, col("id") === 0L)
    IcebergExport.append(
      Seq((6L, "x")).toDF("id", "name").coalesce(1), t)
    assert(IcebergTable.metadataJson(t).get("next-row-id").asLong() == 7L)
    val lin = IcebergTable.readLineage(spark, t)
      .select(col("id"), col("_row_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(lin == (1L to 6L).map(i => i -> i).toMap, s"$lin")
    // expire reclaims superseded puffin files of expired snapshots
    IcebergExport.deleteWhereDv(spark, t, col("id") === 1L)
    val puffinsBefore = {
      val s = Files.list(Paths.get(t, "data"))
      try s.iterator().asScala.map(_.getFileName.toString)
        .count(_.endsWith(".puffin"))
      finally s.close()
    }
    assert(puffinsBefore == 2, s"two DV generations on disk: $puffinsBefore")
    IcebergExport.expireSnapshots(t, keepLast = 1)
    val puffinsAfter = {
      val s = Files.list(Paths.get(t, "data"))
      try s.iterator().asScala.map(_.getFileName.toString)
        .count(_.endsWith(".puffin"))
      finally s.close()
    }
    assert(puffinsAfter == 1, "expire must reclaim the superseded DV file")
    assert(ids(IcebergTable.read(spark, t)) == (2L to 6L).toSet)
  }
}
