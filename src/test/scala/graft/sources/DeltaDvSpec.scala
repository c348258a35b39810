package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deletion vectors end to end: the portable roaring codec
  * round-trips every container type, deleteWhere marks rows without
  * rewriting data files, reads honour the vectors (time travel shows
  * the pre-delete rows), repeated deletes merge, and checkpoints
  * carry both the vector and the feature-gated protocol.
  */
class DeltaDvSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(): String =
    Files.createTempDirectory("delta_dv_").resolve("t").toString

  test("roaring round-trip: sparse, dense (bitmap) and multi-bucket index sets") {
    for (seed <- Seq(3L, 71L)) {
      val rnd = new Random(seed)
      val sparse = Array.fill(200)(rnd.nextLong(1L << 40)).distinct.sorted
      // >4096 values inside one 16-bit container → bitmap container
      val dense = (0L until 60000L by 3L).toArray
      val multi = (sparse ++ dense ++
        Array(0L, (1L << 32) - 1, 1L << 32, (1L << 33) + 7)).distinct.sorted
      for (set <- Seq(sparse, dense, multi)) {
        val got = DeltaDv.deserialize(DeltaDv.serialize(set))
        assert(got.toSeq == set.toSeq, s"seed $seed: roaring drifted")
      }
    }
  }

  test("exactly-4096-value containers round-trip as ARRAY (spec boundary)") {
    // cardinality 4096 is stored as an array container per the
    // RoaringFormatSpec — a writer that picks bitmap here produces
    // bytes real readers misdecode. Pin the boundary and both sides.
    for (card <- Seq(4095, 4096, 4097)) {
      // every-other value defeats run encoding so the array/bitmap
      // boundary itself is exercised
      val set = (0 until card).map(i => 2L * i).toArray
      val got = DeltaDv.deserialize(DeltaDv.serialize(set))
      assert(got.toSeq == set.toSeq, s"card=$card container drifted")
    }
    // and spanning multiple buckets at the boundary
    val multi = ((0 until 4096).map(i => 2L * i) ++
      (0 until 4096).map(i => (1L << 32) + 2L * i)).toArray
    assert(DeltaDv.deserialize(DeltaDv.serialize(multi)).toSeq == multi.toSeq)
  }

  test("contiguous deletes serialize as RUN containers, tiny and lossless") {
    // 1M contiguous row indexes: 16 full 16-bit containers, each one
    // run → ~6 bytes body each. Well under 100 bytes per container,
    // vs 8 KiB bitmap blocks before run emission.
    val set = (0L until 1048576L).toArray
    val bytes = DeltaDv.serialize(set)
    assert(bytes.length < 400,
      s"1M-row contiguous delete must run-encode (got ${bytes.length}B)")
    assert(DeltaDv.deserialize(bytes).toSeq == set.toSeq)
    // mixed: runs + a sparse tail in the same bitmap
    val mixed = ((100L to 9000L) ++ Seq(70000L, 80001L, 90002L)).toArray
    assert(DeltaDv.deserialize(DeltaDv.serialize(mixed)).toSeq == mixed.toSeq)
    // few-container run case (< 4 containers → no offsets section)
    val small = (5L to 9L).toArray ++ Array(100L)
    assert(DeltaDv.deserialize(DeltaDv.serialize(small)).toSeq == small.toSeq)
  }

  test("run-container bitmaps (cookie 12347) decode too") {
    // author a run-encoded 32-bit bitmap by hand: one container,
    // runs [5,9] and [100,100]
    import java.nio.{ByteBuffer, ByteOrder}
    val buf = ByteBuffer.allocate(64)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putLong(1L) // one 32-bit bucket
    buf.putInt(0) // high key 0
    buf.putInt(12347 | (0 << 16)) // SERIAL_COOKIE, containers = 0+1
    buf.put(1.toByte) // run flag bitset: container 0 is runs
    buf.putShort(0) // key
    buf.putShort(5) // cardinality-1 (6 values)
    buf.putShort(2) // nRuns
    buf.putShort(5); buf.putShort(4) // [5..9]
    buf.putShort(100); buf.putShort(0) // [100]
    val got = DeltaDv.deserialize(
      java.util.Arrays.copyOf(buf.array(), buf.position()))
    assert(got.toSeq == Seq(5L, 6L, 7L, 8L, 9L, 100L), got.toSeq)
  }

  test("deleteWhere removes rows without rewriting files; time travel sees them") {
    val t = tbl()
    DeltaExport.create(
      (0L until 20L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    val preFiles = DeltaLog.activeFiles(spark, t)
      .collect().map(_.getString(0)).toSet
    val v0 = DeltaLog.version(spark, t)
    val v1 = DeltaExport.deleteWhere(spark, t, col("id") % 2 === 0)
    assert(v1.contains(v0 + 1))
    val got = DeltaLog.read(spark, t).collect().map(_.getLong(0)).toSorted
    assert(got == (1L until 20L by 2).toSeq, s"evens must be gone: $got")
    // the SAME physical file serves the table — no rewrite happened
    val postFiles = DeltaLog.activeFiles(spark, t)
      .collect().map(_.getString(0)).toSet
    assert(postFiles == preFiles, "deleteWhere must not rewrite data files")
    // time travel to the pre-delete version still sees all rows
    assert(DeltaLog.read(spark, t, Some(v0)).count() == 20L)
    // a delete that matches nothing is a no-op
    assert(DeltaExport.deleteWhere(spark, t, col("id") > 999L).isEmpty)
  }

  test("repeated deletes MERGE vectors; file skipping still works") {
    val t = tbl()
    DeltaExport.create(
      (0L until 30L).map(i => (i, i * 10L)).toDF("id", "v").coalesce(1), t)
    DeltaExport.deleteWhere(spark, t, col("id") < 5L)
    DeltaExport.deleteWhere(spark, t, col("id") >= 25L)
    val got = DeltaLog.read(spark, t).collect().map(_.getLong(0)).toSorted
    assert(got == (5L until 25L).toSeq, s"merged deletes drifted: $got")
    // stats stay attached to the re-added file → pruning still sound
    val (kept, total) = DeltaLog.prunedFiles(spark, t, "id", 10L, 12L)
    assert(total == 1 && kept.size == 1)
    assert(DeltaLog.readRange(spark, t, "id", 0L, 6L)
      .collect().map(_.getLong(0)).toSorted == Seq(5L, 6L))
  }

  test("deletes work across multiple files and on partitioned tables") {
    val t = tbl()
    DeltaExport.create(
      Seq((1L, "us"), (2L, "us"), (3L, "de"), (4L, "de"))
        .toDF("id", "region").coalesce(1),
      t, Seq("region"))
    DeltaExport.deleteWhere(
      spark, t, col("region") === "de" && col("id") === 3L)
    val got = DeltaLog.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "us"), (2L, "us"), (4L, "de")), got)
  }

  test("checkpoint carries vectors AND the feature-gated protocol") {
    val t = tbl()
    DeltaExport.create(
      (0L until 10L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    DeltaExport.deleteWhere(spark, t, col("id") === 7L)
    DeltaExport.checkpoint(spark, t)
    // the checkpoint is now the only state source
    val dir = java.nio.file.Paths.get(t, "_delta_log")
    (0L to 1L).foreach(v => Files.delete(dir.resolve(f"$v%020d.json")))
    val got = DeltaLog.read(spark, t).collect().map(_.getLong(0)).toSorted
    assert(got == (0L until 10L).filterNot(_ == 7L),
      "a checkpoint that drops the DV silently UNDELETES rows")
  }

  test("z85 round-trips; deleteWhere emits the u-storage form delta-spark defaults to") {
    for (seed <- Seq(9L, 44L)) {
      val rnd = new Random(seed)
      val bytes = Array.fill(4 * (1 + rnd.nextInt(8)))(rnd.nextInt().toByte)
      assert(DeltaDv.z85Decode(DeltaDv.z85Encode(bytes)).toSeq == bytes.toSeq)
    }
    val t = tbl()
    DeltaExport.create(
      (0L until 10L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    DeltaExport.deleteWhere(spark, t, col("id") === 4L)
    val commit = Files.readString(java.nio.file.Paths.get(
      t, "_delta_log", f"${1L}%020d.json"))
    assert(commit.contains("\"storageType\":\"u\""),
      "deleteWhere must write table-relative u-storage vectors")
    // PROTOCOL.md: the table-features upgrade must enumerate the
    // features the prior legacy minWriterVersion=2 implied
    assert(commit.contains(
      """"writerFeatures":["appendOnly","deletionVectors","invariants"]"""),
      s"feature upgrade must carry legacy-implied writer features: $commit")
    assert(DeltaLog.read(spark, t).collect().map(_.getLong(0)).toSorted ==
      (0L until 10L).filterNot(_ == 4L))
  }

  test("inline (i-storage) vectors decode from the descriptor itself") {
    val t = tbl()
    DeltaExport.create(
      (0L until 6L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    // hand-author an inline DV deleting rows 1 and 3 of the only file
    import java.nio.{ByteBuffer, ByteOrder}
    val bitmap = DeltaDv.serialize(Array(1L, 3L))
    val data = ByteBuffer.allocate(4 + bitmap.length)
      .order(ByteOrder.LITTLE_ENDIAN)
      .putInt(DeltaDv.Magic).put(bitmap).array()
    val padded = java.util.Arrays.copyOf(data, ((data.length + 3) / 4) * 4)
    val inline = DeltaDv.z85Encode(padded)
    val st = DeltaLog.read(spark, t) // force a read to prove the baseline
    assert(st.count() == 6L)
    val addPath = DeltaLog.activeFiles(spark, t)
      .collect().map(_.getString(0)).head
    val rel = java.nio.file.Paths.get(t).toAbsolutePath
      .relativize(java.nio.file.Paths.get(addPath)).toString
    val dir = java.nio.file.Paths.get(t, "_delta_log")
    Files.writeString(dir.resolve(f"${1L}%020d.json"),
      s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}
{"remove":{"path":"$rel","deletionTimestamp":1700000000000,"dataChange":true}}
{"add":{"path":"$rel","partitionValues":{},"size":512,"modificationTime":1700000000000,"dataChange":true,"deletionVector":{"storageType":"i","pathOrInlineDv":"$inline","offset":0,"sizeInBytes":${data.length},"cardinality":2}}}
""")
    val got = DeltaLog.read(spark, t).collect().map(_.getLong(0)).toSorted
    assert(got == Seq(0L, 2L, 4L, 5L), s"inline DV must drop rows 1,3: $got")
  }

  test("unknown reader features stay refused loudly") {
    val t = tbl()
    DeltaExport.create(Seq((1L, "a")).toDF("id", "s"), t)
    val dir = java.nio.file.Paths.get(t, "_delta_log")
    Files.writeString(dir.resolve(f"${1L}%020d.json"),
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["collations-preview"],"writerFeatures":["collations-preview"]}}""" + "\n")
    val e = intercept[IllegalArgumentException] {
      DeltaLog.read(spark, t)
    }
    assert(e.getMessage.contains("collations-preview"), e.getMessage)
  }

  test("superseded DV files are remove-tracked and vacuum-reclaimable") {
    val t = tbl()
    DeltaExport.create(
      (0L until 30L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), t)
    DeltaExport.deleteWhere(spark, t, col("id") === 1L)
    DeltaExport.deleteWhere(spark, t, col("id") === 2L) // merges → new DV file
    val dvFiles = {
      val s = java.nio.file.Files.list(Paths.get(t))
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.startsWith("deletion_vector_") && n.endsWith(".bin"))
        .toVector
      finally s.close()
    }
    assert(dvFiles.size == 2, s"expected old + merged DV files: $dvFiles")
    // the second delete's remove carries the REPLACED descriptor
    val commit2 = java.nio.file.Files.readString(
      Paths.get(t, "_delta_log", f"${2L}%020d.json"))
    val removeLine = commit2.linesIterator
      .find(_.contains("\"remove\"")).get
    assert(removeLine.contains("deletionVector"),
      s"remove must carry the replaced DV: $removeLine")
    // vacuum reclaims ONLY the superseded (unreferenced) vector once
    // aged past retention; the active one survives
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 10_000_000L)
    dvFiles.foreach(n =>
      java.nio.file.Files.setLastModifiedTime(Paths.get(t, n), old))
    val deleted = DeltaExport.vacuum(spark, t, retentionMs = 3600_000L)
    assert(deleted.size == 1 && deleted.head.startsWith("deletion_vector_"),
      s"vacuum must reclaim exactly the superseded DV: $deleted")
    // the table still reads correctly through the surviving vector
    assert(DeltaLog.read(spark, t).collect().map(_.getLong(0)).toSorted
      == ((0L until 30L).toSet -- Set(1L, 2L)).toSeq.sorted)
  }

  private implicit class SortedOps(a: Array[Long]) {
    def toSorted: Seq[Long] = a.toSeq.sorted
  }
}
