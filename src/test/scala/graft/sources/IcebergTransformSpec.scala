package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** NON-IDENTITY partition transforms (r13) — the production table
  * shape at 100 TB is `day(event_time) + bucket(user_id)`: the writer
  * stages hive layout on the DERIVED values, keeps the SOURCE columns
  * in the data files (the spec's contract — only identity sources
  * reconstruct from metadata), and the manifests carry typed
  * transform partition structs. The bucket hash is pinned against the
  * spec's own Appendix-B vectors AND cross-checked against Spark's
  * independent Murmur3 implementation.
  */
class IcebergTransformSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(): String =
    Files.createTempDirectory("iceberg_tx_").resolve("t").toString

  test("murmur3 matches the spec's Appendix-B vectors and Spark's impl") {
    // spec: hash(int 34) = hash(long 34) = 2017239379 (8-byte LE)
    assert(IcebergExport.murmur3(IcebergExport.longLeBytes(34L)) == 2017239379)
    // spec: hash(string "iceberg") = 1210000089 (UTF-8 bytes)
    assert(IcebergExport.murmur3(
      "iceberg".getBytes(java.nio.charset.StandardCharsets.UTF_8)) == 1210000089)
    // spec: hash(date 2017-11-16) = -653330422 (days from epoch as long)
    val epochDay = java.time.LocalDate.of(2017, 11, 16).toEpochDay
    assert(IcebergExport.murmur3(IcebergExport.longLeBytes(epochDay)) == -653330422)
    // independent cross-check: Spark's Murmur3_x86_32 over random
    // WORD-ALIGNED inputs (Spark's tail handling deliberately
    // deviates from standard murmur3 on unaligned lengths; the
    // spec vectors above — "iceberg" is 7 bytes — pin the tail)
    val rnd = new scala.util.Random(7L)
    (1 to 50).foreach { _ =>
      val bytes = Array.fill(rnd.nextInt(10) * 4)(rnd.nextInt().toByte)
      val mine = IcebergExport.murmur3(bytes)
      val sparks = org.apache.spark.unsafe.hash.Murmur3_x86_32
        .hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
          bytes.length, 0)
      assert(mine == sparks, s"murmur3 drifted on ${bytes.length} bytes")
    }
  }

  test("day + bucket partitioned create/append round-trip; sources stay in files") {
    val t = tbl()
    val rows = Seq(
      (java.sql.Timestamp.valueOf("2024-03-05 08:00:00"), 1L, "a"),
      (java.sql.Timestamp.valueOf("2024-03-05 20:00:00"), 2L, "b"),
      (java.sql.Timestamp.valueOf("2024-03-06 09:00:00"), 3L, "c"))
    IcebergExport.createWithSpec(
      rows.toDF("ts", "user_id", "tag").coalesce(1), t,
      Seq(("day", "ts"), ("bucket[4]", "user_id")))
    // metadata carries the transforms
    val meta = IcebergTable.metadataJson(t)
    val transforms = meta.get("partition-specs").get(0).get("fields")
      .elements().asScala.map(_.get("transform").asText()).toSeq
    assert(transforms == Seq("day", "bucket[4]"), transforms)
    // hive layout uses the DERIVED values, bucket per the spec hash
    val b1 = IcebergExport.bucketOf(
      IcebergExport.murmur3(IcebergExport.longLeBytes(1L)), 4)
    val expectDir = Paths.get(t, "data", "ts_day=2024-03-05", s"user_id_bucket=$b1")
    assert(Files.isDirectory(expectDir), s"missing $expectDir")
    // the rows read back COMPLETE — source columns live in the files
    val got = IcebergTable.read(spark, t).orderBy("user_id").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == rows, s"transform round-trip drifted: $got")
    // append recomputes the derived values from the table's own spec
    IcebergExport.append(
      Seq((java.sql.Timestamp.valueOf("2024-03-07 01:00:00"), 4L, "d"))
        .toDF("ts", "user_id", "tag").coalesce(1), t)
    assert(IcebergTable.read(spark, t).count() == 4L)
    assert(Files.list(Paths.get(t, "data")).iterator().asScala
      .exists(_.getFileName.toString == "ts_day=2024-03-07"))
  }

  test("deletes and compaction work on transform-partitioned tables") {
    val t = tbl()
    val df = (0L until 40L).map(i =>
      (java.sql.Timestamp.valueOf(s"2024-03-0${1 + (i % 3)} 08:00:00"), i, s"r$i"))
      .toDF("ts", "user_id", "tag")
    IcebergExport.createWithSpec(df.coalesce(1), t, Seq(("day", "ts")))
    (0 until 3).foreach { k =>
      IcebergExport.append(
        Seq((java.sql.Timestamp.valueOf("2024-03-01 09:00:00"),
          100L + k, s"x$k")).toDF("ts", "user_id", "tag").coalesce(1), t)
    }
    IcebergExport.deleteWhere(spark, t, col("user_id") === 5L)
    IcebergExport.deleteWhereEquality(spark, t, Seq("x1").toDF("tag"))
    val pre = IcebergTable.read(spark, t).collect()
      .map(_.getLong(1)).toSet
    assert(!pre(5L) && !pre(101L) && pre(100L) && pre(102L))
    // compaction respects the DAY boundary and keeps rows identical
    val (before, after) = IcebergExport.rewriteDataFiles(
      spark, t, 64L * 1024 * 1024)
    assert(after < before, s"$before → $after")
    val post = IcebergTable.read(spark, t).collect()
      .map(_.getLong(1)).toSet
    assert(post == pre, s"compaction over transforms drifted")
    // every data file still lives under exactly one day dir
    val metaN = IcebergTable.metadataJson(t)
    val files = IcebergTable.dataFilesOf(
      t, metaN, IcebergTable.currentSnapshotNode(metaN))
    assert(files.forall(_.contains("ts_day=")), files)
  }

  test("temporal transform PARTITION VALUES prune range probes") {
    val t = tbl()
    val rows = (0 until 6).map { m =>
      (java.sql.Timestamp.valueOf(f"2024-0${m + 1}%d-10 12:00:00"), m.toLong)
    }
    IcebergExport.createWithSpec(
      rows.toDF("ts", "id").repartition(6, col("ts")), t,
      Seq(("month", "ts")))
    val meta = IcebergTable.metadataJson(t)
    val files = IcebergTable.dataFilesOf(
      t, meta, IcebergTable.currentSnapshotNode(meta))
    assert(files.size == 6, s"one file per month: ${files.size}")
    // a one-month probe keeps ONE file purely from the month ordinal
    val (kept, total) = IcebergTable.prunedDataFiles(
      t, "ts",
      java.sql.Timestamp.valueOf("2024-03-01 00:00:00"),
      java.sql.Timestamp.valueOf("2024-03-31 23:59:59"))
    assert(total == 6 && kept.size == 1,
      s"month-transform pruning drifted: ${kept.size} of $total")
    // the pruned read equals the unpruned filtered read
    val got = IcebergTable.readRange(spark, t, "ts",
      java.sql.Timestamp.valueOf("2024-03-01 00:00:00"),
      java.sql.Timestamp.valueOf("2024-03-31 23:59:59"))
      .collect().map(_.getLong(1)).toSeq
    assert(got == Seq(2L), s"pruned read drifted: $got")
    // a straddling probe keeps both months
    val (kept2, _) = IcebergTable.prunedDataFiles(
      t, "ts",
      java.sql.Timestamp.valueOf("2024-03-20 00:00:00"),
      java.sql.Timestamp.valueOf("2024-04-05 00:00:00"))
    assert(kept2.size == 2, s"straddle must keep 2: ${kept2.size}")
  }

  test("truncate and temporal int transforms derive per the spec") {
    val t = tbl()
    IcebergExport.createWithSpec(
      Seq((-1L, "alphabet"), (23L, "alpine"), (10L, "beta"))
        .toDF("v", "name").coalesce(1), t,
      Seq(("truncate[10]", "v"), ("truncate[3]", "name")))
    // spec: truncate[10] floors toward -inf: -1 → -10, 23 → 20
    val dirs = {
      val s = Files.list(Paths.get(t, "data"))
      try s.iterator().asScala.map(_.getFileName.toString).toSet
      finally s.close()
    }
    assert(dirs == Set("v_trunc=-10", "v_trunc=20", "v_trunc=10"), dirs)
    val got = IcebergTable.read(spark, t).orderBy("v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((-1L, "alphabet"), (10L, "beta"), (23L, "alpine")), got)
    // year/month transforms derive the spec's int ordinals
    val t2 = tbl()
    IcebergExport.createWithSpec(
      Seq((java.sql.Date.valueOf("2024-03-05"), 1L)).toDF("d", "id")
        .coalesce(1), t2,
      Seq(("year", "d"), ("month", "d")))
    val dirs2 = {
      val s = Files.walk(Paths.get(t2, "data"))
      try s.iterator().asScala.map(_.getFileName.toString).toSet
      finally s.close()
    }
    assert(dirs2.contains("d_year=54"), dirs2) // 2024 - 1970
    assert(dirs2.contains("d_month=650"), dirs2) // 54*12 + 2
    assert(IcebergTable.read(spark, t2).count() == 1L)
  }

  test("temporal transforms stay UTC under a non-UTC session timezone") {
    // the spec's temporal frame is UTC; a cast(DateType) derivation
    // would place 2024-03-06T02:00Z into day 2024-03-05 under an LA
    // session — and the reader's UTC temporalOrdinal pruning would
    // then prune the file incorrectly
    val t = tbl()
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try {
      val ts = java.sql.Timestamp.from(
        java.time.Instant.parse("2024-03-06T02:00:00Z"))
      IcebergExport.createWithSpec(
        Seq((ts, 1L)).toDF("ts", "id").coalesce(1), t,
        Seq(("day", "ts")))
      assert(Files.isDirectory(Paths.get(t, "data", "ts_day=2024-03-06")),
        "day transform must derive in UTC, not the session zone")
      // and the UTC-frame pruning finds it on a UTC day probe
      val (kept, total) = IcebergTable.prunedDataFiles(
        t, "ts",
        java.sql.Timestamp.from(java.time.Instant.parse("2024-03-06T00:00:00Z")),
        java.sql.Timestamp.from(java.time.Instant.parse("2024-03-06T23:59:59Z")))
      assert(total == 1 && kept.size == 1, s"$kept of $total")
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }
}
