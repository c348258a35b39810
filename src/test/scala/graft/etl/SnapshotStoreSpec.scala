package graft.etl

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The snapshot-upsert protocol's three guarantees, driven end to end
  * against real directories: merge semantics, replay idempotence, and
  * reader isolation (old-or-new, never torn).
  */
class SnapshotStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot: String =
    Files.createTempDirectory("snap_").toString

  private def rows(kv: (Long, String, Long)*) =
    kv.toSeq.toDF("id", "name", "ver")

  test("upsert merges: batch keys replace, other keys carry over, new keys append") {
    val root = freshRoot
    SnapshotStore.init(spark, root,
      rows((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)), "b0")
    val s = SnapshotStore.upsert(spark, root,
      rows((2L, "B", 2L), (4L, "d", 2L)),
      keys = Seq("id"), tieBreak = Seq("ver"), batchId = "b1")
    assert(s.version == 2L)
    val got = SnapshotStore.read(spark, root)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (1L, "a", 1L), (2L, "B", 2L), (3L, "c", 1L), (4L, "d", 2L)))
  }

  test("within-batch duplicates keep the HIGHEST tie-break per key (latest-wins)") {
    val root = freshRoot
    SnapshotStore.init(spark, root, rows((1L, "a", 1L)), "b0")
    SnapshotStore.upsert(spark, root,
      rows((5L, "early", 2L), (5L, "late", 9L)),
      keys = Seq("id"), tieBreak = Seq("ver"), batchId = "b1")
    val five = SnapshotStore.read(spark, root)
      .filter(col("id") === 5L).collect()
    assert(five.length == 1 && five.head.getString(1) == "late",
      s"MERGE dedup must keep the latest row per key: ${five.toSeq}")
  }

  test("replaying a batch id is a no-op: same version, same rows, no new dir") {
    val root = freshRoot
    SnapshotStore.init(spark, root, rows((1L, "a", 1L)), "b0")
    val s1 = SnapshotStore.upsert(spark, root, rows((2L, "b", 2L)),
      Seq("id"), Seq("ver"), "b1")
    val before = SnapshotStore.read(spark, root).orderBy("id").collect().toSeq
    val s2 = SnapshotStore.upsert(spark, root, rows((2L, "CHANGED", 3L)),
      Seq("id"), Seq("ver"), "b1")
    assert(s2 == s1, "replayed batch must return the committed snapshot")
    assert(SnapshotStore.read(spark, root).orderBy("id").collect().toSeq
      == before)
    val dirs = Files.list(Paths.get(root, "data")).count()
    assert(dirs == 2L, s"replay wrote a data directory: $dirs")
  }

  test("reader isolation: a resolved frame pins its snapshot across commits") {
    val root = freshRoot
    SnapshotStore.init(spark, root, rows((1L, "old", 1L)), "b0")
    val pinned = SnapshotStore.read(spark, root) // resolves v1's dir
    SnapshotStore.upsert(spark, root, rows((1L, "new", 2L)),
      Seq("id"), Seq("ver"), "b1")
    // the in-flight reader still sees v1 in full — its directory is
    // immutable and never deleted
    assert(pinned.collect().map(_.getString(1)).toSeq == Seq("old"))
    assert(SnapshotStore.read(spark, root)
      .collect().map(_.getString(1)).toSeq == Seq("new"))
  }

  test("torn-state: a crash before the claim leaves readers on the old snapshot") {
    val root = freshRoot
    SnapshotStore.init(spark, root, rows((1L, "old", 1L)), "b0")
    // simulate the crash window: an attempt data directory is fully
    // written but the commit-log claim never ran (the protocol's
    // write order guarantees this is the ONLY intermediate state)
    rows((1L, "half-committed", 2L)).write
      .parquet(Paths.get(root, "data", "v2-deadbeef").toString)
    val s = SnapshotStore.latest(root).get
    assert(s.version == 1L, "latest moved without a commit-log claim")
    assert(SnapshotStore.read(spark, root)
      .collect().map(_.getString(1)).toSeq == Seq("old"))
    // and the pointer mirror is always a complete, parseable whole
    val body = new String(
      Files.readAllBytes(Paths.get(root, "_latest")), "UTF-8")
    assert(body.contains("version=1") && body.contains("batch=b0"))
  }

  test("a crashed commit attempt is retryable: redelivery lands the batch") {
    val root = freshRoot
    SnapshotStore.init(spark, root, rows((1L, "old", 1L)), "b0")
    // the exact at-least-once scenario: attempt for b1 crashed after
    // the data write, orphan dir on disk, no claim — then the source
    // redelivers b1
    rows((1L, "crashed", 2L)).write
      .parquet(Paths.get(root, "data", "v2-deadbeef").toString)
    val s = SnapshotStore.upsert(spark, root, rows((1L, "retried", 2L)),
      Seq("id"), Seq("ver"), "b1")
    assert(s.version == 2L, "redelivered batch must commit, not collide")
    assert(SnapshotStore.read(spark, root)
      .collect().map(_.getString(1)).toSeq == Seq("retried"))
    // the orphan is untouched (vacuum is out-of-band by design)
    assert(Files.exists(Paths.get(root, "data", "v2-deadbeef")))
  }

  test("two contending writers: both batches land exactly once, loser re-merges") {
    val root = freshRoot
    SnapshotStore.init(spark, root, rows((1L, "base", 1L)), "b0")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val gate = new java.util.concurrent.CountDownLatch(1)
    val writers = Seq("bA" -> (2L, "a", 2L), "bB" -> (3L, "b", 2L)).map {
      case (bid, row) =>
        new Thread(() => {
          try {
            gate.await()
            SnapshotStore.upsert(spark, root, rows(row),
              Seq("id"), Seq("ver"), bid)
          } catch { case t: Throwable => errs.add(t) }
        })
    }
    writers.foreach(_.start()); gate.countDown()
    writers.foreach(_.join(60000))
    assert(errs.isEmpty, s"writer failed: ${errs.asScala.toSeq}")
    // both rows present: the claim loser re-merged on the winner
    val got = SnapshotStore.read(spark, root)
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(got == Seq("base", "a", "b"), s"lost a contender's batch: $got")
    assert(SnapshotStore.latest(root).get.version == 3L)
    // and each batch is recorded exactly once: replaying either is a no-op
    val v = SnapshotStore.upsert(spark, root, rows((9L, "dup", 9L)),
      Seq("id"), Seq("ver"), "bA")
    assert(v.version == 3L, "replay of a contended batch must be a no-op")
  }

  test("pointer swaps are atomic under a concurrent re-resolving reader") {
    val root = freshRoot
    SnapshotStore.init(spark, root, rows((1L, "v1", 1L)), "b0")
    @volatile var stop = false
    @volatile var torn: Option[String] = None
    val reader = new Thread(() => {
      while (!stop && torn.isEmpty) {
        // every resolve must yield a complete snapshot whose version
        // and batch agree — a torn read would mix fields
        val s = SnapshotStore.latest(root).get
        val ok = s.batchId == s"b${s.version - 1}" &&
          s.dataPath.contains(s"/v${s.version}-")
        if (!ok) torn = Some(s.toString)
      }
    })
    reader.start()
    (1 to 8).foreach { i =>
      SnapshotStore.upsert(spark, root, rows((1L, s"v${i + 1}", i + 1L)),
        Seq("id"), Seq("ver"), s"b$i")
    }
    stop = true
    reader.join(10000)
    assert(torn.isEmpty, s"reader observed a torn pointer: $torn")
    assert(SnapshotStore.latest(root).get.version == 9L)
  }

  test("vacuum reclaims superseded and orphan dirs; current and fresh survive") {
    val root = freshRoot
    SnapshotStore.init(spark, root, rows((1L, "a", 1L)), "b0")
    SnapshotStore.upsert(spark, root, rows((2L, "b", 2L)),
      keys = Seq("id"), tieBreak = Seq("ver"), batchId = "b1")
    val cur = SnapshotStore.upsert(spark, root, rows((3L, "c", 3L)),
      keys = Seq("id"), tieBreak = Seq("ver"), batchId = "b2")
    // plant a crash orphan: a data dir no commit marker references
    val orphan = Paths.get(root, "data", "v9-deadbeef")
    Files.createDirectories(orphan)
    Files.writeString(orphan.resolve("part-0.parquet"), "junk")
    def dataDirs = {
      val s = Files.list(Paths.get(root, "data"))
      try s.iterator().asScala.map(_.getFileName.toString).toSet
      finally s.close()
    }
    assert(dataDirs.size == 4, s"expected 3 versions + orphan: $dataDirs")
    // a generous retention reclaims nothing (everything is fresh —
    // possibly an in-flight contender or a pinned reader's snapshot)
    assert(SnapshotStore.vacuum(root, retentionMs = 3600000L).isEmpty)
    assert(dataDirs.size == 4)
    Thread.sleep(60)
    val reclaimed = SnapshotStore.vacuum(root, retentionMs = 10L)
    assert(reclaimed.size == 3, s"reclaim superseded + orphan: $reclaimed")
    val left = dataDirs
    assert(left == Set(Paths.get(cur.dataPath).getFileName.toString),
      s"only the current snapshot's dir survives: $left")
    // the store still reads, at the same version, with the full rows
    assert(SnapshotStore.latest(root).get.version == 3L)
    assert(SnapshotStore.read(spark, root).count() == 3L)
    // markers are never deleted — the log stays the audit trail
    val markers = {
      val s = Files.list(Paths.get(root, "_commits"))
      try s.iterator().asScala.count(_.getFileName.toString.startsWith("v"))
      finally s.close()
    }
    assert(markers == 3, s"commit markers must survive vacuum: $markers")
  }
}
