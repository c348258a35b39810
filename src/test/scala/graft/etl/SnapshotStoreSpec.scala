package graft.etl

import java.nio.file.{Files, Paths}

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

  test("within-batch duplicates keep one row per key under the tie-break") {
    val root = freshRoot
    SnapshotStore.init(spark, root, rows((1L, "a", 1L)), "b0")
    SnapshotStore.upsert(spark, root,
      rows((5L, "late", 9L), (5L, "early", 2L)),
      keys = Seq("id"), tieBreak = Seq("ver"), batchId = "b1")
    val five = SnapshotStore.read(spark, root)
      .filter(col("id") === 5L).collect()
    assert(five.length == 1 && five.head.getString(1) == "early",
      s"tie-break must keep the first row per key: ${five.toSeq}")
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

  test("torn-state: a crash before the pointer swap leaves readers on the old snapshot") {
    val root = freshRoot
    SnapshotStore.init(spark, root, rows((1L, "old", 1L)), "b0")
    // simulate the crash window: the new data directory is fully
    // written but the pointer swap never ran (the protocol's write
    // order guarantees this is the ONLY intermediate state)
    rows((1L, "half-committed", 2L)).write
      .parquet(Paths.get(root, "data", "v2").toString)
    val s = SnapshotStore.latest(root).get
    assert(s.version == 1L, "pointer moved without a commit")
    assert(SnapshotStore.read(spark, root)
      .collect().map(_.getString(1)).toSeq == Seq("old"))
    // and the pointer file is always a complete, parseable whole
    val body = new String(
      Files.readAllBytes(Paths.get(root, "_latest")), "UTF-8")
    assert(body.contains("version=1") && body.contains("batch=b0"))
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
          s.dataPath.endsWith(s"v${s.version}")
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
}
