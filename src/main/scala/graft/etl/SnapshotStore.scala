package graft.etl

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}

/** E13 at scale: an ACID-ish SNAPSHOT table over plain parquet — the
  * transactional story the join-overwrite point update
  * ([[WarehouseWriter.pointUpdate]]) needs when readers run
  * concurrently with writers. Delta/Iceberg provide this via a
  * manifest + atomic pointer swap; neither resolves offline
  * (SURVEY §7.4), so this is the same core protocol hand-rolled:
  *
  *   - every version's rows live in their OWN immutable directory
  *     `<root>/data/v<N>` (never rewritten, never deleted here — an
  *     in-flight reader keeps a consistent view no matter how many
  *     commits land after it resolved);
  *   - `<root>/_latest` is the single pointer file; a commit writes
  *     the full new data directory FIRST, then swaps the pointer with
  *     a same-directory ATOMIC_MOVE rename — a reader sees the old
  *     pointer or the new one, never a torn mix and never a pointer
  *     to half-written data;
  *   - the pointer records the last applied `batchId`, so replaying a
  *     batch (the at-least-once delivery case) is a detected NO-OP —
  *     version unchanged, no new directory.
  *
  * Upsert semantics are MERGE's (the E6/E13 composition): the batch
  * is deduped to one row per key under `tieBreak`, existing rows with
  * a batch key are replaced, all other existing rows carry over.
  *
  * 100 TB posture: the merge is one key-equi anti-join (AQE
  * broadcasts typical micro-batches) + a union — shuffle only on the
  * keys; the pointer swap is O(1) driver metadata, identical to
  * Delta's `_last_checkpoint`/log-entry rename discipline. What this
  * deliberately does NOT implement: multi-writer conflict detection
  * (Delta's optimistic log protocol) — single-writer, many-reader,
  * which is the reference pipeline's actual topology.
  */
object SnapshotStore {

  /** One resolved snapshot: immutable data directory + lineage ids. */
  case class Snapshot(version: Long, dataPath: String, batchId: String)

  private def pointer(root: String): Path = Paths.get(root, "_latest")

  /** The committed snapshot, or None for an uninitialized root. The
    * pointer file is small key=value lines — written whole + renamed
    * atomically, so a read never observes a partial write.
    */
  def latest(root: String): Option[Snapshot] = {
    val p = pointer(root)
    if (!Files.exists(p)) None
    else {
      val kv = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        .linesIterator.map(_.split("=", 2)).collect {
          case Array(k, v) => k -> v
        }.toMap
      Some(Snapshot(kv("version").toLong, kv("data"), kv("batch")))
    }
  }

  /** Read the CURRENT snapshot's rows. The returned frame is pinned to
    * the resolved immutable directory: commits that land after this
    * call do not change what it reads (snapshot isolation for free —
    * the directory is never mutated).
    */
  def read(spark: SparkSession, root: String): DataFrame =
    latest(root) match {
      case Some(s) => spark.read.parquet(s.dataPath)
      case None => throw new IllegalStateException(
        s"snapshot store at $root has no committed snapshot")
    }

  /** Swap the pointer: write the whole new pointer beside the old one,
    * then same-directory atomic rename. Readers racing this see old
    * or new — POSIX rename is atomic with respect to open/read.
    */
  private def commitPointer(root: String, s: Snapshot): Unit = {
    val tmp = Paths.get(root, s"_latest.tmp.${java.util.UUID.randomUUID}")
    val body = s"version=${s.version}\ndata=${s.dataPath}\nbatch=${s.batchId}\n"
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointer(root),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** First commit: version 1 from `df` alone. */
  def init(
      spark: SparkSession, root: String, df: DataFrame,
      batchId: String): Snapshot = {
    require(latest(root).isEmpty, s"snapshot store at $root already exists")
    writeVersion(root, df, 1L, batchId)
  }

  /** MERGE `batch` into the current snapshot as version N+1:
    * batch-deduped rows replace same-key existing rows, the rest of
    * the existing rows carry over. A batch whose `batchId` equals the
    * committed one is a REPLAY and commits nothing (idempotent under
    * at-least-once redelivery).
    */
  def upsert(
      spark: SparkSession, root: String, batch: DataFrame,
      keys: Seq[String], tieBreak: Seq[String],
      batchId: String): Snapshot = {
    val cur = latest(root).getOrElse(throw new IllegalStateException(
      s"snapshot store at $root has no committed snapshot — call init"))
    if (cur.batchId == batchId) cur
    else {
      val existing = spark.read.parquet(cur.dataPath)
      // freshRows against an empty frame = the batch-dedup half alone
      // (one row per key under tieBreak); unlike INSERT IGNORE the
      // batch rows must WIN against existing, so no anti-join here
      val deduped = WarehouseWriter
        .freshRows(existing.limit(0), batch, keys, tieBreak)
      val merged = existing
        .join(deduped.select(keys.map(org.apache.spark.sql.functions.col): _*),
          keys, "left_anti")
        .unionByName(deduped)
      writeVersion(root, merged, cur.version + 1, batchId)
    }
  }

  /** Write the full immutable data directory for `version`, THEN swap
    * the pointer — the write-ahead order the torn-state guarantee
    * rests on. A crash between the two leaves an orphan directory and
    * an untouched pointer: readers never notice.
    */
  private def writeVersion(
      root: String, df: DataFrame, version: Long,
      batchId: String): Snapshot = {
    val dataPath = Paths.get(root, "data", s"v$version").toString
    df.write.mode("errorifexists").parquet(dataPath)
    val s = Snapshot(version, dataPath, batchId)
    commitPointer(root, s)
    s
  }
}
