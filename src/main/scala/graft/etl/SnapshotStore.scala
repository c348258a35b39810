package graft.etl

import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** E13 at scale: an ACID-ish SNAPSHOT table over plain parquet — the
  * transactional story the join-overwrite point update
  * ([[WarehouseWriter.pointUpdate]]) needs when readers run
  * concurrently with writers. Delta/Iceberg provide this via a
  * manifest + atomic commit; neither resolves offline (SURVEY §7.4),
  * so this is the same core protocol hand-rolled:
  *
  *   - every commit ATTEMPT's rows live in their OWN immutable
  *     directory `<root>/data/v<N>-<token>` (never rewritten, never
  *     deleted once committed — an in-flight reader keeps a consistent
  *     view no matter how many commits land after it resolved). The
  *     per-attempt token makes a crashed or lost attempt RETRYABLE:
  *     the retry writes a fresh directory instead of colliding with
  *     the orphan (`errorifexists` on a deterministic path would fail
  *     forever — exactly the at-least-once redelivery the store
  *     exists to absorb);
  *   - `<root>/_commits/v<N>` is the commit LOG — one immutable marker
  *     per committed version, claimed with an atomic-exclusive
  *     hardlink (write the full body to a temp file, `createLink` it
  *     to the version name: POSIX link(2) fails with EEXIST if the
  *     version is taken, so exactly ONE contender wins each version
  *     and a reader never observes a half-written marker). This is
  *     Delta's optimistic concurrency protocol: a writer that loses
  *     the race re-reads the NEW latest snapshot, re-merges its batch
  *     on top, and retries as the next version;
  *   - `<root>/_latest` is a convenience mirror of the winning marker
  *     (atomic same-directory rename, old-or-new never torn) for
  *     humans and external tools — the commit log is authoritative
  *     and [[latest]] resolves from it, so a crash between claim and
  *     mirror loses nothing;
  *   - every marker records its `batchId`, so replaying ANY
  *     previously-applied batch (the at-least-once delivery case) is
  *     a detected NO-OP across the whole chain — version unchanged,
  *     no new directory — even when other writers committed in
  *     between.
  *
  * Upsert semantics are MERGE's (the E6/E13 composition): the batch
  * is deduped to one row per key under `tieBreak` DESCENDING — the
  * HIGHEST tie-break value wins within a batch (latest-wins, the
  * conventional MERGE dedup; supply a total order, ties beyond
  * `tieBreak` are arbitrary) — then batch rows replace same-key
  * existing rows and all other existing rows carry over.
  *
  * 100 TB posture: the merge is one key-equi anti-join (AQE
  * broadcasts typical micro-batches) + a union — shuffle only on the
  * keys; the claim is O(1) driver metadata, identical in shape to a
  * Delta log-entry PUT-if-absent. Orphan data directories from
  * crashed/lost attempts are unreferenced by any marker and safe for
  * an out-of-band vacuum (never deleted here: an orphan is the crash
  * evidence, and deleting a CONTENDER's dir mid-claim would race).
  */
object SnapshotStore {

  /** One resolved snapshot: immutable data directory + lineage ids. */
  case class Snapshot(version: Long, dataPath: String, batchId: String)

  /** Optimistic-commit retries before an upsert fails loudly — each
    * retry re-merges against the snapshot that beat it, so exhausting
    * this means `MaxCommitAttempts` writers landed during one merge.
    */
  val MaxCommitAttempts = 10

  private def commitsDir(root: String): Path = Paths.get(root, "_commits")
  private def pointer(root: String): Path = Paths.get(root, "_latest")

  private def body(s: Snapshot): String =
    s"version=${s.version}\ndata=${s.dataPath}\nbatch=${s.batchId}\n"

  private def parse(bytes: Array[Byte]): Snapshot = {
    val kv = new String(bytes, StandardCharsets.UTF_8)
      .linesIterator.map(_.split("=", 2)).collect {
        case Array(k, v) => k -> v
      }.toMap
    Snapshot(kv("version").toLong, kv("data"), kv("batch"))
  }

  /** Every committed snapshot, from the commit log (authoritative —
    * markers are immutable and appear atomically, so this scan is
    * race-free against concurrent claims).
    */
  private def committed(root: String): Seq[Snapshot] = {
    val dir = commitsDir(root)
    if (!Files.isDirectory(dir)) Nil
    else {
      val names = Files.list(dir)
      val markers =
        try names.iterator().asScala
          .filter(_.getFileName.toString.startsWith("v"))
          .toVector
        finally names.close()
      markers.map(p => parse(Files.readAllBytes(p)))
    }
  }

  /** The committed snapshot with the highest version, or None for an
    * uninitialized root.
    */
  def latest(root: String): Option[Snapshot] =
    committed(root).maxByOption(_.version)

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

  /** Atomically claim `s.version` in the commit log: full marker body
    * to a temp file, then an exclusive hardlink onto the version name.
    * Returns false when another writer owns the version.
    */
  private def claim(root: String, s: Snapshot): Boolean = {
    val dir = commitsDir(root)
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".tmp-${java.util.UUID.randomUUID}")
    Files.write(tmp, body(s).getBytes(StandardCharsets.UTF_8))
    try { Files.createLink(dir.resolve(s"v${s.version}"), tmp); true }
    catch { case _: FileAlreadyExistsException => false }
    finally Files.deleteIfExists(tmp)
  }

  /** Refresh the `_latest` mirror: write whole + same-directory atomic
    * rename, so an external reader sees old or new, never torn. Only
    * moves forward — a slow writer mirroring an already-superseded
    * version must not roll the file back.
    */
  private def mirrorPointer(root: String, s: Snapshot): Unit = {
    val cur = latest(root).getOrElse(s)
    val best = if (cur.version >= s.version) cur else s
    val tmp = Paths.get(root, s"_latest.tmp.${java.util.UUID.randomUUID}")
    Files.write(tmp, body(best).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointer(root),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Write one immutable per-attempt data directory for `version`. */
  private def writeData(
      root: String, df: DataFrame, version: Long,
      batchId: String): Snapshot = {
    val token = java.util.UUID.randomUUID.toString.take(8)
    val dataPath = Paths.get(root, "data", s"v$version-$token").toString
    df.write.mode("errorifexists").parquet(dataPath)
    Snapshot(version, dataPath, batchId)
  }

  private def deleteRecursively(path: String): Unit = {
    val p = Paths.get(path)
    if (Files.exists(p)) {
      val all = Files.walk(p)
      try all.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.deleteIfExists(f))
      finally all.close()
    }
  }

  /** First commit: version 1 from `df` alone. Race-safe: exactly one
    * contending init claims v1; the loser's directory is removed and
    * it fails loudly.
    */
  def init(
      spark: SparkSession, root: String, df: DataFrame,
      batchId: String): Snapshot = {
    require(latest(root).isEmpty, s"snapshot store at $root already exists")
    val s = writeData(root, df, 1L, batchId)
    if (!claim(root, s)) {
      deleteRecursively(s.dataPath)
      throw new IllegalStateException(
        s"snapshot store at $root already exists (lost the init race)")
    }
    mirrorPointer(root, s)
    s
  }

  /** MERGE `batch` into the latest snapshot as the next version:
    * batch rows deduped latest-wins under `tieBreak`, same-key
    * existing rows replaced, the rest carried over. A `batchId`
    * already present anywhere in the commit log is a REPLAY and
    * commits nothing. A lost optimistic claim re-merges against the
    * winner's snapshot and retries.
    */
  def upsert(
      spark: SparkSession, root: String, batch: DataFrame,
      keys: Seq[String], tieBreak: Seq[String],
      batchId: String): Snapshot = {
    var attempt = 0
    while (attempt < MaxCommitAttempts) {
      val all = committed(root)
      val cur = all.maxByOption(_.version).getOrElse(
        throw new IllegalStateException(
          s"snapshot store at $root has no committed snapshot — call init"))
      if (all.exists(_.batchId == batchId)) return cur
      val existing = spark.read.parquet(cur.dataPath)
      // latest-wins within the batch: one row per key, HIGHEST
      // tieBreak survives (the MERGE convention; E6's freshRows keeps
      // the lowest because INSERT IGNORE models first-write-wins)
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy(tieBreak.map(c => col(c).desc): _*)
      val deduped = batch
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .drop("__rn")
      val merged = existing
        .join(deduped.select(keys.map(col): _*), keys, "left_anti")
        .unionByName(deduped)
      val next = writeData(root, merged, cur.version + 1, batchId)
      if (claim(root, next)) {
        mirrorPointer(root, next)
        return next
      }
      // lost the claim: our attempt dir is unreferenced by
      // construction (only the claim publishes a path) — tidy it and
      // re-merge against whatever won
      deleteRecursively(next.dataPath)
      attempt += 1
    }
    throw new IllegalStateException(
      s"upsert of batch $batchId lost $MaxCommitAttempts optimistic " +
        s"claims in a row at $root — contention beyond design load")
  }

  /** The out-of-band vacuum the Scaladoc promises (DeltaExport.vacuum's
    * retention semantics): reclaim data directories no CURRENT reader
    * needs — superseded snapshots' dirs (version < latest; forfeits
    * reads of those versions, Delta's own vacuum trade) and orphan
    * attempt dirs referenced by no commit marker (crashed/lost
    * contenders) — but ONLY past `retentionMs`: a fresh directory may
    * be an in-flight contender's write or serve a reader pinned to a
    * just-superseded snapshot. Commit markers are never deleted (the
    * log stays the audit trail; a marker whose data is vacuumed reads
    * as reclaimed history). The CURRENT snapshot's directory always
    * survives regardless of age. Returns the reclaimed paths.
    *
    * MINIMUM SAFE RETENTION: `retentionMs` must exceed the longest
    * expected write duration (stage-in through claim) — mtime is the
    * only signal distinguishing an in-flight contender from an orphan,
    * so a retention shorter than a live write's duration deletes its
    * data dir mid-write (the attempt then fails its claim or publishes
    * a dangling path). This is the same operator contract as Delta's
    * VACUUM retention vs in-flight transactions.
    */
  def vacuum(root: String, retentionMs: Long): Seq[String] = {
    val cur = latest(root).getOrElse(
      throw new IllegalStateException(
        s"snapshot store at $root has no committed snapshot"))
    val curDir = Paths.get(cur.dataPath).toAbsolutePath.toString
    val dataRoot = Paths.get(root, "data")
    if (!Files.isDirectory(dataRoot)) return Nil
    val cutoff = System.currentTimeMillis() - retentionMs
    val dirs = {
      val s = Files.list(dataRoot)
      try s.iterator().asScala.toVector finally s.close()
    }
    // Close the commit-during-vacuum race: a writer may claim a NEWER
    // version between the latest() read above and the deletes below,
    // leaving that commit's dir protected only by its age. Re-read
    // latest() AFTER the listing and spare both currents — the deletes
    // then never touch a dir that is (or just became) the table head,
    // regardless of retention.
    val postCur = latest(root)
      .map(l => Paths.get(l.dataPath).toAbsolutePath.toString)
    val keep = Set(curDir) ++ postCur
    val victims = dirs
      .filter(d => !keep.contains(d.toAbsolutePath.toString))
      .filter(d => Files.getLastModifiedTime(d).toMillis < cutoff)
      .map(_.toAbsolutePath.toString).sorted
    victims.foreach(deleteRecursively)
    victims
  }
}
