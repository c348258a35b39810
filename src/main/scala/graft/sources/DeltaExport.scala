package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** Write-side complement of [[DeltaLog]]: export DataFrames AS a
  * Delta table by authoring the open transaction-log protocol
  * directly — protocol (1, 2), metaData with the Spark JSON schema,
  * one add action per parquet file with hive-layout partitionValues.
  * With [[DeltaLog]] this closes the Delta interop gap in both
  * directions without the (offline-unresolvable) delta-spark jar; the
  * round-trip is pinned by spec, and the emitted actions use only
  * fields PROTOCOL.md marks required for v1 readers, so a real
  * delta-spark reader has nothing unsupported to trip on.
  *
  * Concurrency: versions are claimed with the same atomic-exclusive
  * hardlink discipline as [[graft.etl.SnapshotStore]] (temp file +
  * `createLink` onto the zero-padded name — exactly one contender
  * wins a version; the loser retries on the next). Data files land
  * under hive-style `k=v/` directories BEFORE the commit is linked,
  * so a reader never sees a version whose files aren't durable
  * (Delta's own write-then-commit order).
  *
  * Scale shape: the data write is a plain distributed
  * `df.write.partitionBy(...).parquet` (one job, no driver rows); the
  * log authoring is metadata work bounded by files-added-per-commit.
  */
object DeltaExport {

  private def logDir(table: String): Path = Paths.get(table, "_delta_log")

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  /** URL-encode one path segment the way Delta encodes `add.path`
    * (percent-encoding; keep '/', encode spaces as %20 not '+', and
    * keep '=' literal — delta-spark writes hive `k=v` dirs unescaped,
    * and over-encoding would break any consumer matching paths for a
    * remove).
    */
  private def enc(rel: String): String =
    rel.split('/')
      .map(seg =>
        java.net.URLEncoder.encode(seg, "UTF-8")
          .replace("+", "%20").replace("%3D", "="))
      .mkString("/")

  private def listParquet(root: Path): Set[String] = {
    if (!Files.isDirectory(root)) return Set.empty
    val s = Files.walk(root)
    try s.iterator().asScala
      .filter(p => Files.isRegularFile(p)
        && p.getFileName.toString.endsWith(".parquet")
        && !p.toAbsolutePath.toString.contains("/_delta_log/"))
      .map(p => root.relativize(p).toString)
      .toSet
    finally s.close()
  }

  /** Hive-layout `k=v` partition values of a relative file path, in
    * `partitionCols` order; values are URL-decoded like Spark writes
    * them encoded.
    */
  private def partitionValuesOf(
      rel: String, partitionCols: Seq[String]): Map[String, String] = {
    val dirs = rel.split('/').dropRight(1)
    val kv = dirs.flatMap { d =>
      val i = d.indexOf('=')
      if (i > 0)
        Some(d.take(i) -> java.net.URLDecoder.decode(d.drop(i + 1), "UTF-8"))
      else None
    }.toMap
    partitionCols.flatMap(c => kv.get(c).map(c -> _)).toMap
  }

  private def addJson(table: String, rel: String, pv: Map[String, String]): String = {
    val size = Files.size(Paths.get(table, rel))
    val pvJson = pv.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
      .mkString("{", ",", "}")
    s"""{"add":{"path":"${enc(rel)}","partitionValues":$pvJson,"size":$size,"modificationTime":${Files.getLastModifiedTime(Paths.get(table, rel)).toMillis},"dataChange":true}}"""
  }

  private def metaDataJson(
      tableId: String, schema: StructType, partitionCols: Seq[String]): String = {
    val pcs = partitionCols.map(c => s""""${esc(c)}"""").mkString("[", ",", "]")
    s"""{"metaData":{"id":"${esc(tableId)}","format":{"provider":"parquet","options":{}},"schemaString":"${esc(schema.json)}","partitionColumns":$pcs,"configuration":{},"createdTime":${System.currentTimeMillis()}}}"""
  }

  /** Atomically claim `version`: returns false when another writer
    * owns it (the SnapshotStore hardlink discipline).
    */
  private def claim(table: String, version: Long, lines: Seq[String]): Boolean = {
    val dir = logDir(table)
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".tmp-${java.util.UUID.randomUUID}")
    Files.write(tmp,
      lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW)
    try {
      Files.createLink(dir.resolve(f"$version%020d.json"), tmp); true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally Files.deleteIfExists(tmp)
  }

  private def nextVersion(table: String): Long = {
    val dir = logDir(table)
    if (!Files.isDirectory(dir)) return 0L
    val s = Files.list(dir)
    // checkpoint files count: after log pruning (expired JSON deleted
    // behind a checkpoint) the next version continues PAST the
    // checkpoint, it does not restart at 0
    val vs =
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.matches("\\d{20}\\.json")
          || n.matches("\\d{20}\\.checkpoint(\\.\\d+\\.\\d+)?\\.parquet"))
        .map(_.take(20).toLong).toVector
      finally s.close()
    vs.maxOption.map(_ + 1L).getOrElse(0L)
  }

  /** Write `df` to a PRIVATE staging directory, then move each file
    * into the table tree — concurrent writers therefore never share a
    * Spark `_temporary` committer directory and never see each
    * other's files when enumerating what THEY added (the two races a
    * naive `mode("append")` to the shared path has). File names carry
    * task UUIDs, so moves cannot collide. Returns the added relative
    * paths.
    */
  private def stageIn(
      df: DataFrame, table: String, partitionBy: Seq[String]): Seq[String] = {
    val stage = Files.createTempDirectory("delta_stage")
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(stage.toString)
    val rels = listParquet(stage).toSeq.sorted
    rels.foreach { rel =>
      val dest = Paths.get(table, rel)
      Files.createDirectories(dest.getParent)
      Files.move(stage.resolve(rel), dest)
    }
    rels
  }

  /** Create a Delta table at `table` from `df`, hive-partitioned by
    * `partitionBy`. Commit 0 = protocol + metaData + the written
    * files' adds. Fails if the table already has a log.
    */
  def create(df: DataFrame, table: String, partitionBy: Seq[String] = Nil): Unit = {
    require(nextVersion(table) == 0L,
      s"$table already has a Delta log; use append")
    val added = stageIn(df, table, partitionBy)
    val lines =
      Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        metaDataJson(java.util.UUID.randomUUID.toString, df.schema, partitionBy)) ++
        added.map(rel =>
          addJson(table, rel, partitionValuesOf(rel, partitionBy))) :+
        s"""{"commitInfo":{"operation":"CREATE TABLE AS SELECT"}}"""
    if (!claim(table, 0L, lines))
      throw new IllegalStateException(
        s"lost the race for $table version 0 — another writer created it")
  }

  /** Append `df` as the next version. The data files land (staged,
    * privately enumerated) BEFORE the commit is claimed, and the
    * claim retries on the next version on conflict — appends add
    * disjoint uniquely-named files, so contending appends are always
    * safe to serialize this way (a conflicting REPLACE would need
    * Delta's full conflict checker; out of scope, append-only here).
    */
  def append(df: DataFrame, table: String, partitionBy: Seq[String] = Nil): Long = {
    val added = stageIn(df, table, partitionBy)
    val lines = added.map(rel =>
      addJson(table, rel, partitionValuesOf(rel, partitionBy))) :+
      s"""{"commitInfo":{"operation":"WRITE"}}"""
    var v = nextVersion(table)
    while (!claim(table, v, lines)) v = nextVersion(table)
    v
  }

  /** REPLACE the table's content with `df` as the next version —
    * Delta's `mode("overwrite")`: one commit carrying a `remove` for
    * every currently-active file plus the staged `add`s, so readers
    * atomically flip from the old snapshot to the new and TIME TRAVEL
    * to pre-overwrite versions keeps working (removes are tombstones,
    * not deletes; `vacuum` reclaims the files later). Contention: the
    * active set is re-read INSIDE the claim loop, so a lost claim
    * recomputes its removes against the winner's state — two racing
    * overwrites serialize with last-writer-wins, the Delta semantic.
    * Returns the committed version.
    */
  def overwrite(
      df: DataFrame, table: String, partitionBy: Seq[String] = Nil): Long =
    overwriteTxn(df, table, partitionBy, None).get

  /** [[overwrite]] carrying an optional `txn` action — the
    * exactly-once handshake for REPLACE commits (the appendBatch
    * discipline): a (appId, batchId) at or below the table's txn
    * watermark is a NO-OP (None; the staged files stay orphans for
    * vacuum), and the watermark is re-checked inside the claim loop so
    * two attempts of the same batch racing after a driver failover
    * commit once.
    */
  def overwriteTxn(
      df: DataFrame, table: String, partitionBy: Seq[String] = Nil,
      txn: Option[(String, Long)] = None): Option[Long] = {
    val spark = df.sparkSession
    def replayed: Boolean = txn.exists { case (appId, batchId) =>
      DeltaLog.lastTxnVersion(spark, table, appId).exists(_ >= batchId)
    }
    if (replayed) return None
    val added = stageIn(df, table, partitionBy)
    var v = nextVersion(table)
    require(v > 0L, s"$table has no Delta log; use create")
    var committed = false
    while (!committed) {
      if (replayed) return None
      val st = DeltaLog.stateAt(spark, table, None)
      val removes = st.active.keys.toSeq.sorted.map(p =>
        s"""{"remove":{"path":"${esc(p)}","deletionTimestamp":${System.currentTimeMillis()},"dataChange":true}}""")
      val txnLines = txn.toSeq.map { case (appId, batchId) =>
        s"""{"txn":{"appId":"${esc(appId)}","version":$batchId,"lastUpdated":${System.currentTimeMillis()}}}"""
      }
      val lines = txnLines ++ removes ++
        added.map(rel =>
          addJson(table, rel, partitionValuesOf(rel, partitionBy))) :+
        s"""{"commitInfo":{"operation":"WRITE","operationParameters":{"mode":"Overwrite"}}}"""
      committed = claim(table, v, lines)
      if (!committed) v = nextVersion(table)
    }
    Some(v)
  }

  /** EXACTLY-ONCE streaming append — Delta's `txn` handshake: commit
    * `df` tagged (appId, batchId); a replayed batch (at-least-once
    * redelivery after a sink restart) whose batchId ≤ the table's last
    * committed txn version for `appId` is a NO-OP — no data files, no
    * commit. Orphan files from a crash between stage-in and commit are
    * never referenced by any log entry, so readers never see them (the
    * same crash-window story as SnapshotStore's per-attempt dirs).
    * Returns the committed version, or None for a skipped replay.
    *
    * Wire it to Structured Streaming as
    * `ds.writeStream.foreachBatch((b, id) =>
    *   DeltaExport.appendBatch(b, table, appId, id)): exactly-once
    * Delta sink semantics from an at-least-once foreachBatch.
    */
  def appendBatch(
      df: DataFrame, table: String, appId: String, batchId: Long,
      partitionBy: Seq[String] = Nil): Option[Long] = {
    val spark = df.sparkSession
    if (DeltaLog.lastTxnVersion(spark, table, appId).exists(_ >= batchId))
      return None
    val added = stageIn(df, table, partitionBy)
    val lines =
      s"""{"txn":{"appId":"${esc(appId)}","version":$batchId,"lastUpdated":${System.currentTimeMillis()}}}""" +:
        added.map(rel =>
          addJson(table, rel, partitionValuesOf(rel, partitionBy))) :+
        s"""{"commitInfo":{"operation":"STREAMING UPDATE"}}"""
    var v = nextVersion(table)
    while (!claim(table, v, lines)) {
      // a contender landed meanwhile — it may have been THIS batch
      // (two attempts racing after a driver failover): re-check the
      // txn watermark before retrying the claim
      if (DeltaLog.lastTxnVersion(spark, table, appId).exists(_ >= batchId))
        return None
      v = nextVersion(table)
    }
    Some(v)
  }

  /** Delete data files the CURRENT snapshot no longer references and
    * whose modification time is older than `retentionMs` — removed
    * files past their tombstone use, and orphans from appends that
    * crashed between stage-in and commit. The retention window is the
    * same safety Delta's VACUUM has: a file younger than it may belong
    * to an in-flight commit (staged, not yet claimed) or serve a
    * reader pinned to an older version, so it survives; vacuuming
    * also (deliberately, like Delta) forfeits time travel to versions
    * whose files it reclaims. Returns the deleted relative paths.
    */
  def vacuum(
      spark: org.apache.spark.sql.SparkSession, table: String,
      retentionMs: Long): Seq[String] = {
    val st = DeltaLog.stateAt(spark, table, None)
    val active = st.active.values
      .map(a => java.net.URLDecoder.decode(a.path, "UTF-8")).toSet
    val cutoff = System.currentTimeMillis() - retentionMs
    val victims = listParquet(Paths.get(table))
      .filterNot(active)
      .filter(rel =>
        Files.getLastModifiedTime(Paths.get(table, rel)).toMillis < cutoff)
      .toSeq.sorted
    victims.foreach(rel => Files.delete(Paths.get(table, rel)))
    victims
  }

  /** Compact the snapshot at the table's latest version into a parquet
    * checkpoint + `_last_checkpoint`, bounding future readers' JSON
    * replay to commits after it (the log-growth control every
    * long-lived Delta table runs; [[DeltaLog]] consumes it). The
    * checkpoint carries protocol, metaData, every active add AND the
    * txn map — dropping txns would silently break exactly-once replay
    * detection after a compaction.
    */
  def checkpoint(spark: org.apache.spark.sql.SparkSession, table: String): Long = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val v = DeltaLog.version(spark, table)
    val st = DeltaLog.stateAt(spark, table, Some(v))
    val ckptSchema = StructType(Seq(
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType)))),
      StructField("metaData", StructType(Seq(
        StructField("id", StringType),
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)),
        // carried so checkpointing a foreign column-mapped table
        // cannot silently drop the mapping mode (wrong rows after)
        StructField("configuration", MapType(StringType, StringType))))),
      StructField("txn", StructType(Seq(
        StructField("appId", StringType),
        StructField("version", LongType)))),
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues", MapType(StringType, StringType)),
        StructField("size", LongType),
        StructField("dataChange", BooleanType))))))
    val rows =
      Seq(Row(Row(st.minReader, 2), null, null, null),
        Row(null,
          Row(table, st.schemaJson.get, st.partitionCols, st.configuration),
          null, null)) ++
        st.txns.toSeq.sortBy(_._1).map { case (a, ver) =>
          Row(null, null, Row(a, ver), null)
        } ++
        st.active.values.toSeq.sortBy(_.path).map { a =>
          Row(null, null, null,
            Row(a.path, a.partitionValues, 0L, true))
        }
    val tmp = Files.createTempDirectory("delta_ckpt_w")
    spark.createDataFrame(
      rows.asJava, ckptSchema).coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    val part = {
      val s = Files.list(tmp)
      try s.iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      finally s.close()
    }
    val dir = logDir(table)
    Files.move(part, dir.resolve(f"$v%020d.checkpoint.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val lcTmp = dir.resolve(s".lc-${java.util.UUID.randomUUID}")
    Files.write(lcTmp,
      s"""{"version":$v,"size":${rows.size}}"""
        .getBytes(StandardCharsets.UTF_8))
    Files.move(lcTmp, dir.resolve("_last_checkpoint"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    v
  }
}
