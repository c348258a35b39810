package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** CDC REPLICATION — maintain an exact replica of a Delta table by
  * consuming ONLY its change feed (the canonical downstream-pipeline
  * composition: [[DeltaCdf]] read side → net-change fold →
  * [[DeltaMerge.applyChanges]] write side). This is what "tail the
  * table" means in production: the replica never re-reads the source
  * snapshot, only the changes since its own high-water mark.
  *
  * EXACTLY-ONCE without a side channel: the consumed offset (last
  * source version applied) lives in the REPLICA's own Delta `txn`
  * map under `appId`, and [[DeltaMerge.applyChanges]] commits the
  * offset and the data in ONE commit — a crash between "apply" and
  * "record offset" cannot exist, and a replayed window is rejected
  * by the txn gate inside the claim loop (two racing replicas of the
  * same app cannot double-apply). Zero-net-change windows still
  * advance the watermark via a txn-only commit.
  *
  * Net-change fold: per key, the LAST version in the window wins;
  * within a version an insert/update_postimage beats a delete (a
  * computed overwrite feed shows a surviving key as delete+insert of
  * the same version — the survivor is the truth), and preimages are
  * bookkeeping, never a final state.
  *
  * Scale shape: one change-feed read over exactly the changed files,
  * one window rank shuffled on the replica keys (bounded by changed
  * rows, not table size), one copy-on-write merge touching only the
  * replica files holding changed keys.
  */
object CdfReplica {

  /** Create the (empty) replica table with the source's current
    * schema and partitioning. The first [[sync]] then replays the
    * source's feed from version 0.
    */
  def init(spark: SparkSession, source: String, replica: String): Unit = {
    val st = DeltaLog.stateAt(spark, source, None)
    val schema = DataType.fromJson(st.schemaJson.get).asInstanceOf[StructType]
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    DeltaExport.create(empty, replica, st.partitionCols)
  }

  /** One sync step: consume the source's changes past the replica's
    * stored watermark and apply them atomically. Returns the replica
    * version committed, or None when there was nothing new.
    */
  def sync(
      spark: SparkSession, source: String, replica: String,
      keys: Seq[String], appId: String): Option[Long] = {
    val latest = DeltaLog.version(spark, source)
    val from = DeltaLog.lastTxnVersion(spark, replica, appId)
      .map(_ + 1L).getOrElse(0L)
    if (from > latest) return None
    val feed = DeltaCdf.readChangeFeed(spark, source, from, Some(latest))
    val net = netChanges(feed, keys)
    DeltaMerge.applyChanges(spark, replica, net, keys,
      Some((appId, latest)))
  }

  /** CROSS-FORMAT replication: maintain a DELTA replica of an
    * ICEBERG table from its changelog ([[IcebergChangelog]] read side
    * → the same net-change fold → [[DeltaMerge.applyChanges]] write
    * side). The consumed offset is the last applied snapshot's
    * SEQUENCE NUMBER (monotonic per commit, survives
    * `expireSnapshots` — snapshot ids are random and ordinals shift
    * under retention, so neither can feed the numeric replay gate);
    * v1 sources without sequence numbers and rolled-back logs (whose
    * sequence line is no longer increasing) refuse loudly rather
    * than risking a skipped or double-applied window.
    */
  def syncFromIceberg(
      spark: SparkSession, source: String, replica: String,
      keys: Seq[String], appId: String): Option[Long] = {
    val log = IcebergTable.snapshotIds(source)
    if (log.isEmpty) return None
    val seqs: Seq[(Long, Long)] = log.map { id =>
      val snap = IcebergTable.snapshotNode(
        IcebergTable.metadataJson(source), Some(id))
      val seq = Option(snap.get("sequence-number")).map(_.asLong())
        .getOrElse(throw new IllegalArgumentException(
          s"snapshot $id of $source has no sequence-number (a " +
            "format-version 1 table): the replication offset needs " +
            "the monotonic sequence line — upgrade the table first"))
      (id, seq)
    }
    require(seqs.map(_._2) == seqs.map(_._2).sorted &&
      seqs.map(_._2).distinct == seqs.map(_._2),
      s"$source's snapshot-log sequence line is not strictly " +
        "increasing (a rollback re-surfaced an old snapshot): " +
        "re-initialize the replica rather than guessing the window")
    val lastApplied = DeltaLog.lastTxnVersion(spark, replica, appId)
      .getOrElse(-1L)
    val pending = seqs.filter(_._2 > lastApplied)
    if (pending.isEmpty) return None
    val feed = IcebergChangelog.changelog(
      spark, source, Some(pending.head._1), Some(pending.last._1))
      .withColumn("_commit_version", col("_change_ordinal").cast("long"))
      .drop("_change_ordinal", "_commit_snapshot_id")
    val net = netChanges(feed, keys)
    DeltaMerge.applyChanges(spark, replica, net, keys,
      Some((appId, pending.last._2)))
  }

  /** [[init]] for an Iceberg source: the empty Delta replica takes
    * the Iceberg table's current schema (identity-partition sources
    * included; the replica itself is unpartitioned — partitioning is
    * a physical choice of the mirror, not part of fidelity).
    */
  def initFromIceberg(
      spark: SparkSession, source: String, replica: String): Unit = {
    val schema = IcebergTable.schemaOf(
      IcebergTable.metadataJson(source))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    DeltaExport.create(empty, replica)
  }

  /** Fold a multi-version change feed to ONE final state per key:
    * `_change_type` ∈ {upsert, delete} rows ready for
    * [[DeltaMerge.applyChanges]].
    */
  def netChanges(feed: DataFrame, keys: Seq[String]): DataFrame = {
    // within a version: postimage/insert (2) > delete (1) >
    // preimage (0) — see the object doc for why
    val pri = when(col("_change_type") === "update_preimage", 0)
      .when(col("_change_type") === "delete", 1)
      .otherwise(2)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_commit_version").desc, pri.desc)
    feed
      .withColumn("__pri", pri)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      // a key whose whole history nets to "its last act was a
      // preimage" cannot happen (a postimage always accompanies);
      // keep the guard anyway — emitting it as an upsert of STALE
      // values would corrupt the replica
      .filter(col("_change_type") =!= "update_preimage")
      .withColumn("_change_type",
        when(col("_change_type") === "delete", lit("delete"))
          .otherwise(lit("upsert")))
      .drop("__pri", "__rn", "_commit_version")
  }
}
