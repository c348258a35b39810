package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD2 dimension maintenance AT THE DELTA LAYER (r12): w21's
  * versioned-history semantics (`graft.queries.EventWindows.scd2History`)
  * promoted from a query over raw events to a MERGE-style write
  * against a real Delta table — E13's JDBC join-overwrite upsert
  * re-expressed in the open lakehouse format, with the history the
  * INSERT-IGNORE warehouse deliberately lacks. Each [[merge]] batch
  * of observations folds into the dimension exactly as
  * `MERGE ... WHEN MATCHED AND changed THEN close-and-insert` would:
  * a changed state CLOSES the key's open version (`valid_to_us` set,
  * `is_current` flipped false) and opens a new one; an unchanged
  * state is a no-op (no version churn, the SCD2 contract); and the
  * whole batch lands as ONE Delta commit, so time travel
  * (`DeltaLog.read(..., versionAsOf)`) returns the dimension EXACTLY
  * as it stood before the batch — the property a row-at-a-time JDBC
  * upsert cannot offer.
  *
  * Table shape: (user_id, version, event_type, valid_from_us,
  * valid_to_us [−1 = open], is_current) — w21's columns minus
  * n_events (a merge batch sees observations, not the full event
  * stream, so an exact per-version event count is not derivable
  * incrementally; w21 remains the from-raw-events source of truth
  * for it).
  *
  * Derivation is SET-BASED, no driver loop: runs compression (w21's
  * gaps-and-islands lag) over the batch, one join against the open
  * versions, per-key windows over the RUNS frame (≤ one row per
  * change — metadata-sized next to the fact stream). The write is
  * [[DeltaExport.overwrite]] — Delta's own MERGE also rewrites every
  * file a matched row lives in; a dimension is small next to its
  * facts, and the tombstoned versions are what powers time travel.
  *
  * Monotonicity contract (checked loudly): a batch's observations for
  * a key must not predate the key's OPEN version (`valid_from_us`) —
  * SCD2 history is append-forward; back-dated facts belong in a
  * rebuild from raw events (w21), not a merge.
  */
object DeltaScd2 {

  /** Fold `updates` — observations (user_id, event_type, tus,
    * event_id) — into the SCD2 dimension at `table`, creating it on
    * first use. Returns the committed Delta version, or −1 when the
    * batch changed nothing (no commit — re-running the same batch is
    * idempotent).
    */
  def merge(spark: SparkSession, table: String, updates: DataFrame): Long =
    mergeCore(spark, table, updates, None).getOrElse(-1L)

  /** EXACTLY-ONCE streaming SCD2 maintenance — [[merge]] carrying
    * Delta's `txn` handshake, so a micro-batch redelivered after a
    * sink restart is a clean NO-OP instead of tripping the
    * monotonicity refusal (a replayed multi-run batch would otherwise
    * look back-dated against the state it itself committed). Wire it
    * as the foreachBatch sink of an observation stream:
    * `facts.writeStream.foreachBatch((b, id) =>
    *   DeltaScd2.mergeBatch(spark, dim, b, appId, id))` — the
    * streaming dimension-update path, landing in a REAL Delta table
    * with time travel per batch. Returns the committed version, None
    * for a replayed or no-change batch.
    */
  def mergeBatch(
      spark: SparkSession, table: String, updates: DataFrame,
      appId: String, batchId: Long): Option[Long] = {
    val exists = java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(table, "_delta_log"))
    if (exists &&
      DeltaLog.lastTxnVersion(spark, table, appId).exists(_ >= batchId))
      return None
    mergeCore(spark, table, updates, Some((appId, batchId)))
  }

  private def mergeCore(
      spark: SparkSession, table: String, updates: DataFrame,
      txn: Option[(String, Long)]): Option[Long] = {
    val exists = java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(table, "_delta_log"))
    val cur =
      if (exists) DeltaLog.read(spark, table)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "user_id BIGINT, version BIGINT, event_type STRING, " +
            "valid_from_us BIGINT, valid_to_us BIGINT, is_current BOOLEAN"))
    val open = cur.filter(col("is_current"))
      .select(
        col("user_id"),
        col("version").as("open_version"),
        col("event_type").as("open_state"),
        col("valid_from_us").as("open_from"))
    // loud monotonicity check: one metadata-sized count, not a scan
    // of history (updates ⋈ open is |batch keys| rows)
    val backdated = updates
      .join(open, Seq("user_id"))
      .filter(col("tus") < col("open_from"))
      .count()
    require(backdated == 0L,
      s"$backdated observation(s) predate their key's open version: " +
        "SCD2 merges are append-forward; rebuild from raw events (w21) " +
        "for back-dated history")
    // runs compression (w21's rule): consecutive equal states in the
    // batch collapse; the unique (tus, event_id) order makes it
    // deterministic
    val byKey = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    val runs = updates
      .select(col("user_id"), col("event_type"), col("tus"), col("event_id"))
      .withColumn("prev_state", lag(col("event_type"), 1).over(byKey))
      .filter(
        col("prev_state").isNull || col("prev_state") =!= col("event_type"))
      .withColumn("r", row_number().over(byKey).cast("long"))
      .select(col("user_id"), col("event_type"), col("tus"), col("r"))
    // a batch's FIRST run matching the open state is a no-change
    // observation — MERGE's "WHEN MATCHED AND changed" guard
    val changed = runs
      .join(open, Seq("user_id"), "left_outer")
      // <=> (null-safe): a NEW key has no open_state (null) and its
      // first run must survive — a plain === would null the predicate
      // and silently drop it
      .filter(!(col("r") === 1L && col("open_state") <=> col("event_type")))
    // r (the batch-run index) breaks a same-tus tie deterministically
    val byFrom = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("r"))
    val newVersions = changed
      .withColumn(
        "version",
        coalesce(col("open_version"), lit(0L)) +
          row_number().over(byFrom).cast("long"))
      .withColumn(
        "valid_to_us",
        coalesce(lead(col("tus"), 1).over(byFrom), lit(-1L)))
      .select(
        col("user_id"), col("version"), col("event_type"),
        col("tus").as("valid_from_us"), col("valid_to_us"),
        (col("valid_to_us") === lit(-1L)).as("is_current"))
    if (newVersions.isEmpty) return None
    // close the prior open version of every key that gained versions
    val firstNew = newVersions
      .groupBy(col("user_id"))
      .agg(min(col("valid_from_us")).as("first_new_from"))
    val revisedOpen = cur.filter(col("is_current"))
      .join(firstNew, Seq("user_id"))
      .select(
        col("user_id"), col("version"), col("event_type"),
        col("valid_from_us"),
        col("first_new_from").as("valid_to_us"),
        lit(false).as("is_current"))
    val untouched = cur
      .join(firstNew, Seq("user_id"), "left_anti")
      .unionByName(
        cur.filter(!col("is_current"))
          .join(firstNew, Seq("user_id"), "left_semi"))
    val next = untouched
      .unionByName(revisedOpen)
      .unionByName(newVersions)
    if (exists) DeltaExport.overwriteTxn(next, table, Nil, txn)
    else txn match {
      case None =>
        DeltaExport.create(next, table); Some(0L)
      case Some(_) =>
        // the txn watermark must ride the FIRST data commit too (a
        // replayed creation batch must no-op): commit 0 = the empty
        // table, version 1 = the batch's rows + its txn, atomically
        DeltaExport.create(cur, table)
        DeltaExport.overwriteTxn(next, table, Nil, txn)
    }
  }
}
