package graft.sources.dsv2

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.{DeltaExport, DeltaLog, IcebergExport, IcebergTable}
import org.apache.spark.sql.functions._

/** The PURE-SQL entry point ([[GraftCatalog]]): registered as
  * `spark.sql.catalog.graft`, it resolves `graft.delta.`/path`` /
  * `graft.iceberg.`/path`` / `graft.auto.`/path`` to the same DSv2
  * tables the format readers build — SELECT with pushdown, SQL time
  * travel (`VERSION AS OF` / `TIMESTAMP AS OF`), INSERT INTO, and
  * loud DDL refusals.
  */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  spark.conf.set(
    "spark.sql.catalog.graft", "graft.sources.dsv2.GraftCatalog")

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def df(ids: Range) =
    ids.map(i => (i.toLong, s"v$i")).toDF("id", "s")

  test("SELECT over delta / iceberg / auto namespaces") {
    val td = tmp("cat_delta")
    val ti = tmp("cat_ice")
    DeltaExport.create(df(0 until 10).coalesce(1), td)
    DeltaExport.deleteWhere(spark, td, col("id") === 3L)
    IcebergExport.create(df(0 until 7).coalesce(1), ti)
    assert(spark.sql(s"SELECT sum(id) AS s FROM graft.delta.`$td`")
      .head().getLong(0) == 45L - 3L)
    assert(spark.sql(s"SELECT count(*) AS c FROM graft.iceberg.`$ti`")
      .head().getLong(0) == 7L)
    // auto sniffs the format
    assert(spark.sql(s"SELECT count(*) AS c FROM graft.auto.`$td`")
      .head().getLong(0) == 9L)
    assert(spark.sql(s"SELECT count(*) AS c FROM graft.auto.`$ti`")
      .head().getLong(0) == 7L)
    // a filter through SQL still prunes files (planner pushdown)
    val t4 = tmp("cat_prune")
    DeltaExport.create(
      (0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "s")
        .repartitionByRange(4, col("id")).sortWithinPartitions("id"), t4)
    assert(spark.sql(
      s"SELECT count(*) AS c FROM graft.delta.`$t4` WHERE id >= 80")
      .head().getLong(0) == 20L)
    val Some((planned, total)) = Dsv2Planning.plannedFor(t4)
    assert(total == 4 && planned == 1, s"$planned/$total")
  }

  test("SQL time travel: VERSION AS OF and TIMESTAMP AS OF") {
    val td = tmp("cat_tt")
    DeltaExport.create(df(0 until 10).coalesce(1), td, Nil,
      Map("delta.enableInCommitTimestamps" -> "true"))
    DeltaExport.deleteWhere(spark, td, col("id") < 5L)
    assert(spark.sql(
      s"SELECT count(*) AS c FROM graft.delta.`$td` VERSION AS OF 0")
      .head().getLong(0) == 10L)
    assert(spark.sql(s"SELECT count(*) AS c FROM graft.delta.`$td`")
      .head().getLong(0) == 5L)
    // TIMESTAMP AS OF through the ICT timeline
    val hist = DeltaLog.history(spark, td).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tsV0 = java.time.Instant.ofEpochMilli(hist(0L))
      .atOffset(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    assert(spark.sql(
      s"SELECT count(*) AS c FROM graft.delta.`$td` " +
        s"TIMESTAMP AS OF '$tsV0'")
      .head().getLong(0) == 10L)

    val ti = tmp("cat_tt_ice")
    IcebergExport.create(df(0 until 6).coalesce(1), ti)
    val snap0 = IcebergTable.snapshotIds(ti).head
    IcebergExport.append(df(6 until 9).coalesce(1), ti)
    assert(spark.sql(
      s"SELECT count(*) AS c FROM graft.iceberg.`$ti` VERSION AS OF $snap0")
      .head().getLong(0) == 6L)
  }

  test("SQL CREATE TABLE + CTAS author real commit-0 delta tables") {
    val t = tmp("cat_create") + "/t1"
    spark.sql(
      s"""CREATE TABLE graft.delta.`$t` (id BIGINT, grp INT, s STRING)
          PARTITIONED BY (grp)
          TBLPROPERTIES ('delta.enableInCommitTimestamps'='true')""")
    val st = DeltaLog.stateAt(spark, t, None)
    assert(st.partitionCols == Seq("grp"))
    assert(st.configuration("delta.enableInCommitTimestamps") == "true")
    assert(st.writerFeatures.contains("inCommitTimestamp"))
    assert(DeltaLog.read(spark, t).count() == 0L)
    spark.sql(s"INSERT INTO graft.delta.`$t` VALUES (1, 2, 'a'), (3, 4, 'b')")
    assert(spark.sql(s"SELECT sum(id) AS x FROM graft.delta.`$t`")
      .head().getLong(0) == 4L)
    // partition value reconstructed through the hive staging
    assert(spark.sql(
      s"SELECT id FROM graft.delta.`$t` WHERE grp = 4")
      .head().getLong(0) == 3L)

    // CTAS
    val t2 = tmp("cat_ctas") + "/t2"
    spark.sql(
      s"""CREATE TABLE graft.delta.`$t2`
          AS SELECT id * 10 AS id10, s FROM graft.delta.`$t`""")
    assert(spark.sql(s"SELECT sum(id10) AS x FROM graft.delta.`$t2`")
      .head().getLong(0) == 40L)
  }

  test("SQL CREATE TABLE + CTAS author real snapshot-less iceberg tables") {
    val t = tmp("cat_ice_create") + "/t1"
    spark.sql(
      s"""CREATE TABLE graft.iceberg.`$t` (id BIGINT, grp INT, s STRING)
          PARTITIONED BY (grp)
          TBLPROPERTIES ('write.metadata.compression-codec'='none')""")
    // legal empty state: no snapshots, current-snapshot-id -1
    assert(graft.sources.IcebergTable.read(spark, t).count() == 0L)
    assert(spark.sql(s"SELECT count(*) AS c FROM graft.iceberg.`$t`")
      .head().getLong(0) == 0L)
    spark.sql(
      s"INSERT INTO graft.iceberg.`$t` VALUES (1, 2, 'a'), (3, 4, 'b')")
    assert(spark.sql(s"SELECT sum(id) AS x FROM graft.iceberg.`$t`")
      .head().getLong(0) == 4L)
    // identity partition column reconstructs + the spec carried
    assert(spark.sql(s"SELECT id FROM graft.iceberg.`$t` WHERE grp = 4")
      .head().getLong(0) == 3L)
    assert(graft.sources.IcebergExport.currentSpecOf(t) ==
      Seq(("identity", "grp")))
    // the declared property landed in the metadata
    val meta = graft.sources.IcebergTable.read(spark, t) // sanity read
    assert(meta.columns.toSeq == Seq("id", "grp", "s"))

    // CTAS
    val t2 = tmp("cat_ice_ctas") + "/t2"
    spark.sql(
      s"""CREATE TABLE graft.iceberg.`$t2`
          AS SELECT id * 10 AS id10, s FROM graft.iceberg.`$t`""")
    assert(spark.sql(s"SELECT sum(id10) AS x FROM graft.iceberg.`$t2`")
      .head().getLong(0) == 40L)
  }

  test("INSERT INTO through the catalog; DDL refuses loudly") {
    val td = tmp("cat_insert")
    DeltaExport.create(df(0 until 3).coalesce(1), td)
    spark.sql(s"INSERT INTO graft.delta.`$td` VALUES (7, 'seven')")
    assert(DeltaLog.read(spark, td).count() == 4L)
    val e = intercept[Exception] {
      spark.sql(s"DROP TABLE graft.delta.`$td`")
    }
    def chain(x: Throwable): Seq[Throwable] =
      if (x == null) Nil else x +: chain(x.getCause)
    assert(chain(e).exists(c => Option(c.getMessage)
      .exists(_.contains("foot-gun"))), e.toString)
    assert(DeltaLog.read(spark, td).count() == 4L, "table must survive")
  }

  test("ALTER TABLE routes to the evolution writers, both formats") {
    // ---- delta: properties, ADD COLUMN, widen, SET DEFAULT --------
    val td = tmp("cat_alter_delta")
    DeltaExport.create(
      (0 until 5).map(i => (i, s"v$i")).toDF("n", "s").coalesce(1), td)
    spark.sql(
      s"ALTER TABLE graft.delta.`$td` SET TBLPROPERTIES ('graft.k'='v1')")
    assert(DeltaLog.stateAt(spark, td, None)
      .configuration.get("graft.k").contains("v1"))
    spark.sql(s"ALTER TABLE graft.delta.`$td` ADD COLUMN extra STRING")
    // pre-existing rows read NULL in the new column — the spec's rule
    assert(spark.sql(
      s"SELECT count(*) AS c FROM graft.delta.`$td` WHERE extra IS NULL")
      .head().getLong(0) == 5L)
    spark.sql(s"ALTER TABLE graft.delta.`$td` ALTER COLUMN n TYPE BIGINT")
    val widened = DeltaLog.read(spark, td)
    assert(widened.schema("n").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(widened.agg(sum(col("n"))).head().getLong(0) == 10L,
      "narrow-era files must promote at scan")
    spark.sql(
      s"ALTER TABLE graft.delta.`$td` ALTER COLUMN s SET DEFAULT 'dflt'")
    val st = DeltaLog.stateAt(spark, td, None)
    assert(st.writerFeatures.contains("allowColumnDefaults"), st.writerFeatures)
    // delta RENAME needs column mapping: loud refusal
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.delta.`$td` RENAME COLUMN s TO t")
    }
    def chain(x: Throwable): Seq[Throwable] =
      if (x == null) Nil else x +: chain(x.getCause)
    assert(chain(e).exists(c => Option(c.getMessage)
      .exists(_.contains("column mapping"))), e.toString)

    // ---- iceberg: ADD, RENAME, promote, DROP, properties ----------
    val ti = tmp("cat_alter_ice")
    IcebergExport.create(
      (0 until 5).map(i => (i, s"v$i", i * 2)).toDF("n", "s", "gone")
        .coalesce(1), ti)
    spark.sql(s"ALTER TABLE graft.iceberg.`$ti` ADD COLUMN extra STRING")
    spark.sql(s"ALTER TABLE graft.iceberg.`$ti` RENAME COLUMN s TO label")
    spark.sql(s"ALTER TABLE graft.iceberg.`$ti` ALTER COLUMN n TYPE BIGINT")
    spark.sql(s"ALTER TABLE graft.iceberg.`$ti` DROP COLUMN gone")
    spark.sql(
      s"ALTER TABLE graft.iceberg.`$ti` SET TBLPROPERTIES ('graft.k'='v2')")
    val got = spark.sql(
      s"SELECT n, label, extra FROM graft.iceberg.`$ti` ORDER BY n")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2)))
    assert(got.toSeq ==
      (0 until 5).map(i => (i.toLong, s"v$i", null)),
      got.toSeq.toString)
    assert(!spark.sql(s"SELECT * FROM graft.iceberg.`$ti`")
      .columns.contains("gone"))
  }
}
