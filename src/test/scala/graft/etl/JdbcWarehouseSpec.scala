package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** INSERT IGNORE against a REAL SQL sink: embedded Derby (in-memory,
  * same JVM — the derby jars ship with Spark for the Hive metastore).
  * Proves the anti-join semantics the parquet model property-tests
  * actually run end-to-end through `DataFrameWriter.jdbc`: idempotent
  * replay, within-batch dedup under the tie-break order, and
  * no-duplicate-key invariant in the database itself.
  */
class JdbcWarehouseSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftwh;create=true"
  private val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  private def episodes(rows: (Long, String, String)*) =
    rows.toSeq.toDF("episode_id", "link", "title")

  private def readBack(table: String) =
    props.foldLeft(
      spark.read.format("jdbc").option("url", url).option("dbtable", table)) {
      case (r, (k, v)) => r.option(k, v)
    }.load()

  test("create-if-not-exists is idempotent and registers the schema") {
    val like = episodes((0L, "u", "t"))
    JdbcWarehouse.createTableIfNotExists(spark, url, "episodes_ddl", like, props)
    // second call: table exists -> no-op, no exception
    JdbcWarehouse.createTableIfNotExists(spark, url, "episodes_ddl", like, props)
    assert(readBack("episodes_ddl").count() == 0)
    assert(readBack("episodes_ddl").columns.toSeq ==
      Seq("episode_id", "link", "title"))
  }

  test("insertIgnore appends only fresh keys; replay is a no-op") {
    val t = "episodes_ins"
    JdbcWarehouse.createTableIfNotExists(
      spark, url, t, episodes((0L, "u", "t")), props)
    val batch1 = episodes((1L, "u1", "t1"), (2L, "u2", "t2"))
    assert(JdbcWarehouse.insertIgnore(
      spark, url, t, batch1, Seq("episode_id"), Seq("link"), props) == 2)
    // replay the identical batch: INSERT IGNORE drops every row
    assert(JdbcWarehouse.insertIgnore(
      spark, url, t, batch1, Seq("episode_id"), Seq("link"), props) == 0)
    // overlapping batch: only the new key lands
    val batch2 = episodes((2L, "u2x", "t2x"), (3L, "u3", "t3"))
    assert(JdbcWarehouse.insertIgnore(
      spark, url, t, batch2, Seq("episode_id"), Seq("link"), props) == 1)
    val rows = readBack(t).orderBy("episode_id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // key 2 kept its FIRST-arrival payload (u2, not u2x)
    assert(rows(1).getString(1) == "u2")
  }

  test("within-batch duplicates keep the first row per key under tieBreak") {
    val t = "episodes_dedup"
    JdbcWarehouse.createTableIfNotExists(
      spark, url, t, episodes((0L, "u", "t")), props)
    val batch = episodes((7L, "b_link", "later"), (7L, "a_link", "first"))
    assert(JdbcWarehouse.insertIgnore(
      spark, url, t, batch, Seq("episode_id"), Seq("link"), props) == 1)
    val row = readBack(t).collect().head
    assert(row.getString(1) == "a_link" && row.getString(2) == "first")
  }

  test("lookupJoin broadcasts the JDBC dim and prunes its columns (E7)") {
    val t = "podcast_dim"
    val dim = Seq((1L, "pod one", "desc1"), (2L, "pod two", "desc2"))
      .toDF("podcast_id", "podcast_title", "description")
    JdbcWarehouse.createTableIfNotExists(spark, url, t, dim, props)
    assert(JdbcWarehouse.insertIgnore(
      spark, url, t, dim, Seq("podcast_id"), Seq("podcast_title"), props) == 2)
    val facts = Seq((10L, 1L), (11L, 2L), (12L, 1L))
      .toDF("episode_id", "podcast_id")
    val joined = JdbcWarehouse.lookupJoin(
      spark, url, t, facts, Seq("podcast_id"), Seq("podcast_title"), props)
    // correctness: every episode picks up its podcast title
    val got = joined.collect()
      .map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(got == Map(10L -> "pod one", 11L -> "pod two", 12L -> "pod one"))
    val plan = joined.queryExecution.executedPlan.toString
    // the dim side is broadcast (fact side never shuffles)…
    assert(plan.contains("BroadcastHashJoin"), plan)
    // …and the JDBC scan reads only key + requested column, so the
    // SELECT pushed to the database is 2 columns, not SELECT *
    assert(plan.contains("podcast_title") && !plan.contains("description"),
      "JDBC scan did not prune the unrequested dim column")
  }

  test("primaryKey DDL makes the DATABASE reject what a racing writer would sneak past") {
    val t = "episodes_pk"
    val like = episodes((0L, "u", "t"))
    JdbcWarehouse.createTableIfNotExists(
      spark, url, t, like, props, primaryKey = Seq("episode_id"))
    // idempotent like the writer-based DDL
    JdbcWarehouse.createTableIfNotExists(
      spark, url, t, like, props, primaryKey = Seq("episode_id"))
    assert(JdbcWarehouse.insertIgnore(
      spark, url, t, episodes((1L, "u1", "t1")),
      Seq("episode_id"), Seq("link"), props) == 1)
    // a writer that bypasses the anti-join (the concurrent-racer case
    // insertIgnore's contract documents) hits the constraint instead
    // of silently duplicating
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      val e = intercept[java.sql.SQLException] {
        st.executeUpdate(
          s"INSERT INTO $t VALUES (1, 'u1-dup', 't1-dup')")
      }
      assert(e.getSQLState.startsWith("23"),
        s"expected integrity-constraint state, got ${e.getSQLState}")
      st.close()
    } finally conn.close()
    assert(readBack(t).count() == 1)
  }

  test("primaryKey DDL survives reserved-word and mixed-case columns, string keys") {
    val t = "episodes_quoted"
    // "order" is a reserved word in every engine; "Title" is mixed-case;
    // the key is a STRING (must come out VARCHAR, not the dialect's
    // CLOB — Derby rejects LOB primary keys)
    val like = Seq(("g1", 1L, "t"))
      .toDF("guid", "order", "Title")
    JdbcWarehouse.createTableIfNotExists(
      spark, url, t, like, props, primaryKey = Seq("guid"))
    // idempotent replay through the metadata probe
    JdbcWarehouse.createTableIfNotExists(
      spark, url, t, like, props, primaryKey = Seq("guid"))
    assert(JdbcWarehouse.insertIgnore(
      spark, url, t, like, Seq("guid"), Seq("order"), props) == 1)
    assert(JdbcWarehouse.insertIgnore(
      spark, url, t, like, Seq("guid"), Seq("order"), props) == 0)
    val row = readBack(t).collect().head
    assert(row.getString(0) == "g1" && row.getLong(1) == 1L)
  }

  test("primaryKey DDL honors explicit columnTypes overrides") {
    val t = "episodes_coltypes"
    val like = episodes((0L, "u", "t"))
    JdbcWarehouse.createTableIfNotExists(
      spark, url, t, like, props, primaryKey = Seq("episode_id"),
      columnTypes = Map("link" -> "VARCHAR(2048)"))
    // Derby reports the declared width back through the catalog
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getColumns(null, null, t.toUpperCase, null)
      val widths = Iterator.continually(rs)
        .takeWhile(_.next())
        .map(r => r.getString("COLUMN_NAME").toLowerCase -> r.getInt("COLUMN_SIZE"))
        .toMap
      rs.close()
      assert(widths("link") == 2048, widths.toString)
    } finally conn.close()
  }

  test("database-side key set stays duplicate-free across concurrent-style replays") {
    val t = "episodes_replay"
    JdbcWarehouse.createTableIfNotExists(
      spark, url, t, episodes((0L, "u", "t")), props)
    // the streaming-upsert pattern: the same micro-batch delivered
    // at-least-once; every redelivery after the first inserts nothing
    val batch = episodes((10L, "u10", "t10"), (11L, "u11", "t11"))
    val inserted = (1 to 3).map { _ =>
      JdbcWarehouse.insertIgnore(
        spark, url, t, batch, Seq("episode_id"), Seq("link"), props)
    }
    assert(inserted == Seq(2L, 0L, 0L))
    val byKey = readBack(t).groupBy(col("episode_id")).count()
      .filter(col("count") > 1).count()
    assert(byKey == 0, "duplicate keys present in the database")
  }
}
