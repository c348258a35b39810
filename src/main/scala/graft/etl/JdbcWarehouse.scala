package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's warehouse sink is a real SQL database (pymysql
  * INSERT IGNORE / CREATE TABLE IF NOT EXISTS / point UPDATE against
  * RDS MySQL — `lambda_2.py:205-238`, `lambda_3.py:127-133`). The
  * engine models those semantics over parquet (`WarehouseWriter`), and
  * this adapter closes the modeled-vs-real gap: the SAME anti-join
  * INSERT IGNORE core (`WarehouseWriter.freshRows`) targeting an actual
  * JDBC sink via `DataFrameWriter.jdbc`.
  *
  * 100 TB posture: the existing-key read is a projection of only the
  * key columns (pushed to the database as a SELECT of those columns);
  * the anti-join build side is the incoming batch, so AQE broadcasts
  * it for typical micro-batches; the append writes only the fresh rows.
  * The database never sees a duplicate key, so this is exactly INSERT
  * IGNORE even on engines (like Derby) that lack the syntax.
  */
object JdbcWarehouse {

  private def reader(spark: SparkSession, url: String, table: String,
      props: Map[String, String]) =
    props.foldLeft(
      spark.read.format("jdbc").option("url", url).option("dbtable", table)) {
      case (r, (k, v)) => r.option(k, v)
    }

  private def writer(df: DataFrame, url: String, table: String,
      props: Map[String, String]) =
    props.foldLeft(
      df.write.format("jdbc").option("url", url).option("dbtable", table)) {
      case (w, (k, v)) => w.option(k, v)
    }

  /** Raw JDBC connection for the DDL path, honoring the SAME `props`
    * the Spark reader/writer paths pass through: `driver` triggers
    * registration, everything else (user/password/ssl options …)
    * forwards to the driver. Without this the PK DDL silently worked
    * only against unauthenticated databases.
    */
  private def rawConnection(url: String,
      props: Map[String, String]): java.sql.Connection = {
    props.get("driver").foreach(Class.forName)
    val info = new java.util.Properties()
    props.foreach { case (k, v) => if (k != "driver") info.setProperty(k, v) }
    java.sql.DriverManager.getConnection(url, info)
  }

  /** States meaning "table already exists" across the engines the
    * reference's shape touches: X0Y32 (Derby), 42S01 (MySQL/MariaDB/
    * SQL Server), 42P07 (PostgreSQL). Only consulted for the race
    * window between the metadata probe and the CREATE.
    */
  private val TableExistsStates = Set("X0Y32", "42S01", "42P07")

  /** E8 over JDBC — CREATE TABLE IF NOT EXISTS: `SaveMode.Ignore` on a
    * JDBC sink creates the table from the frame's schema when absent
    * and is a no-op when present — the reference's every-invocation DDL
    * (`lambda_2.py:148-151`). Write an empty slice to register schema
    * without data.
    *
    * With `primaryKey` non-empty the DDL is issued as raw JDBC instead
    * (Spark's JDBC writer cannot emit column constraints), so the
    * DATABASE enforces key uniqueness — see the `insertIgnore`
    * concurrency note for why that matters. Column identifiers are
    * quoted and typed via the url's `JdbcDialect` (reserved words and
    * mixed case survive; text maps to the dialect's string type, e.g.
    * Derby CLOB, not a hand-rolled VARCHAR(255)). The TABLE name stays
    * verbatim — Spark's own JDBC writer passes it through unquoted, and
    * quoting it here would flip its case-resolution rules out from
    * under every reader that names the same unquoted table.
    * `columnTypes` overrides the dialect per column (the
    * `createTableColumnTypes` analog); string PK columns default to
    * VARCHAR(255) because LOB/TEXT types cannot carry a key constraint
    * on Derby or MySQL.
    */
  def createTableIfNotExists(
      spark: SparkSession,
      url: String,
      table: String,
      like: DataFrame,
      props: Map[String, String] = Map.empty,
      primaryKey: Seq[String] = Nil,
      columnTypes: Map[String, String] = Map.empty): Unit =
    if (primaryKey.isEmpty)
      writer(like.limit(0), url, table, props).mode("ignore").save()
    else {
      val dialect = org.apache.spark.sql.jdbc.JdbcDialects.get(url)
      val cols = like.schema.fields.map { f =>
        val t = columnTypes.getOrElse(f.name,
          if (primaryKey.contains(f.name) &&
              f.dataType == org.apache.spark.sql.types.StringType)
            "VARCHAR(255)"
          else dialect.getJDBCType(f.dataType)
            .orElse(org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
              .getCommonJDBCType(f.dataType))
            .getOrElse(throw new IllegalArgumentException(
              s"no JDBC type for column ${f.name}: ${f.dataType}"))
            .databaseTypeDefinition)
        val notNull = if (primaryKey.contains(f.name)) " NOT NULL" else ""
        s"${dialect.quoteIdentifier(f.name)} $t$notNull"
      }
      val ddl = s"CREATE TABLE $table (${cols.mkString(", ")}, " +
        s"PRIMARY KEY (${primaryKey.map(dialect.quoteIdentifier).mkString(", ")}))"
      val conn = rawConnection(url, props)
      try {
        // Engine-agnostic idempotence: probe the catalog instead of
        // pattern-matching each engine's error. Unquoted names resolve
        // per the engine's folding rule, so probe both foldings plus
        // verbatim; LIKE wildcards in a table name are taken literally
        // often enough here not to matter (our tables are plain).
        val meta = conn.getMetaData
        def exists(n: String): Boolean = {
          val rs = meta.getTables(null, null, n, null)
          try rs.next() finally rs.close()
        }
        val bare = table.substring(table.lastIndexOf('.') + 1)
        val present = exists(bare) || exists(bare.toUpperCase) ||
          exists(bare.toLowerCase)
        if (!present) {
          val st = conn.createStatement()
          try st.executeUpdate(ddl)
          catch {
            // probe-to-create race: another writer won; that is the
            // "IF NOT EXISTS" outcome, not an error
            case e: java.sql.SQLException
                if TableExistsStates.contains(e.getSQLState) => ()
          } finally st.close()
        }
      } finally conn.close()
    }

  /** E7 over JDBC — dimension lookup join against a REAL SQL source
    * (`lambda_2.py:168-171` reads the podcast dimension back from RDS
    * to key incoming episodes): read the dim table via `spark.read
    * .jdbc` and broadcast-join it to the (large) fact side.
    *
    * 100 TB posture: the projection is pushed to the database (the
    * JDBC scan's SELECT lists only the requested columns — asserted in
    * the spec via the scan's output schema), the dim side is
    * explicitly `broadcast()` (a warehouse dimension is control-plane
    * sized), and the fact side never moves — no shuffle at any scale.
    * Filters on the dim land in the pushed WHERE via Catalyst's JDBC
    * pushdown.
    */
  def lookupJoin(
      spark: SparkSession,
      url: String,
      dimTable: String,
      facts: DataFrame,
      keys: Seq[String],
      dimCols: Seq[String],
      props: Map[String, String] = Map.empty): DataFrame = {
    val dim = reader(spark, url, dimTable, props).load()
      .select((keys ++ dimCols).map(org.apache.spark.sql.functions.col): _*)
    facts.join(org.apache.spark.sql.functions.broadcast(dim), keys)
  }

  /** E6 over JDBC — INSERT IGNORE (`lambda_2.py:205-238`): read the
    * current key set back from the table, anti-join the (batch-deduped)
    * incoming rows, append only the fresh ones. Returns the number of
    * appended rows (the reference logs exactly this count).
    *
    * Concurrency contract: the read-anti-join-append sequence is NOT
    * atomic, so "the database never sees a duplicate" holds only for a
    * SINGLE writer per table — exactly the reference's shape (each
    * Lambda owns its table's writes within a serialized pipeline
    * stage). Two writers racing the same new key would both pass the
    * anti-join; create the table with `primaryKey` so the DATABASE
    * enforces uniqueness and the losing racer fails loudly (a
    * constraint violation, the d5-guard discipline) instead of
    * silently duplicating what INSERT IGNORE promises to drop.
    */
  def insertIgnore(
      spark: SparkSession,
      url: String,
      table: String,
      incoming: DataFrame,
      keys: Seq[String],
      tieBreak: Seq[String],
      props: Map[String, String] = Map.empty): Long = {
    val existing = reader(spark, url, table, props).load()
      .select(keys.map(org.apache.spark.sql.functions.col): _*)
    val fresh = WarehouseWriter.freshRows(existing, incoming, keys, tieBreak)
      // the anti-join must be DECIDED before rows start appending: a
      // lazy plan evaluated during the write would race its own reads
      // of the table it is inserting into on some databases
      .localCheckpoint()
    val n = fresh.count()
    if (n > 0) writer(fresh, url, table, props).mode("append").save()
    n
  }
}
