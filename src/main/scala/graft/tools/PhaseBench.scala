package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev tool: split a query's wall time into (a) DataFrame construction
  * (analysis), (b) optimization + initial physical planning, (c)
  * execution via the noop sink (includes AQE re-planning) — guide §1's
  * "decide where the time goes" applied to tiny-SF bench rows, where
  * driver-side planning can rival execution.
  *
  * Usage: runMain graft.tools.PhaseBench <names-csv> [reps]
  */
object PhaseBench {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fns = graft.SparkEntry.queries
    try {
      fns(names.head)(spark, sfDir).write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    try graft.queries.SessionCache.warm(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[phase] warm: ${e.getMessage}") }
    try graft.queries.LakehouseScan.dumpTables(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[phase] tables: ${e.getMessage}") }
    println(f"${"query"}%-26s ${"build"}%7s ${"plan"}%7s ${"exec"}%7s ${"total"}%7s")
    for (rep <- 1 to reps; name <- names) {
      val t0 = System.nanoTime()
      val df = fns(name)(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      def s(a: Long, b: Long) = (b - a) / 1e9
      println(f"$name%-26s ${s(t0, t1)}%7.3f ${s(t1, t2)}%7.3f ${s(t2, t3)}%7.3f ${s(t0, t3)}%7.3f")
    }
    spark.stop()
  }
}
