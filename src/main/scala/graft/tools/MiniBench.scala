package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev tool: Bench.scala's exact methodology (noop sink, round-robin reps,
  * median + min) over a SUBSET of queries, for fast optimize/measure loops.
  * Does NOT touch BENCH_RESULT.json / BENCH_HISTORY.jsonl — the committed
  * artifacts stay full-suite qualifying runs only.
  *
  * Usage: runMain graft.tools.MiniBench <names-csv|all> [reps]
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same as Bench).
  */
object MiniBench {
  private def exec(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sel = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
    val showStages = args.contains("--stages")
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
    val names =
      if (sel == "all") fns.keys.toSeq.sorted
      else sel.split(",").toSeq.filter(fns.contains)
    // same warmup path as Bench
    names.headOption.foreach { n =>
      try exec(fns(n)(spark, sfDir)) catch { case _: Throwable => () }
    }
    try graft.queries.SessionCache.warm(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[mini] warm: ${e.getMessage}") }
    try graft.queries.LakehouseScan.dumpTables(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[mini] tables: ${e.getMessage}") }
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    if (showStages) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val ms = (for {s <- i.submissionTime; c <- i.completionTime}
            yield c - s).getOrElse(-1L)
          stageLog.add(f"    stage ${i.stageId}%4d ${ms}%6d ms tasks=${i.numTasks}%4d ${i.name.takeWhile(_ != '\n').take(90)}")
        }
      })
    val times = scala.collection.mutable.LinkedHashMap(
      names.map(_ -> Vector.empty[Double]): _*)
    for (rep <- 1 to reps; name <- names) {
      stageLog.clear()
      spark.sparkContext.setJobDescription(s"$name rep$rep")
      val t0 = System.nanoTime()
      try {
        exec(fns(name)(spark, sfDir))
        times(name) = times(name) :+ (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[mini] $name FAILED: $e"); e.printStackTrace()
      }
      if (showStages && rep == reps) {
        println(s"  [stages] $name rep$rep:")
        stageLog.forEach(println(_))
      }
    }
    println(f"${"query"}%-28s ${"median"}%8s ${"min"}%8s  reps")
    var tot = 0.0
    for (name <- names; ts = times(name) if ts.nonEmpty) {
      val med = graft.Bench.median(ts)
      tot += med
      println(f"$name%-28s $med%8.3f ${ts.min}%8.3f  " +
        ts.map(t => f"$t%.3f").mkString(" "))
    }
    println(f"TOTAL(median) $tot%.3f  load=${graft.Bench.loadAvg()}%.2f")
    spark.stop()
  }
}
