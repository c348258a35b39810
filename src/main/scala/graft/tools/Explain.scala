package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan (and optionally one row)
  * of any registered query — the `.explain("formatted")` audit loop.
  *
  * Usage: runMain graft.tools.Explain <queryName> [sfDir] [--rows]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1 && !args(1).startsWith("--")) args(1)
      else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    if (args.contains("--rows")) df.show(5, truncate = 60)
    spark.stop()
  }
}
