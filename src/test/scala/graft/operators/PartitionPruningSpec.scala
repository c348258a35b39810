package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Partition pruning — the scan-side behavior that matters most at
  * 100 TB (a date-partitioned warehouse table must read only the
  * partitions a filter selects, not list-and-skip every file). The
  * driver testdata ships as single parquet files, so this spec writes
  * a properly partitioned layout and asserts the plan prunes.
  */
class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  test("date-partition filter reaches PartitionFilters and prunes files") {
    val dir = java.nio.file.Files.createTempDirectory("pruning").toString
    (1 to 300)
      .map(i => (i.toLong, f"2024-01-0${i % 3 + 1}%d", i * 1.5))
      .toDF("id", "day", "v")
      .write.partitionBy("day").mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("day") === "2024-01-02")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert("PartitionFilters: \\[[^\\]]*day".r.findFirstIn(plan).isDefined,
      "day filter not in PartitionFilters:\n" +
        plan.linesIterator.filter(_.contains("PartitionFilters")).mkString)
    // the pruned scan must touch exactly one of the three partitions —
    // execute THIS DataFrame's plan (collect, not count: count builds a
    // separate QueryExecution whose metrics we wouldn't see) and read
    // the scan's runtime metrics
    assert(q.collect().length == 100)
    val partsRead = q.queryExecution.executedPlan.collectLeaves()
      .collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numPartitions").value
      }
    assert(partsRead == Seq(1L), s"partitions read: $partsRead")
  }
}
