package graft.sources.dsv2

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.DeltaExport
import org.apache.spark.sql.functions._

/** The two DSv2 PLANNER levers beyond static pushdown (r16):
  *
  *  - `SupportsReportStatistics`: the scan reports post-pushdown
  *    size/rows from the log's own metadata (add.size, stats
  *    numRecords / manifest record_count) — Spark's join planner
  *    auto-broadcasts a selectively-pruned probe with NO hint, the
  *    decision that separates a broadcast join from a 100 TB shuffle;
  *  - `SupportsRuntimeFiltering`: dynamic partition pruning — the
  *    build side's materialized join keys re-filter the scan's file
  *    set at EXECUTION time, asserted through the planned-files
  *    counter (the last planning pass is the post-runtime one).
  */
class Dsv2PlanningSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("reported statistics auto-broadcast a small pruned scan (no hint)") {
    val fact = tmp("dsv2_stats_fact")
    val dim = tmp("dsv2_stats_dim")
    DeltaExport.create(
      (0 until 20000).map(i => (i.toLong, i % 100, s"pay_$i"))
        .toDF("id", "k", "payload").repartition(4), fact)
    DeltaExport.create(
      (0 until 100).map(i => (i, s"dim_$i")).toDF("k", "dname")
        .coalesce(1), dim)
    val f = spark.read.format("graft-delta").load(fact)
    val d = spark.read.format("graft-delta").load(dim)
    val joined = f.join(d, "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"a 100-row scan with reported stats must broadcast:\n$plan")
    assert(joined.count() == 20000L)
  }

  test("runtime filtering prunes partitions from the build side (DPP)") {
    val fact = tmp("dsv2_dpp_fact")
    val dim = tmp("dsv2_dpp_dim")
    // hive-partitioned fact: one directory per grp value
    DeltaExport.create(
      (0 until 5000).map(i => (i.toLong, i % 10, s"pay_$i"))
        .toDF("id", "grp", "payload"), fact, partitionBy = Seq("grp"))
    DeltaExport.create(
      Seq((3, "three"), (7, "seven")).toDF("grp", "gname").coalesce(1), dim)
    val f = spark.read.format("graft-delta").load(fact)
    val d = spark.read.format("graft-delta").load(dim)
      .filter(col("gname") =!= "nobody") // non-trivial dim filter (DPP wants one)
    val joined = f.join(d, "grp")
    val rows = joined.count()
    assert(rows == 1000L, s"2 of 10 groups x 500 rows, got $rows")
    val Some((planned, total)) = Dsv2Planning.plannedFor(fact)
    assert(total >= 10,
      s"expected >= 10 partition files, saw $total")
    assert(planned < total,
      s"runtime filter must prune the fact's files: last planning " +
        s"read $planned/$total")
  }
}
