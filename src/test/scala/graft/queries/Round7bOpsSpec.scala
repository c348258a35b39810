package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-7b checks:
  *   - x18's deletion-neighborhood blocking must plan as pure hash
  *     equi-joins — the entire point over the naive theta-join is that
  *     no nested-loop operator appears anywhere;
  *   - the blocking is lossless on the live data (every brute-force
  *     lev-1 pair is found — the oracle re-certifies this cross-engine,
  *     the spec keeps the guarantee visible in-repo).
  */
class Round7bOpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("x18: plans with hash joins only — no nested loop, no cartesian") {
    val plan = Extended.fuzzyJoin(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("w8: one-pass funnel — a single events scan, ≤3 exchanges") {
    val plan = EventWindows.funnel(spark, dir)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    val exchanges = " Exchange".r.findAllIn(plan).size
    assert(scans == 1, s"cascade regression: $scans scans\n$plan")
    assert(exchanges <= 3, s"$exchanges exchanges\n$plan")
  }

  test("w8: live data exercises every funnel stage") {
    val stages = EventWindows.funnel(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(1L, 2L, 3L).subsetOf(stages.keySet),
      s"funnel window must discriminate stages on live data: $stages")
  }

  test("p17: every bin but the last fills to target ± one input file") {
    val plan = TrainingSet.compactionPlan(spark, dir)
    val fills = plan.groupBy(col("out_bin"))
      .agg(sum(col("file_tokens")).as("fill"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val maxFile = plan.agg(max(col("file_tokens"))).head().getLong(0)
    val target = TrainingSet.CompactionTargetTokens
    assert(fills.size >= 3, s"want multiple bins, got ${fills.size}")
    val lastBin = fills.keys.max
    fills.filter(_._1 != lastBin).foreach { case (bin, fill) =>
      assert(math.abs(fill - target) < maxFile,
        s"bin $bin fill $fill strays more than one file from $target")
    }
  }

  test("x18: deletion-neighborhood blocking finds every brute-force pair") {
    val c = graft.Tables.customer(spark, dir)
      .select(col("c_custkey"), lower(col("c_name")).as("name"))
    val a = c.filter(col("c_custkey") <= 600)
      .select(col("c_custkey").as("a_custkey"), col("name").as("a_name"))
    val b = c.select(col("c_custkey").as("b_custkey"), col("name").as("b_name"))
    val brute = a.crossJoin(b)
      .filter(
        col("a_custkey") < col("b_custkey") &&
          levenshtein(col("a_name"), col("b_name")) === 1)
      .select(col("a_custkey"), col("b_custkey"))
    val blocked = Extended.fuzzyJoin(spark, dir)
      .select(col("a_custkey"), col("b_custkey"))
    assert(brute.exceptAll(blocked).isEmpty && blocked.exceptAll(brute).isEmpty,
      "blocking must be lossless for edit distance 1")
  }
}
