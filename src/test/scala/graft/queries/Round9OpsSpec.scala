package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-9 additions: the p17 compaction EXECUTOR (the plan was
  * oracle-checked in round 6; this drives the file-writing path
  * end-to-end and holds the physical layout to the plan).
  */
class Round9OpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("p17 executor: one file per bin, per-bin token sums equal the plan") {
    val out = java.nio.file.Files.createTempDirectory("p17_exec_").toString
    TrainingSet.compactionExecute(spark, dir, out)
    // plan columns: in_file, n_docs, file_tokens, out_bin
    val plan = TrainingSet.compactionPlan(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val wantSums = plan.groupBy(_._3).map { case (bin, fs) =>
      bin -> fs.map(_._2).sum
    }
    // one directory per bin, exactly one data file per directory
    val binDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("out_bin="))
    assert(binDirs.map(_.getName).toSet ==
      wantSums.keySet.map(b => s"out_bin=$b"),
      s"bin directories must equal the plan's bins")
    binDirs.foreach { d =>
      val parts = d.listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet"))
      assert(parts.length == 1,
        s"${d.getName} has ${parts.length} data files, compaction wants 1")
    }
    // no doc lost or duplicated; per-bin token mass equals the plan row
    val back = spark.read.parquet(out)
    val nDocs = TextOps.cachedQualityScore(spark, dir).count()
    assert(back.count() == nDocs)
    assert(back.select(col("doc_id")).distinct().count() == nDocs)
    val gotSums = back.groupBy(col("out_bin"))
      .agg(sum(col("n_tokens")).as("t")).collect()
      .map(r => r.get(0).toString.toLong -> r.getLong(1)).toMap
    assert(gotSums == wantSums,
      s"per-bin token sums: files $gotSums vs plan $wantSums")
  }
}
