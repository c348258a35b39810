package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-9 additions: the p17 compaction EXECUTOR (the plan was
  * oracle-checked in round 6; this drives the file-writing path
  * end-to-end and holds the physical layout to the plan).
  */
class Round9OpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("s16: recall ≥ 0.6 vs its full-ADC twin; beats raw-PQ s13 vs exact") {
    // family pattern (s13-vs-s7, s11-vs-s6): the probe-restriction loss
    // is measured against the same encode WITHOUT the IVF probe
    val full = Similarity.residualAdcTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfResidualPqTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val rFull = (full & ivf).size.toDouble / full.size
    info(f"s16 recall@k vs full residual ADC = $rFull%.2f")
    assert(rFull >= 0.6, f"s16 recall vs full ADC $rFull%.2f < 0.6")
    // the residual+L2 encode's end-to-end win: vs the EXACT s1 top-k,
    // s16 must not be worse than the raw-PQ s13 composite it upgrades
    // (measured 0.48 vs 0.30 at sf0.001)
    val exact = Similarity.bruteForceTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val raw = Similarity.ivfPqTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val rRes = (exact & ivf).size.toDouble / exact.size
    val rRaw = (exact & raw).size.toDouble / exact.size
    info(f"s16 recall@k vs exact = $rRes%.2f (raw-PQ s13 = $rRaw%.2f)")
    assert(rRes >= rRaw,
      f"residual encode lost to raw PQ vs exact: $rRes%.2f < $rRaw%.2f")
    assert(ivf.nonEmpty && full.nonEmpty && exact.nonEmpty)
  }

  test("s16: residual reconstruction is tighter than raw-PQ reconstruction") {
    // the reason residual PQ exists: with the coarse centroid absorbed,
    // the SAME M×K codebook budget quantizes a tighter distribution.
    // Mean squared reconstruction error must not be worse than s13's
    // raw-vector encode over the same corpus.
    import org.apache.spark.sql.DataFrame
    def mse(recon: DataFrame): Double = recon
      .join(Similarity.vectors(spark, dir), "vec_id")
      .select(avg(aggregate(
        zip_with(col("v"), col("recon"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x)).as("mse"))
      .head().getDouble(0)
    val resRecon = Similarity.residualReconstructions(spark, dir)
    val rawRecon = Similarity.rawPqReconstructions(spark, dir)
    val (eRes, eRaw) = (mse(resRecon), mse(rawRecon))
    info(f"reconstruction MSE: residual $eRes%.4f vs raw $eRaw%.4f")
    assert(eRes <= eRaw,
      f"residual encode reconstructs worse than raw: $eRes%.4f > $eRaw%.4f")
  }

  test("s16: every hit lies in one of its query's two probed buckets") {
    // s16's buckets are the TRAINED coarse quantizer's (residualFrame),
    // not s2's seed assignment
    val assign = Similarity.residualFrame(spark, dir)
      .select(col("vec_id"), col("centroid_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = Similarity.ivfResidualPqTopK(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getLong(1)).toSet.size <= 2,
        s"query $q drew hits from > 2 buckets")
    }
    rows.foreach { r =>
      assert(assign(r.getLong(2)) == r.getLong(1),
        s"hit ${r.getLong(2)} mislabeled bucket ${r.getLong(1)}")
    }
  }

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
