package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Delta SHALLOW CLONE (r14): a new table whose version-0 commit
  * references the source snapshot's files by absolute path — zero
  * data copied, fresh table identity, independent evolution from the
  * clone point; uuid deletion vectors re-serialized absolute; vacuum
  * on the clone can never reclaim source bytes.
  */
class DeltaCloneSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(prefix: String): String = {
    val t = Files.createTempDirectory(prefix).toString
    Files.delete(Paths.get(t))
    t
  }

  private def ids(t: String, v: Option[Long] = None): Set[Long] =
    DeltaLog.read(spark, t, v).select(col("id"))
      .collect().map(_.getLong(0)).toSet

  private def parquetCount(t: String): Int =
    DeltaExport.listParquet(Paths.get(t)).size

  test("shallow clone reads the source snapshot without copying data") {
    val src = tbl("delta_clone_src_")
    DeltaExport.create(
      (0L until 10L).map(i => (i, i % 2, s"r$i")).toDF("id", "p", "s")
        .coalesce(1), src, partitionBy = Seq("p")) // v0
    DeltaExport.append(
      Seq((20L, 0L, "x"), (21L, 1L, "y")).toDF("id", "p", "s")
        .coalesce(1), src) // v1
    DeltaExport.deleteWhere(spark, src, col("id") === 4L) // v2: uuid DV
    val clone = tbl("delta_clone_tgt_")
    DeltaExport.shallowClone(spark, src, clone)
    assert(ids(clone) == (0L until 10L).toSet - 4L + 20L + 21L)
    assert(parquetCount(clone) == 0, "shallow = zero data files copied")
    // fresh identity, carried schema/partitioning/configuration
    val stSrc = DeltaLog.stateAt(spark, src, None)
    val stClone = DeltaLog.stateAt(spark, clone, None)
    assert(stClone.tableId.isDefined && stClone.tableId != stSrc.tableId,
      "a clone is a NEW table identity")
    assert(stClone.schemaJson == stSrc.schemaJson)
    assert(stClone.partitionCols == Seq("p"))
    // the DV came through as an absolute `p` descriptor
    val dvs = stClone.active.values.flatMap(_.dv).toSeq
    assert(dvs.nonEmpty && dvs.forall(_.storageType == "p"), s"$dvs")
    // VERSION AS OF clone pins the older snapshot
    val cloneV0 = tbl("delta_clone_v0_")
    DeltaExport.shallowClone(spark, src, cloneV0, versionAsOf = Some(0L))
    assert(ids(cloneV0) == (0L until 10L).toSet)
    assert(ids(cloneV0) == ids(src, Some(0L)))
  }

  test("clone and source evolve independently after the clone point") {
    val src = tbl("delta_clone_src_")
    DeltaExport.create(
      (0L until 6L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), src)
    val clone = tbl("delta_clone_tgt_")
    DeltaExport.shallowClone(spark, src, clone)
    val srcFiles = DeltaLog.stateAt(spark, src, None).active.values
      .map(a => DeltaLog.absPath(src, a.path)).toSet
    // clone-side append + copy-on-write MERGE rewrite land LOCALLY
    DeltaExport.append(Seq((10L, "c")).toDF("id", "s").coalesce(1), clone)
    DeltaMerge.merge(spark, clone,
      Seq((2L, "patched")).toDF("id", "s"), Seq("id"),
      Some(DeltaMerge.UpdateAll), insertNotMatched = false)
    assert(ids(clone) == (0L until 6L).toSet + 10L)
    assert(DeltaLog.read(spark, clone)
      .where(col("id") === 2L).select("s").collect().head.getString(0)
      == "patched")
    assert(parquetCount(clone) >= 2,
      "the append and the merge rewrite live under the clone root")
    // the rewritten source file is untouched on disk and in the source
    assert(srcFiles.forall(f => Files.exists(Paths.get(f))))
    assert(ids(src) == (0L until 6L).toSet)
    assert(DeltaLog.read(spark, src)
      .where(col("id") === 2L).select("s").collect().head.getString(0)
      == "r2")
    // source-side append is invisible to the clone
    DeltaExport.append(Seq((99L, "s")).toDF("id", "s").coalesce(1), src)
    assert(!ids(clone).contains(99L))
  }

  test("vacuum on the clone never reclaims source bytes") {
    val src = tbl("delta_clone_src_")
    DeltaExport.create(
      (0L until 3L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), src)
    DeltaExport.append(
      (3L until 6L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), src)
    DeltaExport.deleteWhere(spark, src, col("id") === 1L)
    val clone = tbl("delta_clone_tgt_")
    DeltaExport.shallowClone(spark, src, clone)
    // nothing local → nothing reclaimable, even at zero retention
    assert(DeltaExport.vacuum(spark, clone, 0L).isEmpty)
    // compact localizes the data; the absolute references drop out of
    // the active set but vacuum still only walks the CLONE root
    DeltaExport.compact(spark, clone, 128L * 1024 * 1024)
    assert(parquetCount(clone) == 1)
    val reclaimed = DeltaExport.vacuum(spark, clone, 0L)
    assert(reclaimed.isEmpty,
      s"nothing under the clone root is tombstoned: $reclaimed")
    val stSrc = DeltaLog.stateAt(spark, src, None)
    assert(stSrc.active.values
      .forall(a => Files.exists(Paths.get(DeltaLog.absPath(src, a.path)))),
      "source files survive any clone-side vacuum")
    assert(ids(src) == (0L until 6L).toSet - 1L)
    assert(ids(clone) == (0L until 6L).toSet - 1L)
  }

  test("cloning a snapshot whose files were vacuumed refuses loudly") {
    val src = tbl("delta_clone_src_")
    DeltaExport.create(
      (0L until 4L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1), src) // v0
    DeltaExport.overwrite(
      Seq((9L, "o")).toDF("id", "s").coalesce(1), src) // v1
    DeltaExport.vacuum(spark, src, 0L) // reclaims the v0 file
    val clone = tbl("delta_clone_tgt_")
    val e = intercept[IllegalArgumentException] {
      DeltaExport.shallowClone(spark, src, clone, versionAsOf = Some(0L))
    }
    assert(e.getMessage.contains("vacuumed"), e.getMessage)
    // the current snapshot still clones fine
    DeltaExport.shallowClone(spark, src, clone)
    assert(ids(clone) == Set(9L))
  }
}
