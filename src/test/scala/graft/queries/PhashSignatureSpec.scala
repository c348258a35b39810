package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The fused PhashSignature expression is pinned bit-equivalent to the
  * declarative explode+aggregate fold it replaced (the PqReconstruct
  * discipline), including the short/empty edge rows, and survives
  * Janino compilation inside whole-stage codegen.
  */
class PhashSignatureSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("bit-equivalence to the declarative fold on the corpus") {
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val fused = Multimodal.phashFrame(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val folded = Multimodal.phashFrameDeclarative(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused.size == folded.size && fused.nonEmpty)
    fused.foreach { case (id, s) =>
      assert(folded(id) == s, s"doc $id: fused $s != folded ${folded(id)}")
    }
  }

  test("edge rows: empty, sub-region, exact-region and cross-region content") {
    val docs = Seq(
      (1L, ""), (2L, "a"), (3L, "x" * 8), (4L, "x" * 9),
      (5L, "y" * 480), (6L, "y" * 481))
      .toDF("doc_id", "text")
    val fused = Multimodal.phashFrame(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val folded = Multimodal.phashFrameDeclarative(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused == folded, s"edge rows diverged:\n $fused\n $folded")
    // all-regions-empty rows still get the deterministic padding hash
    assert(fused(1L) == fused.getOrElse(1L, -1L))
    fused.values.foreach(s => assert(s >= 0L && s < (1L << 60)))
  }

  test("whole-stage codegen compiles around the expression") {
    // a LocalRelation input constant-folds the projection away before
    // codegen, and the UNfiltered corpus frame structurally matches
    // the session-cached phash plan when m7's tests ran first (the
    // cache manager swaps in an InMemoryTableScan — zero codegen
    // subtrees); the filter keeps this a real codegen'd scan
    val docs = graft.Tables.documents(spark, dir)
      .filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("text"))
    val plan = Multimodal.phashFrame(docs)
      .queryExecution.executedPlan
    val codegen = org.apache.spark.sql.execution.debug
      .codegenString(plan)
    assert(codegen.contains("graft.functions.Phash.signature"),
      "generated code must call the static signature entry point")
    // and SQL callers reach it by name
    graft.functions.GraftFunctions.registerAll(spark)
    val viaSql = spark.sql(
      "SELECT graft_phash_signature('48454C4C4F') AS s").head().getLong(0)
    assert(viaSql == graft.functions.Phash.signature(
      org.apache.spark.unsafe.types.UTF8String.fromString("48454C4C4F")))
  }
}
