package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The codegen'd Bloom probe must be bit-identical to the boxed-UDF
  * probe it replaced (same BloomFilterImpl Murmur3 long hashing on
  * both build and probe sides), survive the serialize/deserialize
  * roundtrip, and actually run inside WholeStageCodegen.
  */
class BloomProbeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val keys: Seq[Long] =
    (0L until 500L) ++ Seq(Long.MaxValue, Long.MinValue, -1L, 1L << 40)

  private lazy val bf = {
    val members = keys.filter(_ % 3 == 0)
    val f = org.apache.spark.util.sketch.BloomFilter.create(
      math.max(members.size.toLong, 1L), 0.01)
    members.foreach(f.putLong)
    f
  }

  test("expression probe equals the UDF probe on every key") {
    val bytes = BloomProbe.serialize(bf)
    val df = keys.toDF("k")
    val viaExpr = df
      .withColumn("hit", BloomProbe.mightContainLong(bytes, col("k")))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val mc = udf((k: Long) => bf.mightContain(k))
    val viaUdf = df.withColumn("hit", mc(col("k")))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(viaExpr == viaUdf)
    // and no false negatives on the known members
    keys.filter(_ % 3 == 0).foreach(k => assert(viaExpr(k), s"missed $k"))
  }

  test("serialization roundtrip preserves the filter") {
    val bytes = BloomProbe.serialize(bf)
    val back = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    keys.foreach(k =>
      assert(back.mightContainLong(k) == bf.mightContainLong(k)))
  }

  test("probe runs inside WholeStageCodegen, no UDF in the plan") {
    // a local relation would be constant-folded at plan time
    // (ConvertToLocalRelation) — go through parquet like a real scan
    val pdir = java.nio.file.Files.createTempDirectory("bloomprobe_").toString
    keys.toDF("k").write.mode("overwrite").parquet(s"$pdir/keys.parquet")
    val df = spark.read.parquet(s"$pdir/keys.parquet")
      .filter(BloomProbe.mightContainLong(bf, col("k")))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    assert(!plan.contains("UDF("), plan)
    // the `*(n)` prefix is the WholeStageCodegen marker in treeString
    assert("""\*\(\d+\) Filter might_contain""".r.findFirstIn(plan).isDefined,
      s"probe filter must be inside a codegen stage:\n$plan")
    // force execution down the codegen path (Janino must compile)
    assert(df.count() > 0)
  }
}
