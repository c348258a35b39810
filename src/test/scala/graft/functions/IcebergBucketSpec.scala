package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.Bridge
import org.apache.spark.sql.types.LongType
import org.apache.spark.unsafe.types.UTF8String

/** The codegen'd `iceberg_bucket` expression (r15) must be
  * bit-identical to the byte-array reference hash it replaced (the
  * Iceberg spec's Appendix-B murmur3 over 8-byte little-endian /
  * UTF-8 encodings), keep the spec's published test vectors, run
  * inside WholeStageCodegen with no ScalaUDF in the plan, and be the
  * hash the bucketed WRITE path actually stages with.
  */
class IcebergBucketSpec extends SparkSpec {
  import spark.implicits._

  private def leBytes(v: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    var x = v; var i = 0
    while (i < 8) { b(i) = (x & 0xFF).toByte; x >>>= 8; i += 1 }
    b
  }

  test("bucketLong is bit-identical to hashing the 8-byte LE encoding") {
    val vs = Seq(0L, 1L, -1L, 34L, 8_000_000_000L, Long.MaxValue,
      Long.MinValue, 10918L) ++ (0 until 500).map(i => i * 2654435761L)
    vs.foreach { v =>
      val ref = (BucketHash.murmur3(leBytes(v), 0) & Int.MaxValue) % 7
      assert(BucketHash.bucketLong(v, 7) == ref, s"v=$v")
    }
  }

  test("the spec's published hash vectors hold") {
    // Iceberg table spec Appendix B: hash(34) for int/long = 2017239379
    assert(BucketHash.murmur3(leBytes(34L), 0) == 2017239379)
    // hash("iceberg") = 1210000089
    assert(BucketHash.murmur3(
      "iceberg".getBytes(java.nio.charset.StandardCharsets.UTF_8), 0)
      == 1210000089)
    assert(BucketHash.bucketUtf8(UTF8String.fromString("iceberg"), 16)
      == (1210000089 & Int.MaxValue) % 16)
  }

  test("expression runs inside WholeStageCodegen, no UDF in the plan") {
    val pdir = java.nio.file.Files.createTempDirectory("ibucket_").toString
    (0L until 100L).map(i => (i, s"s$i")).toDF("k", "s")
      .write.mode("overwrite").parquet(s"$pdir/t.parquet")
    val df = spark.read.parquet(s"$pdir/t.parquet")
      .withColumn("bl", Bridge.column(
        IcebergBucket(Bridge.expression(col("k").cast(LongType)), 4)))
      .withColumn("bs", Bridge.column(
        IcebergBucket(Bridge.expression(col("s")), 4)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("iceberg_bucket"), plan)
    assert(!plan.contains("UDF("), plan)
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined,
      s"bucket projection must be inside a codegen stage:\n$plan")
    // Janino must compile; values must match the interpreted hash
    val got = df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
    got.foreach { case (k, s, bl, bs) =>
      assert(bl == BucketHash.bucketLong(k, 4), s"k=$k")
      assert(bs == BucketHash.bucketUtf8(UTF8String.fromString(s), 4),
        s"s=$s")
    }
  }

  test("the bucketed write path stages with this hash and no ScalaUDF") {
    import graft.sources.{IcebergExport, IcebergTable}
    val t = java.nio.file.Files
      .createTempDirectory("ibucket_w_").resolve("t").toString
    val df = (0L until 40L).map(i => (i, s"r$i")).toDF("id", "s")
      .coalesce(1)
    IcebergExport.createWithSpec(df, t, Seq(("bucket[4]", "id")))
    // every row landed in the dir its spec-hash says
    val got = IcebergTable.read(spark, t)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(got == (0L until 40L).toSet)
    val dirs = java.nio.file.Files.list(java.nio.file.Paths.get(t, "data"))
    val buckets =
      try {
        import scala.jdk.CollectionConverters._
        dirs.iterator().asScala.map(_.getFileName.toString).toSet
      } finally dirs.close()
    val expected = (0L until 40L).map(i =>
      s"id_bucket=${BucketHash.bucketLong(i, 4)}").toSet
    assert(buckets == expected, s"$buckets vs $expected")
  }
}
