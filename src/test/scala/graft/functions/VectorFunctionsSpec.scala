package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DotProduct expression: interpreted + codegen paths, fold parity. */
class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot matches the higher-order fold bit-for-bit") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, 0.2), Seq(0.3, 0.7)),
      (Seq.empty[Double], Seq.empty[Double]))
      .toDF("a", "b")
    val got = df.select(
      VectorFunctions.vecDot($"a", $"b").as("fast"),
      aggregate(zip_with($"a", $"b", (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("slow"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("vec_dot registers as a SQL function") {
    VectorFunctions.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .as[Double].head()
    assert(r == 11.0)
  }

  test("vec_dot_long matches the long higher-order fold bit-for-bit") {
    // exercises the SQ8 regime: codes in [-128, 127] plus large
    // nano-quantized values where overflow-free long math matters
    val rows = (0 until 200).map { i =>
      (Seq.tabulate(16)(d => ((i * 31 + d * 17) % 255 - 128).toLong),
        Seq.tabulate(16)(d => ((i * 13 + d * 7) % 255 - 128).toLong))
    }
    val df = rows.toDF("qq", "qv")
    val diverged = df.select(
        VectorFunctions.vecDotLong($"qq", $"qv").as("fast"),
        aggregate(zip_with($"qq", $"qv", (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as("slow"))
      .filter($"fast" =!= $"slow" || $"fast".isNull)
      .collect()
    assert(diverged.isEmpty, s"${diverged.length} rows diverge")
  }

  test("vec_dot_long: mismatch/null-element yield null; nulls propagate") {
    val df = Seq(
      (Seq(Some(1L), Some(2L), Some(3L)), Seq(Some(4L), Some(5L))),
      (Seq(Some(1L), None), Seq(Some(3L), Some(4L))),
      (Seq(Some(2L), Some(3L)), Seq(Some(5L), Some(7L))))
      .toDF("a", "b")
    val rows = df.select(VectorFunctions.vecDotLong($"a", $"b").as("d"))
      .collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).isNullAt(0))
    assert(rows(2).getLong(0) == 31L)
  }

  test("nulls propagate") {
    val df = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]]))
      .toDF("a", "b")
    val r = df.select(VectorFunctions.vecDot($"a", $"b")).collect()
    assert(r.head.isNullAt(0))
  }

  test("length mismatch and null elements yield null, not a truncated dot") {
    val df = Seq(
      (Seq(Some(1.0), Some(2.0), Some(3.0)), Seq(Some(4.0), Some(5.0))),
      (Seq(Some(1.0), None), Seq(Some(3.0), Some(4.0))),
      (Seq(Some(1.0), Some(2.0)), Seq(Some(3.0), Some(4.0))))
      .toDF("a", "b")
    val rows = df.select(VectorFunctions.vecDot($"a", $"b").as("d")).collect()
    assert(rows(0).isNullAt(0)) // 3 vs 2 elements
    assert(rows(1).isNullAt(0)) // null element
    assert(rows(2).getDouble(0) == 11.0)
    // same through the interpreted path (filter forces non-codegen eval)
    val interp = df.select(VectorFunctions.vecDot($"a", $"b").as("d"))
      .filter(lit(true)).collect()
    assert(interp(0).isNullAt(0) && interp(1).isNullAt(0))
  }
}
