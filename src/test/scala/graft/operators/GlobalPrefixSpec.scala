package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** GlobalPrefix: two-phase global index + running sum, checked against
  * the straightforward single-window formulation on synthetic data with
  * duplicate range keys and skewed values.
  */
class GlobalPrefixSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = {
    // 1000 rows, range key with heavy duplication (k = i / 10), value
    // derived from content — exercises equal-key bucketing and tiebreaks
    (0 until 1000)
      .map(i => (i.toLong, (i / 10).toLong, ((i * 37) % 101).toLong))
      .toDF("id", "k", "v")
  }

  test("gidx and prefix match the single-window reference") {
    val got = GlobalPrefix
      .withPrefix(df, col("k"), Seq(col("id")), col("v"), buckets = 8)
      .select(col("id"), col("gidx"), col("prefix"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val rows = df.orderBy(col("k"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    var acc = 0L
    rows.zipWithIndex.foreach { case ((id, v), i) =>
      acc += v
      assert(got(id) == (i + 1L, acc), s"row $id")
    }
  }

  test("works when rows are fewer than buckets") {
    val tiny = Seq((1L, 5L, 2L), (2L, 3L, 3L)).toDF("id", "k", "v")
    val got = GlobalPrefix
      .withPrefix(tiny, col("k"), Seq(col("id")), col("v"), buckets = 32)
      .orderBy(col("gidx"))
      .select(col("id"), col("gidx"), col("prefix"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((2L, 1L, 3L), (1L, 2L, 5L)))
  }

  test("no unpartitioned window in the plan") {
    val p = GlobalPrefix
      .withPrefix(df, col("k"), Seq(col("id")), col("v"))
      .queryExecution.executedPlan.toString
    val specs = "windowspecdefinition\\(([^,]+),".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(specs.nonEmpty && specs.forall(_.startsWith("__pid")), specs)
  }
}
