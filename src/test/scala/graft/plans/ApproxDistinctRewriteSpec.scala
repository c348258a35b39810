package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Optimizer-rule behavior: off by default, HLL under the flag. */
class ApproxDistinctRewriteSpec extends SparkSpec {

  private def distinctQuery = {
    val df = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    df.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
  }

  test("flag off: plan keeps the exact distinct count") {
    ApproxDistinctRewrite.registerOn(spark)
    spark.conf.set(ApproxDistinctRewrite.ConfKey, "false")
    val plan = distinctQuery.queryExecution.optimizedPlan.toString
    assert(plan.contains("count(distinct"))
    assert(!plan.contains("approx_count_distinct"))
  }

  test("flag on: count(distinct) rewrites to HLL and stays within 5%") {
    ApproxDistinctRewrite.registerOn(spark)
    spark.conf.set(ApproxDistinctRewrite.ConfKey, "false")
    val exact = distinctQuery.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    spark.conf.set(ApproxDistinctRewrite.ConfKey, "true")
    try {
      val plan = distinctQuery.queryExecution.optimizedPlan.toString
      assert(plan.contains("approx_count_distinct"))
      val approx = distinctQuery.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      exact.foreach { case (k, ex) =>
        val ap = approx(k).toDouble
        assert(math.abs(ap - ex) / ex < 0.05,
          s"group $k: exact=$ex approx=$ap")
      }
    } finally spark.conf.set(ApproxDistinctRewrite.ConfKey, "false")
  }

  test("multi-column distinct counts are left untouched") {
    ApproxDistinctRewrite.registerOn(spark)
    spark.conf.set(ApproxDistinctRewrite.ConfKey, "true")
    try {
      val df = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey"), col("l_suppkey")).as("n"))
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("count(distinct"))
    } finally spark.conf.set(ApproxDistinctRewrite.ConfKey, "false")
  }
}
