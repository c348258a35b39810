package graft.operators

import graft.SparkSpec
import graft.Tables

/** Bucketed join: correct results with no shuffle exchange. */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
      .withColumnRenamed("c_custkey", "o_custkey")
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS customer_bkt")
    BucketedJoin.writeBucketed(orders, "orders_bkt", "o_custkey", 4)
    BucketedJoin.writeBucketed(customer, "customer_bkt", "o_custkey", 4)
    try {
      val joined = BucketedJoin.coLocatedJoin(
        spark, "orders_bkt", "customer_bkt", "o_custkey")
      // same result as the plain join
      val plain = orders.join(customer, "o_custkey")
      assert(joined.count() == plain.count())
      // and no exchange in the physical plan (bucket co-location)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"unexpected shuffle in:\n$plan")
    } finally {
      spark.sql("DROP TABLE orders_bkt")
      spark.sql("DROP TABLE customer_bkt")
    }
  }
}
