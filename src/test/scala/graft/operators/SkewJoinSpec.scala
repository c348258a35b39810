package graft.operators

import graft.SparkSpec

/** Salted join: same result set as the plain join, any salt width. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("x13 registry query: plan partitions on (key, salt) and matches plain join") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val q = graft.queries.Extended.saltedJoinDemo(spark, dir)
    // the hot key's volume is demonstrably SPREAD: the physical join
    // keys carry the salt column, so each event_type shuffles across
    // SaltFactor partitions instead of one
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"),
      s"salted join key missing from the physical plan:\n$plan")
    // correctness: identical to the unsalted formulation
    val plain = graft.Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .join(Seq(("click", 1L), ("view", 2L), ("purchase", 3L))
        .toDF("event_type", "type_weight"), "event_type")
      .filter(col("user_id") < 50)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("cents") * col("type_weight")).as("weighted_cents"))
      .orderBy(col("user_id"))
    assert(q.collect().toSeq == plain.collect().toSeq)
  }

  test("salted join result set equals the plain join") {
    // heavily skewed big side: 90% of rows share key 1
    val big = ((1 to 900).map(i => (1L, i)) ++ (1 to 100).map(i => (2L, i)))
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "cold"), (3L, "unmatched")).toDF("k", "v")
    val plain = big.join(small, Seq("k"))
    for (salts <- Seq(1, 4, 16)) {
      val salted = SkewJoin.saltedJoin(big, small, "k", salts)
      assert(salted.count() == plain.count())
      assert(salted.except(plain).count() == 0)
      assert(plain.except(salted).count() == 0)
    }
  }
}
