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

  test("AQE skew handling splits the hot partition of a sort-merge join") {
    // the OTHER half of the skew story: salting (x13) is the manual
    // rewrite for plans AQE can't touch; here AQE itself splits a
    // skewed SMJ partition at runtime — thresholds lowered so the
    // fixture's hot key trips them, broadcast disabled so the join
    // stays sort-merge
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> scala.util.Try(conf.get(k)).toOption).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // payloads must survive shuffle compression, or the hot
      // partition's on-disk size never crosses the threshold
      val rnd = new scala.util.Random(42)
      def pay() = Array.fill(100)((rnd.nextInt(94) + 33).toChar).mkString
      val big = ((1 to 2000).map(_ => (1L, pay()))
        ++ (1 to 100).map(_ => (2L, pay()))).toDF("k", "payload")
      val small = ((1 to 20).map(i => (1L, i)) ++ (1 to 20).map(i => (2L, i)))
        .toDF("k", "w")
      val joined = big.join(small, Seq("k"))
      // execute THIS dataframe (count() would plan its own query
      // execution and leave joined's adaptive plan unfinalized)
      val n = joined.collect().length
      assert(n == 2000 * 20 + 100 * 20)
      // the executed (adaptive-final) plan marks the split partition
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("skew"),
        s"AQE did not mark any skewed partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
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
