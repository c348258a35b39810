package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 additions: s13 (IVF+PQ composite — the last cell of the
  * FAISS deployment matrix IVF×{flat,SQ8,PQ} next to s3/s11) and w10
  * (top-N-per-group over event windows).
  */
class Round8OpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("w10: matches a brute-force per-group sort, ties on user_id") {
    val got = EventWindows.topPerGroup(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val ev = graft.Tables.eventsUs(spark, dir)
      .select(col("event_type"), expr("tus div 86400000000").as("day"),
        col("user_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = ev.groupBy(e => (e._1, e._2)).toSeq.flatMap { case ((et, d), rows) =>
      rows.groupBy(_._3).view.mapValues(_.length.toLong).toSeq
        .sortBy { case (u, n) => (-n, u) }.take(3).zipWithIndex
        .map { case ((u, n), i) => (et, d, u, n, i + 1L) }
    }.sortBy(t => (t._1, t._2, t._5))
    assert(got.toSeq == want, s"first diff: ${got.toSeq.diff(want).headOption}")
    assert(got.nonEmpty)
  }

  test("w10 plan: rank filter runs as WindowGroupLimit before the shuffle") {
    val plan = EventWindows.topPerGroup(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"top-3 filter must push into a group limit (partial top-k per map task):\n$plan")
    assert(plan.contains("Partial"),
      s"WindowGroupLimit must have a map-side Partial phase:\n$plan")
  }

  test("s13: recall@k vs s7's full-corpus ADC is bounded below") {
    // s13 = s7's scoring restricted to the query's IVF bucket, so s7's
    // top-k is the natural exact-within-quantization baseline (the
    // s10-vs-s9 / s11-vs-s6 pattern). Pinned at 0.6, the family bound:
    // a bucketing regression fails loudly, seed-centroid sensitivity
    // doesn't flake the suite. Exact values are the DuckDB oracle's job.
    val full = Similarity.pqTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfPqTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (full & ivf).size.toDouble / full.size
    info(f"s13 recall@k vs s7 = $recall%.2f")
    assert(recall >= 0.6, f"s13 recall@k vs s7 = $recall%.2f < 0.6")
    assert(full.nonEmpty && ivf.nonEmpty)
  }

  test("s13: every hit lies in one of its query's two probed buckets") {
    // the bounded-probe contract: candidates outside the query's
    // nprobe=2 bucket set must never be scored, and the emitted
    // centroid_id is the HIT's own s2 assignment
    val assign = Similarity.cachedIvfAssign(spark, dir)
      .select(col("vec_id"), col("centroid_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = Similarity.ivfPqTopK(spark, dir).collect()
    assert(rows.nonEmpty)
    val probed = rows.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    probed.foreach { case (q, cs) =>
      assert(cs.size <= 2, s"query $q drew hits from ${cs.size} > 2 buckets")
    }
    rows.foreach { r =>
      val (q, c, v) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(assign(v) == c, s"hit $v for query $q mislabeled bucket $c")
    }
  }

  test("s13 plan: the bucket probe is a hash equi-join, no cartesian") {
    // control-data sides (8 centroids, 5 queries) may plan as
    // BroadcastNestedLoopJoin — the house scalar-broadcast pattern
    // (PlanAuditSpec's s1/s12 policy); the corpus-sized candidate join
    // must be a broadcast HASH join on centroid_id and nothing may be
    // an unbroadcast cartesian
    val plan = Similarity.ivfPqTopK(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
