package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic checks for the round-5 operators (t13 entropy, x5 JSON
  * extraction, p9 source-mixture weights, s8 range search) beyond the
  * cross-engine oracle: each test pins the property the oracle cannot
  * express (invariants, cross-query consistency, plan shape).
  */
class Round5OpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("t13: entropy bounded by ln(n_tokens) and non-negative") {
    val rows = TextOps.entropy(spark, dir)
      .select(col("doc_id"), col("n_tokens"), col("entropy_nats"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1)
      val h = r.getDouble(2)
      // floor-quantization can dip at most 1e-9 per distinct term below 0
      assert(h >= -1e-6, s"doc ${r.getLong(0)}: negative entropy $h")
      assert(h <= math.log(n.toDouble) + 1e-6,
        s"doc ${r.getLong(0)}: entropy $h above ln($n)")
    }
  }

  test("t13: entropy at most ln(n_distinct), attained on uniform docs") {
    // H <= ln(#distinct tokens), with equality exactly when every token
    // appears equally often — the tight form of the max-entropy bound
    // (the ln(n_tokens) test above is the loose form)
    val slack = TextOps.cachedQualityScore(spark, dir)
      .select(col("doc_id"),
        round(col("type_token_ratio") * col("n_tokens")).cast("long").as("nd"))
      .join(TextOps.entropy(spark, dir).select(col("doc_id"), col("entropy_nats")), "doc_id")
      .filter(col("nd") > 1)
      .select((col("entropy_nats") - log(col("nd").cast("double"))).as("slack"))
      .collect().map(_.getDouble(0))
    assert(slack.forall(_ <= 1e-6), s"entropy above ln(n_distinct): max=${slack.max}")
    // at least one doc in the corpus has a uniform token distribution
    assert(slack.max > -1e-6, s"no doc attains the bound: max slack=${slack.max}")
  }

  test("x5: per-type counts reconcile with the raw event table") {
    val out = Extended.jsonExtract(spark, dir).collect()
    val total = graft.Tables.events(spark, dir).count()
    assert(out.map(_.getLong(1)).sum == total)
    // k is extracted from every row (props always carries $.k)
    val kNonNull = graft.Tables.events(spark, dir)
      .select(get_json_object(col("props"), "$.k").isNotNull.as("ok"))
      .filter(col("ok")).count()
    assert(kNonNull == total)
  }

  test("p9: mixture weights are a probability distribution that flattens token share") {
    val rows = TrainingSet.sourceMix(spark, dir).collect()
    val weights = rows.map(_.getDouble(3))
    assert(math.abs(weights.sum - 1.0) < 1e-9)
    assert(weights.forall(_ > 0))
    // sqrt flattening: the weight RANGE is strictly narrower than the
    // raw token-share range (that is the point of alpha-smoothing)
    val tokens = rows.map(_.getLong(2).toDouble)
    val shares = tokens.map(_ / tokens.sum)
    val shareSpread = shares.max / shares.min
    val weightSpread = weights.max / weights.min
    assert(weightSpread < shareSpread,
      s"sqrt smoothing did not flatten: $weightSpread !< $shareSpread")
  }

  test("s8: exactly the pairs at or above tau, consistent with brute-force top-k") {
    val got = Similarity.rangeSearch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    got.values.foreach(c => assert(c >= Similarity.RangeTau))
    // every brute-force top-k hit scoring >= tau must be in the range result
    Similarity.bruteForceTopK(spark, dir).collect().foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      val c = r.getDouble(2)
      if (c >= Similarity.RangeTau)
        assert(got.get(key).contains(c), s"top-k pair $key ($c) missing from range result")
    }
  }

  test("w4: every match is the true latest prior click (brute-force check)") {
    import org.apache.spark.sql.Row
    val e = graft.Tables.eventsUs(spark, dir)
      .select(col("user_id"), col("event_type"), col("event_id"), col("tus"))
      .collect()
    val clicks = e.filter(_.getString(1) == "click")
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(r => (r.getLong(3), r.getLong(2))).toList).toMap
    val purchases = e.filter(_.getString(1) == "purchase")
    val got = EventWindows.asofJoin(spark, dir).collect()
      .map(r => r.getLong(1) -> (r.getLong(3), r.getLong(4))).toMap
    var matched = 0
    purchases.foreach { p =>
      val expect = clicks.getOrElse(p.getLong(0), List.empty[(Long, Long)])
        .filter(_._1 <= p.getLong(3))
        .sortBy(c => (c._1, c._2)).lastOption
      val gotRow = got.get(p.getLong(2))
      assert(gotRow == expect.map { case (ts, id) => (id, ts) },
        s"purchase ${p.getLong(2)}: got $gotRow expected $expect")
      if (expect.nonEmpty) matched += 1
    }
    assert(matched == got.size && matched > 0)
  }

  test("w4: no (user, microsecond) click ties — the ASOF oracle's determinism precondition") {
    // DuckDB's native ASOF JOIN picks an arbitrary row among ties on the
    // ordering key; the Spark side breaks ties deterministically by
    // event_id. The oracle is only valid while the data has no ties —
    // probed at all SFs when w4 was registered; this pins it loudly.
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val ties = graft.Tables.eventsUs(spark, s"/root/testdata/$sf")
        .filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("tus"))
        .count().filter(col("count") > 1).count()
      assert(ties == 0, s"$sf has (user, us) click ties — w4's ASOF oracle is ambiguous")
    }
  }

  test("w4 plan: single window pass, no join operator at all") {
    val plan = EventWindows.asofJoin(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"),
      "as-of must be the merge-scan window formulation, not a theta-join")
    assert(plan.contains("windowspecdefinition"))
  }

  test("winnowing guarantee: a shared 6-word run yields a shared fingerprint") {
    // the planted near-dup pairs (d2 jaccard >= 0.5) share long runs;
    // every d2 pair must also be caught by d12's fingerprint overlap
    val d2Pairs = Dedup.ngramJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(d2Pairs.nonEmpty)
    // the guarantee is >= 1 shared fingerprint (the query's
    // WinnowShareMin = 8 is a detection tuning on top of it)
    val byDoc = Dedup.winnowedFingerprints(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val missed = d2Pairs.filter { case (a, b) =>
      byDoc.getOrElse(a, Set.empty[Long])
        .intersect(byDoc.getOrElse(b, Set.empty[Long])).isEmpty
    }
    assert(missed.isEmpty, s"winnowing missed planted near-dup pairs: $missed")
  }

  test("d11: density within winnowing's theoretical band") {
    // one fingerprint per window minimum => density <= 1; the 2/(w+1)
    // expectation on random text puts typical density well above 0.2
    val rows = Dedup.winnowFingerprintSummary(spark, dir)
      .filter(col("n_windows") > 0).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getDouble(3)
      assert(d > 0.0 && d <= 1.0 + 1e-9, s"doc ${r.getLong(0)} density $d")
    }
  }

  test("x8 plan: physical left-semi and left-anti join nodes") {
    val plan = Extended.semiAnti(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), "EXISTS must plan as a semi join")
    assert(plan.contains("LeftAnti"), "NOT EXISTS must plan as an anti join")
  }

  test("x7 plan: explicit pivot values -> single aggregate, no discovery job") {
    val df = Extended.pivotEvents(spark, dir)
    // with the value list given, the plan is pure aggregate shapes —
    // no collect-distinct first pass materialized as a separate job
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"))
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(!_.anyNull))
  }

  test("s8 plan: broadcast join, no ranking window") {
    val plan = Similarity.rangeSearch(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("windowspecdefinition"),
      "range search must not rank — output is threshold-bounded")
  }
}
