package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-6 hardening checks:
  *   - the d5 all-pairs guard actually trips (the only O(n²) in the repo
  *     cannot execute by accident);
  *   - the one-pass x10 rewrite is semantically identical to the
  *     EXCEPT/INTERSECT formulation it replaced;
  *   - the approx sketch tier (x11/x12) estimates within tolerance of
  *     its exact baselines (x4/x9) — the property the bench-only rows
  *     can't gate on a cross-engine oracle;
  *   - the MaxShingleDf hot-key cap FIRES on a boilerplate-heavy corpus
  *     and the dedup answers stay right without it ever joining the hot
  *     shingles (testdata max df is 25, so only this fixture proves the
  *     100 TB skew defense live).
  */
class Round6OpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  // ---------------------------------------------------------------- d5 guard

  test("d5: all-pairs guard refuses a corpus above the configured bound") {
    spark.conf.set(Dedup.MaxAllPairsVectorsKey, "100")
    try {
      val e = intercept[IllegalArgumentException] {
        Dedup.embeddingNearDup(spark, dir) // 500 vectors > 100
      }
      assert(e.getMessage.contains("ivfNearDup"),
        "guard message must route the caller to the bucketed d8 path")
    } finally spark.conf.unset(Dedup.MaxAllPairsVectorsKey)
  }

  test("d5: guard admits the baseline below the default bound") {
    // 500 vectors <= 10 000 default: plan builds; top pair sanity-holds
    val top = Dedup.embeddingNearDup(spark, dir).limit(1).collect()
    assert(top.length == 1 && top.head.getDouble(2) <= 1.0)
  }

  // ------------------------------------------------------- x10 equivalence

  test("x10: one-pass flag aggregate ≡ EXCEPT/INTERSECT two-pass") {
    val sh = Dedup.cachedShingles(spark, dir)
      .join(graft.Tables.documents(spark, dir)
        .select(col("doc_id"), col("source")), "doc_id")
    val s0 = sh.filter(col("source") === "src0").select(col("sh")).distinct()
    val s1 = sh.filter(col("source") === "src1").select(col("sh")).distinct()
    val twoPass = s0.except(s1).withColumn("kind", lit("src0_only"))
      .unionByName(s0.intersect(s1).withColumn("kind", lit("shared")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val onePass = Extended.setOps(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(onePass == twoPass)
    assert(onePass.exists(_._2 == "src0_only") && onePass.exists(_._2 == "shared"),
      "both set-op branches must be live")
  }

  // --------------------------------------------------------- approx tier

  test("x11: HLL++ distinct estimates within 10% of the exact x4 baseline") {
    val exact = Extended.distinctCounts(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = Extended.approxDistinctCounts(spark, dir).collect()
    assert(approx.length == exact.size)
    approx.foreach { r =>
      val (ep, es) = exact(r.getString(0))
      assert(math.abs(r.getLong(1) - ep) <= math.max(1L, ep / 10),
        s"${r.getString(0)}: n_parts ${r.getLong(1)} vs exact $ep")
      assert(math.abs(r.getLong(2) - es) <= math.max(1L, es / 10),
        s"${r.getString(0)}: n_supps ${r.getLong(2)} vs exact $es")
    }
  }

  test("x12: t-digest percentiles ordered and near the exact x9 baseline") {
    val exact = Extended.percentiles(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = Extended.approxPercentiles(spark, dir).collect()
    assert(approx.length == exact.size)
    approx.foreach { r =>
      val (p50, p95) = exact(r.getString(0))
      val (a50, a95) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(a50 <= a95, s"${r.getString(0)}: p50 $a50 > p95 $a95")
      // approx_percentile returns an actual data value; allow 10% of range
      assert(math.abs(a50 - p50) <= math.max(1.0, p50.abs / 10))
      assert(math.abs(a95 - p95) <= math.max(1.0, p95.abs / 10))
    }
  }

  // ------------------------------------------------ p10 bloom / p11 shuffle

  test("p10: bloom decontamination never misses what exact p6 flags") {
    val exact = TrainingSet.contamination(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = TrainingSet.bloomContamination(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // no false negatives: every exactly-contaminated doc is bloom-flagged
    // with at least as many hits (bloom membership ⊇ exact membership)
    exact.foreach { case (doc, nHit) =>
      assert(bloom.contains(doc), s"doc $doc flagged by p6 but not p10")
      assert(bloom(doc) >= nHit, s"doc $doc: bloom hits ${bloom(doc)} < exact $nHit")
    }
    // false positives bounded: at fpp 1% and threshold 0.5, a spurious
    // flag needs half a doc's shingles to false-positive — allow slack 2
    assert(bloom.size <= exact.size + 2,
      s"bloom flagged ${bloom.size} docs vs exact ${exact.size}")
  }

  test("p11: epoch shuffle is deterministic, complete, and per-epoch distinct") {
    val out = TrainingSet.epochShuffle(spark, dir)
    val a = out.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val b = TrainingSet.epochShuffle(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(a.sameElements(b), "shuffle must be bit-deterministic across runs")
    val nDocs = graft.Tables.documents(spark, dir).count()
    // every doc exactly once per epoch
    (0 to 1).foreach { ep =>
      val docs = a.filter(_._1 == ep).map(_._4)
      assert(docs.length == nDocs && docs.distinct.length == nDocs)
    }
    // positions are contiguous 1..n within each (epoch, shard)
    a.groupBy(t => (t._1, t._2)).foreach { case ((ep, sh), rows) =>
      val ps = rows.map(_._3).sorted
      assert(ps.head == 1L && ps.last == ps.length,
        s"($ep,$sh): positions not contiguous")
    }
    // the two epochs genuinely re-order (different doc sequence)
    val seq0 = a.filter(_._1 == 0).sortBy(t => (t._2, t._3)).map(_._4).toSeq
    val seq1 = a.filter(_._1 == 1).sortBy(t => (t._2, t._3)).map(_._4).toSeq
    assert(seq0 != seq1, "epochs must produce different orderings")
  }

  // ---------------------------------------------- x14 ranks / p12 sample

  test("x14: rank family invariants and live ties") {
    val rows = Extended.rankFamily(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rnk, drnk, cume, tile) =
        (r.getLong(3), r.getLong(4), r.getDouble(5), r.getLong(6))
      assert(rnk >= drnk, s"rank $rnk < dense_rank $drnk")
      assert(cume > 0.0 && cume <= 1.0)
      assert(tile >= 1L && tile <= 4L)
    }
    // priority classes repeat within a customer → rank must actually
    // diverge from dense_rank somewhere, or the test data proves nothing
    assert(rows.exists(r => r.getLong(3) != r.getLong(4)),
      "no ties in the window ordering — rank ≡ dense_rank everywhere")
  }

  test("p12: sample membership matches an independent md5 reimplementation") {
    val rates = TrainingSet.SampleRates.toMap
    def keep(docId: Long, source: String): Boolean = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"smp:$docId".getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString.take(15)
      val u = java.lang.Long.parseLong(hex, 16).toDouble / 1152921504606846976.0
      u < rates.getOrElse(source, TrainingSet.DefaultSampleRate)
    }
    val expected = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .filter { case (id, src) => keep(id, src) }.map(_._1).toSet
    val got = TrainingSet.stratifiedSample(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(got == expected,
      s"sample diverges from reimplementation: extra=${got -- expected} missing=${expected -- got}")
    assert(got.nonEmpty && got.size < 500, "sample must be a strict subset")
  }

  // ------------------------------------------------- df-cap live fixture

  /** Boilerplate-heavy corpus where the hot-shingle cap MUST fire:
    * 120 docs share a 30-word boilerplate prefix (shingle df 120 > cap
    * 100), one doc is wall-to-wall boilerplate, and one planted near-dup
    * pair shares a 40-word body with df 2. Written as parquet so the
    * registered queries run on it unmodified.
    */
  private lazy val capDir: String = {
    val boiler = (0 until 30).map(i => s"boil$i").mkString(" ")
    val shared = (0 until 40).map(i => s"shared$i").mkString(" ")
    val docs =
      (0 until 120).map { i =>
        val tail = (0 until 20).map(j => s"u${i}w$j").mkString(" ")
        (1000L + i, s"$boiler $tail")
      } ++ Seq(
        (2000L, boiler), // every shingle capped → drops out entirely
        (3000L, shared),
        (3001L, s"$shared extraword"))
    val out = java.nio.file.Files.createTempDirectory("graft_capfix").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$out/documents.parquet")
    out
  }

  test("df-cap: boilerplate shingles are dropped before any pair join") {
    val sh = Dedup.shingles(spark, capDir).cache()
    // the cap fired: no surviving shingle has df above MaxShingleDf,
    // and the interior boilerplate shingle specifically is gone
    val maxDf = sh.groupBy(col("sh")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(maxDf <= Dedup.MaxShingleDf)
    assert(sh.filter(col("sh") === "boil0 boil1 boil2").isEmpty,
      "hot boilerplate shingle must be capped out")
    // a wall-to-wall boilerplate doc has no surviving shingles at all
    assert(sh.filter(col("doc_id") === 2000L).isEmpty)
  }

  test("df-cap: planted near-dup pair survives, boilerplate creates no pairs") {
    val pairs = Dedup.ngramJaccard(spark, capDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((3000L, 3001L)),
      s"expected only the planted pair, got $pairs")
  }

  test("df-cap: dup-ngram coverage is boilerplate-blind") {
    val cov = Dedup.dupNgramCoverage(spark, capDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(!cov.contains(2000L), "all-boilerplate doc must drop out")
    // prefix-sharing docs: boilerplate capped away, tails unique → 0
    assert((0 until 120).forall(i => cov(1000L + i) == 0.0))
    // the planted pair's shared body is duplicated content (df 2)
    assert(cov(3000L) > 0.9 && cov(3001L) > 0.9)
  }

  test("df-cap: winnowing pairs apply the same fingerprint cap") {
    val pairs = Dedup.winnowPairs(spark, capDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((3000L, 3001L)),
      "planted pair must share >= WinnowShareMin fingerprints")
    assert(pairs.forall { case (a, _) => a >= 3000L },
      s"boilerplate prefix must not generate winnow pairs, got $pairs")
  }
}
