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

  test("d19: survivor copy keeps the phrase, later copies lose it (planted fixture)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon unique1 words here"),
      (2L, "intro words then alpha beta gamma delta epsilon tail2"),
      (3L, "totally different content nothing shared at all okay"))
    val fdir = java.nio.file.Files.createTempDirectory("d19_fix_").toString
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("fix").as("source"), length(col("text")).cast("long").as("n_chars"))
      .coalesce(1).write.parquet(s"$fdir/documents.parquet")
    val got = Dedup.dupSpanRemoval(spark, fdir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(5))).toMap
    // doc 1 holds every surviving occurrence → untouched
    assert(got(1L) == ((0L, "alpha beta gamma delta epsilon unique1 words here")))
    // doc 2's 5 phrase words fall to the 3 marked grams (union of
    // [3,5], [4,6], [5,7]); its unshared words survive
    assert(got(2L) == ((5L, "intro words then tail2")))
    assert(got(3L)._1 == 0L)
  }

  test("d19 removes only what d17 localizes: removed_words <= dup_words per doc") {
    // d17 marks EVERY occurrence of a duplicated gram; d19 exempts the
    // surviving occurrence — so its removals are a per-doc subset
    val spans = Dedup.dupSpans(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    val removed = Dedup.dupSpanRemoval(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2))
    assert(removed.nonEmpty)
    removed.foreach { case (d, rm) =>
      assert(rm <= spans(d), s"doc $d: removed $rm > d17 dup_words ${spans(d)}")
    }
    assert(removed.exists(_._2 > 0L), "d19 must be live on the testdata corpus")
    // and the survivor exemption must actually exempt something
    assert(removed.map(_._2).sum < spans.values.sum,
      "d19 removed exactly d17's coverage — survivor exemption inert")
  }

  test("w11: dyadic half-life weights are exact (planted decay fixture)") {
    import spark.implicits._
    val dayUs = 86400L * 1000000L
    val base = 1704067200000000L // 2024-01-01, day 19723
    // user 1: 100 cents at ref, ref-7d, ref-14d → 100 + 50 + 25 = 175
    // user 2: one event 6 days before ref → still weight 1.0 (same
    //   half-life bucket), score 100
    val rows = Seq(
      (1L, base + 14 * dayUs, 1L, "view", 1.0),
      (2L, base + 7 * dayUs, 1L, "view", 1.0),
      (3L, base, 1L, "view", 1.0),
      (4L, base + 8 * dayUs, 2L, "view", 1.0))
    val fdir = java.nio.file.Files.createTempDirectory("w11_fix_").toString
    rows.toDF("event_id", "us", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), lit("{}").as("props"))
      .coalesce(1).write.parquet(s"$fdir/events.parquet")
    val got = EventWindows.decayedEngagement(spark, fdir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val w32 = 1L << 32
    assert(got(1L) == ((3L, 100L * (w32 + w32 / 2 + w32 / 4), 175.0)), got(1L))
    assert(got(2L) == ((1L, 100L * w32, 100.0)), got(2L))
  }

  test("p18: water-fill invariants hold on the testdata") {
    val rows = TrainingSet.budgetWaterfill(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val total = rows.map(_._2).sum
    val budget = total * TrainingSet.WaterfillBudgetNum /
      TrainingSet.WaterfillBudgetDen
    val unsat = rows.filterNot(_._3)
    // allocation fits the budget; rounding slack < |unsat| (the div floor)
    val alloc = rows.map(_._4).sum
    assert(alloc <= budget, s"allocated $alloc > budget $budget")
    assert(budget - alloc < math.max(unsat.size.toLong, 1L),
      s"slack ${budget - alloc} >= |unsat| ${unsat.size} — λ not maximal")
    // saturated ⇔ alloc = cap; unsaturated share one level λ ≤ cap
    rows.foreach { case (s, cap, sat, a) =>
      if (sat) assert(a == cap, s"$s saturated but alloc $a != cap $cap")
      else assert(a < cap, s"$s unsaturated but alloc $a >= cap $cap")
    }
    assert(unsat.map(_._4).distinct.size <= 1, "unsaturated λ levels differ")
    assert(unsat.nonEmpty, "clipping must be live on the testdata")
  }

  test("p18: a giant source is clipped, the tail keeps everything (skew fixture)") {
    import spark.implicits._
    // caps 10/10/10/1000, budget 9/10 · 1030 = 927:
    // tail saturates (30), λ = 897 clips the giant
    val docs = Seq.tabulate(4) { s =>
      val words = if (s == 3) 1000 else 10
      (s.toLong, Seq.fill(words)("w").mkString(" "), s"s$s")
    }
    val fdir = java.nio.file.Files.createTempDirectory("p18_fix_").toString
    docs.toDF("doc_id", "text", "source")
      .coalesce(1).write.parquet(s"$fdir/documents.parquet")
    val got = TrainingSet.budgetWaterfill(spark, fdir).collect()
      .map(r => r.getString(0) -> (r.getBoolean(2), r.getLong(3))).toMap
    assert(got("s0") == ((true, 10L)) && got("s1") == ((true, 10L))
      && got("s2") == ((true, 10L)), got)
    assert(got("s3") == ((false, 897L)), got)
  }

  test("p19: rendezvous movement is ~1/(N+1); mod-hash moves most of the corpus") {
    val rows = TrainingSet.rendezvousShards(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every destination shard 0..8 populated, assignments in range
    assert(rows.map(_._1).sorted.toSeq ==
      (0L until TrainingSet.ShardsAfter.toLong))
    val n = rows.map(_._2).sum.toDouble
    val rdv = rows.map(_._3).sum / n
    val mod = rows.map(_._4).sum / n
    info(f"moved: rendezvous $rdv%.3f vs mod $mod%.3f of the corpus")
    // theory: 1/9 ≈ 0.11 vs 8/9 ≈ 0.89 — pinned with slack for the
    // finite corpus, wide enough apart that they can never cross
    assert(rdv < 0.25, f"rendezvous moved $rdv%.3f — not consistent-hashing")
    assert(mod > 0.7, f"mod moved only $mod%.3f — the audit lost its contrast")
  }

  test("t18: vocabulary growth is monotone, bounded by N, and actually grows") {
    val rows = TextOps.vocabGrowth(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == TextOps.VocabThresholds)
    rows.foreach { case (thr, n, v) =>
      assert(n <= thr, s"prefix $thr counted $n > $thr words")
      assert(v <= n, s"prefix $thr vocab $v > $n words seen")
    }
    val vocabs = rows.sortBy(_._1).map(_._3)
    assert(vocabs.zip(vocabs.tail).forall { case (a, b) => a <= b },
      s"vocab not monotone: ${vocabs.toSeq}")
    assert(vocabs.last > vocabs.head,
      "curve is flat from the first threshold — thresholds start too late")
    // past-the-end threshold clamps to the corpus
    val total = TextOps.cachedWords(spark, dir).count()
    assert(rows.maxBy(_._1)._2 == math.min(rows.maxBy(_._1)._1, total))
  }

  test("x19: CMS estimates bracket the exact counts — never under, <= eps*N over") {
    val rows = Extended.cmsHeavyHitters(spark, dir).collect()
    assert(rows.length == Extended.CmsTopK)
    val totalWords = graft.queries.TextOps.cachedWords(spark, dir).count()
    val bound = (Extended.CmsEps * totalWords).ceil.toLong
    rows.foreach { r =>
      val (w, exact, cms) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(cms >= exact, s"CMS underestimated '$w': $cms < $exact")
      assert(cms - exact <= bound,
        s"'$w' overestimate ${cms - exact} exceeds eps*N = $bound")
      assert(r.getLong(3) == cms - exact)
    }
    // the fixed seed makes the sketch deterministic: a second build
    // must reproduce every estimate bit-for-bit
    val again = Extended.cmsHeavyHitters(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(2)))
    assert(again.toSeq == rows.map(r => (r.getString(0), r.getLong(2))).toSeq)
  }

  test("m5: overlapped chunks tile every document with stride overlap") {
    val byteStride = Multimodal.ChunkHexStride / 2
    val byteWidth = Multimodal.ChunkHexWidth / 2
    val lens = graft.Tables.documents(spark, dir)
      .selectExpr("doc_id", "CAST(octet_length(CAST(text AS BINARY)) AS LONG) AS n")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chunks = Multimodal.overlapChunks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    assert(chunks.keySet == lens.keySet)
    chunks.foreach { case (d, cs) =>
      val sorted = cs.sortBy(_._2)
      // starts advance by the stride; first at 0; last chunk ends at len
      sorted.zipWithIndex.foreach { case ((_, i, s, e), k) =>
        assert(i == k && s == k.toLong * byteStride)
        assert(e == math.min(s + byteWidth, lens(d)), s"doc $d chunk $k")
      }
      assert(sorted.last._4 == lens(d), s"doc $d tail not covered")
      // interior boundaries are double-covered: next start < this end
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 < a._4, s"doc $d lost overlap between ${a._2} and ${b._2}")
        case _ => ()
      }
    }
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
