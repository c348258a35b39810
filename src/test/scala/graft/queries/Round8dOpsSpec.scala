package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 fourth batch: t21 (BPE merge learning), w16 (conversion
  * latency), d20 (cluster sizes), d21 (sketch calibration), d22 (CDC
  * chunking), t22 (perplexity buckets), t23 (lang confusion), w18
  * (linear attribution), p21 (packing efficiency).
  */
class Round8dOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** See [[BpeReference]] — the independent textbook implementation
    * shared with the scalacheck property.
    */
  private def refBpe(
      counts: Map[String, Long],
      rounds: Int): Seq[(Long, String, String, Long)] =
    BpeReference.merges(counts, rounds)

  private def wordCounts(sfDir: String): Map[String, Long] =
    TextOps.cachedWords(spark, sfDir)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("t21 equals the textbook in-memory BPE fold on the corpus") {
    val got = TextOps.bpeMerges(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val want = refBpe(wordCounts(dir), TextOps.MergeRounds)
    assert(got.toSeq == want,
      s"merge tables diverge:\n got=${got.toSeq}\nwant=$want")
  }

  /** Write a fixture documents.parquet and return its dir. */
  private def docsDir(prefix: String, docs: Seq[(Long, String)]): String = {
    import spark.implicits._
    val fdir = java.nio.file.Files.createTempDirectory(prefix).toString
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("fix").as("source"), length(col("text")).cast("long").as("n_chars"))
      .coalesce(1).write.parquet(s"$fdir/documents.parquet")
    fdir
  }

  test("t21 planted: greedy non-overlap on runs, merged-symbol reuse, ties") {
    // corpus: "abab" ×3, "aaaa" ×2, "cd" ×2  (as whitespace words)
    //   round 1 pairs: (a,b)=6 [2 per abab ×3]... (b,a)=3, (a,a)=6
    //     [3 per aaaa ×2], (c,d)=2 → tie (a,a) vs (a,b) at 6 →
    //     lexicographic: (a,a) wins
    //   round 1 rewrite: aaaa → [aa, aa]  (greedy non-overlap, NOT
    //     [aa, a, a]); abab unchanged
    //   round 2: (a,b)=6 wins; abab → [ab, ab]
    //   round 3: pairs now (ab,ab)=3, (aa,aa)=2, (c,d)=2 → (ab,ab) —
    //     a merge OF a merged symbol
    // "wxyz" keeps rounds 6-8 live after the planted words fully merge
    val fdir = docsDir("t21_fix_",
      Seq(1L -> "abab abab abab aaaa aaaa cd cd wxyz"))
    val got = TextOps.bpeMerges(spark, fdir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got(0) == ((1L, "a", "a", 6L)), s"tie-break round: ${got(0)}")
    assert(got(1) == ((2L, "a", "b", 6L)), s"round 2: ${got(1)}")
    assert(got(2) == ((3L, "ab", "ab", 3L)),
      s"merged-symbol reuse round: ${got(2)}")
    // and the whole table matches the independent reference
    val want = refBpe(
      Map("abab" -> 3L, "aaaa" -> 2L, "cd" -> 2L, "wxyz" -> 1L),
      TextOps.MergeRounds)
    assert(got.toSeq == want, s"fixture table diverges: ${got.toSeq} vs $want")
  }

  // ---------------------------------------------------------------- w16

  /** Write a fixture events.parquet (µs timestamps) and return its dir. */
  private def eventsDir(rows: Seq[(Long, Long, Long, String)]): String = {
    import spark.implicits._
    val fdir = java.nio.file.Files.createTempDirectory("w16_fix_").toString
    rows.toDF("event_id", "us", "user_id", "event_type")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.parquet(s"$fdir/events.parquet")
    fdir
  }

  test("w16 equals an independent histogram fold of the w4 pairs") {
    val gaps = EventWindows.asofJoin(spark, dir).collect()
      .map(r => r.getLong(5) / 1000000L)
    val want = gaps
      .groupBy(g => java.lang.Long.toBinaryString(math.max(g, 1L)).length - 1L)
      .map { case (p, gs) =>
        (p, gs.length.toLong, gs.sum, gs.length.toDouble / gaps.length) }
      .toSeq.sortBy(_._1)
    val got = EventWindows.conversionLatency(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == want, s"histogram diverges:\n got=${got.toSeq}\nwant=$want")
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-12)
  }

  test("w16 bucket boundaries are exact at powers of two (planted)") {
    val base = 1704067200000000L
    val fdir = eventsDir(Seq(
      (1L, base, 1L, "click"),
      (10L, base + 500000L, 1L, "purchase"),        // 0.5 s → sec 0 → p0
      (11L, base + 1000000L, 1L, "purchase"),       // 1 s  → p0
      (12L, base + 2000000L, 1L, "purchase"),       // 2 s  → p1 lower edge
      (13L, base + 3000000L, 1L, "purchase"),       // 3 s  → p1
      (14L, base + 4000000L, 1L, "purchase"),       // 4 s  → p2 lower edge
      (15L, base + 1023000000L, 1L, "purchase"),    // 1023 s → p9 upper edge
      (16L, base + 1024000000L, 1L, "purchase")))   // 1024 s → p10 lower edge
    val got = EventWindows.conversionLatency(spark, fdir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      (0L, 1L, 2L, 2L, 1L),
      (1L, 2L, 4L, 2L, 5L),
      (2L, 4L, 8L, 1L, 4L),
      (9L, 512L, 1024L, 1L, 1023L),
      (10L, 1024L, 2048L, 1L, 1024L)), s"got: ${got.toSeq}")
  }

  // ---------------------------------------------------------------- d20

  test("d20 equals an independent size fold of the d9 assignment") {
    val labels = Dedup.dedupClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = labels.groupBy(_._2).map(_._2.length.toLong)
      .groupBy(identity).map { case (sz, cs) =>
        (sz, cs.size.toLong, sz * cs.size, (sz - 1) * cs.size,
          (sz * cs.size).toDouble / labels.length) }
      .toSeq.sortBy(_._1)
    val got = Dedup.clusterSizeAudit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq == want, s"audit diverges:\n got=${got.toSeq}\nwant=$want")
    // the histogram partitions the corpus, and the dedup is live (some
    // cluster bigger than 1 — otherwise the audit audits nothing)
    assert(got.map(_._3).sum == labels.length.toLong)
    assert(got.exists(_._1 > 1L), "no non-trivial cluster in the testdata")
    assert(math.abs(got.map(_._5).sum - 1.0) < 1e-12)
  }

  // ---------------------------------------------------------------- d21

  test("d21 equals an independent calibration fold; no candidate is lost") {
    val cands = Dedup.candMatches(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val sh = Dedup.cachedShingles(spark, dir)
      .select(col("doc_id"), col("sh")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).toSet }
    val want = cands.toSeq.map { case ((aId, bId), m) =>
      val (sa, sb) = (sh(aId), sh(bId))
      val inter = (sa & sb).size.toLong
      assert(inter > 0, s"candidate ($aId,$bId) shares no shingle")
      val un = sa.size + sb.size - inter
      val est = m.toDouble / Dedup.NumHashes
      val tj = inter.toDouble / un.toDouble
      ((inter * 10) / un, math.floor(math.abs(est - tj) * 1e9).toLong)
    }.groupBy(_._1).map { case (dec, es) =>
      val s = es.map(_._2).sum
      (dec, es.size.toLong, s, s.toDouble / (1e9 * es.size)) }
      .toSeq.sortBy(_._1)
    val got = Dedup.sketchCalibration(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == want,
      s"calibration diverges:\n got=${got.toSeq}\nwant=$want")
    assert(got.map(_._2).sum == cands.size.toLong,
      "the truth join dropped candidate pairs")
  }

  test("d21: 8 hashes calibrate within the binomial error envelope") {
    val rows = Dedup.sketchCalibration(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val n = rows.map(_._2).sum
    val weighted = rows.map(r => r._3 * r._2).sum / n
    info(f"weighted mean |est - J| = $weighted%.3f over $n pairs")
    // std of m/8 is sqrt(J(1-J)/8) <= 0.177; mean |err| of a binomial
    // estimate stays well under 2 std — a miscalibrated band scheme
    // (biased candidates) or a broken estimator blows past this
    assert(weighted < 0.25, f"mean abs error $weighted%.3f not calibrated")
    rows.foreach { case (dec, _, e) =>
      assert(e < 0.5, s"decile $dec mean error $e is worse than guessing")
    }
  }

  // ---------------------------------------------------------------- d22

  test("d22: CDC boundaries resynchronize after a prefix insertion") {
    // doc 2 = doc 1 with three novel words prepended. Fixed-stride
    // chunking (m5's model) shifts EVERY chunk; content-defined
    // boundaries realign at the first boundary word of the shared
    // text, so every chunk from there on dedups verbatim.
    val sharedText = (1 to 60).map(i => s"w${i % 13}").mkString(" ")
    val fdir = docsDir("d22_fix_", Seq(
      1L -> sharedText,
      2L -> s"novelx novely novelz $sharedText"))
    val rows = Dedup.cdcChunks(spark, fdir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      .sortBy(_._1)
    val Seq((_, n1, s1), (_, n2, s2)) = rows.toSeq
    // both docs share all chunks except each one's head chunk (doc 1's
    // first chunk starts at its first word; doc 2's is polluted by the
    // novel prefix) — so shared >= n - 1 on both sides, and strictly
    // positive (the realignment actually happened)
    assert(s1 >= n1 - 1 && s1 > 0, s"doc1 shares $s1 of $n1 chunks")
    assert(s2 >= n2 - 1 && s2 > 0, s"doc2 shares $s2 of $n2 chunks")
  }

  test("d22 equals an independent in-memory CDC fold on the corpus") {
    val words = TextOps.cachedWords(spark, dir)
      .select(col("doc_id"), col("pos"), col("word")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    def isBoundary(w: String): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % Dedup.CdcDivisor == 0
    }
    val chunks = words.groupBy(_._1).toSeq.flatMap { case (doc, ws) =>
      val sorted = ws.sortBy(_._2)
      var cid = 0L
      sorted.map { case (_, _, w) =>
        if (isBoundary(w)) cid += 1
        (doc, cid, w)
      }
    }.groupBy(t => (t._1, t._2)).map { case ((doc, cid), ws) =>
      (doc, cid, ws.map(_._3).mkString(" "), ws.size.toLong)
    }.toSeq
    val dfm = chunks.groupBy(_._3).map { case (c, xs) =>
      c -> xs.map(_._1).distinct.size }
    val want = chunks.groupBy(_._1).map { case (doc, cs) =>
      (doc, cs.size.toLong, cs.map(_._4).sum,
        cs.count(c => dfm(c._3) > 1).toLong) }
      .toSeq.sortBy(_._1)
    val got = Dedup.cdcChunks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == want.map(w => (w._1, w._2, w._3, w._4)),
      s"CDC fold diverges; first got=${got.headOption} want=${want.headOption}")
  }

  // ---------------------------------------------------------------- p21

  test("p21: ALL row aggregates the shards; fill math is exact; bins bound flags") {
    val rows = TrainingSet.packingEfficiency(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    val (all, shards) = rows.partition(_._1 == -1L)
    assert(all.length == 1 && shards.nonEmpty)
    // the ROLLUP total is exactly the shard sum, grain by grain
    assert(all.head._2 == shards.map(_._2).sum, "n_bins")
    assert(all.head._3 == shards.map(_._3).sum, "n_docs")
    assert(all.head._4 == shards.map(_._4).sum, "n_tokens")
    assert(all.head._7 == shards.map(_._7).sum, "n_underfull")
    assert(all.head._8 == shards.map(_._8).sum, "n_overfull")
    rows.foreach { r =>
      assert(r._5 == r._2 * TrainingSet.SeqLen, s"capacity: $r")
      assert(r._6 == r._4 * 1000000L / r._5, s"fill_ppm must be exact: $r")
      assert(r._7 + r._8 <= r._2, s"flag counts exceed bins: $r")
    }
    // docs are conserved against p4's shard stats
    val p4docs = TrainingSet.shardStats(spark, dir).collect()
      .map(_.getLong(1)).sum
    assert(all.head._3 == p4docs, "p21 and p4 disagree on the corpus")
  }

  // ---------------------------------------------------------------- t23

  test("t23 equals an independent confusion fold and row-normalizes") {
    val pred = TextOps.langId(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(r.length - 1)).toMap
    val decl = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = decl.groupBy(d => (d._2, pred(d._1)))
      .map { case (k, v) => k -> v.length.toLong }
    val got = TextOps.langConfusion(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.map(g => (g._1, g._2) -> g._3).toMap == want,
      s"matrix diverges: ${got.toSeq}")
    // each declared row sums to its total; fractions row-normalize to 1
    got.groupBy(_._1).foreach { case (lg, rs) =>
      assert(rs.map(_._3).sum == rs.head._4, s"$lg total mismatch")
      assert(math.abs(rs.map(_._5).sum - 1.0) < 1e-9)
    }
    // the matrix partitions the corpus
    assert(got.map(_._3).sum == decl.length.toLong)
  }

  // ---------------------------------------------------------------- t22

  test("t22 equals an independent per-language tercile fold of t16 scores") {
    val lang = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val ppl = TextOps.bigramLogprob(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val want = ppl.groupBy(p => lang(p._1)).toSeq.flatMap { case (lg, ds) =>
      val ranked = ds.sortBy(p => (-p._3, p._1)).zipWithIndex
      ranked.groupBy { case (_, i) => (i * 3) / ds.length }.map {
        case (b, rs) =>
          val bucket = Seq("head", "middle", "tail")(b)
          (lg, bucket, rs.length.toLong, rs.map(_._1._2).sum,
            rs.map(_._1._3).min, rs.map(_._1._3).max)
      }
    }.sortBy(t => (t._1, t._2))
    val got = TextOps.pplBuckets(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == want, s"buckets diverge:\n got=${got.toSeq}\nwant=$want")
  }

  test("t22 buckets are balanced and score-monotone per language") {
    val rows = TextOps.pplBuckets(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(4), r.getDouble(5)))
    rows.groupBy(_._1).foreach { case (lg, bs) =>
      assert(bs.length == 3, s"$lg must have all three buckets")
      val byName = bs.map(b => b._2 -> b).toMap
      val sizes = bs.map(_._3)
      assert(sizes.max - sizes.min <= 1,
        s"$lg terciles must differ by at most one doc: ${bs.toSeq}")
      // head holds the highest scores, tail the lowest
      assert(byName("head")._4 >= byName("middle")._5,
        s"$lg head/middle overlap: ${bs.toSeq}")
      assert(byName("middle")._4 >= byName("tail")._5,
        s"$lg middle/tail overlap: ${bs.toSeq}")
    }
  }

  // ---------------------------------------------------------------- w18

  test("w18 planted: equal split with remainder-to-latest, exact ppm") {
    val base = 1704067200000000L
    val fdir = eventsDir(Seq(
      (1L, base, 1L, "purchase"),
      (11L, base - 600000000L, 1L, "view"),    // -10 min
      (12L, base - 300000000L, 1L, "click"),   // -5 min
      (13L, base - 60000000L, 1L, "view"),     // -1 min: latest → +rem
      (14L, base, 1L, "view"),                 // at purchase: OUT
      (15L, base - 1800000000L, 1L, "view"),   // exactly -30 min: IN
      (2L, base + 5000000000L, 2L, "purchase"),
      (21L, base + 4000000000L, 2L, "click"),  // sole touch → 1e6
      (3L, base + 9000000000L, 3L, "purchase"))) // no touches: no credit
    // purchase 1: 4 touches → 250000 each, latest (13) gets exactly
    // 250000 (rem 0); purchase 2: sole click gets 1000000
    val got = EventWindows.linearAttribution(spark, fdir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("click", 2L, 1250000L),
      ("view", 3L, 750000L)), s"got ${got.toSeq}")
  }

  test("w18 planted: remainder goes to the LATEST touch only") {
    val base = 1704067200000000L
    val fdir = eventsDir(Seq(
      (1L, base, 1L, "purchase"),
      (11L, base - 600000000L, 1L, "view"),
      (12L, base - 300000000L, 1L, "view"),
      (13L, base - 60000000L, 1L, "click")))   // latest of 3 → 333334
    val got = EventWindows.linearAttribution(spark, fdir).collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    assert(got == Map("view" -> 666666L, "click" -> 333334L), s"got $got")
    assert(got.values.sum == 1000000L, "credit must conserve exactly")
  }

  test("w18 equals an independent fold; every credited purchase conserves 1e6") {
    val ev = graft.Tables.eventsUs(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("tus"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
    val bandUs = EventWindows.IntervalWindowSec * 1000000L
    val touches = ev.filter(e => e._3 == "view" || e._3 == "click")
      .groupBy(_._2)
    val perPurchase = ev.filter(_._3 == "purchase").flatMap {
      case (pid, u, _, pus) =>
        val ts = touches.getOrElse(u, Array.empty[(Long, Long, String, Long)])
          .filter(t => t._4 < pus && t._4 >= pus - bandUs)
        if (ts.isEmpty) None
        else {
          val n = ts.length
          val latest = ts.maxBy(t => (t._4, t._1))._1
          Some(ts.map(t => (t._3,
            1000000L / n + (if (t._1 == latest) 1000000L % n else 0L))))
        }
    }
    perPurchase.foreach(p => assert(p.map(_._2).sum == 1000000L))
    val want = perPurchase.flatten
      .groupBy(_._1).map { case (ty, cs) =>
        (ty, cs.length.toLong, cs.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val got = EventWindows.linearAttribution(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want, s"attribution diverges: got=${got.toSeq} want=$want")
  }

  // ---------------------------------------------------------------- w19

  test("w19: known dates land in the right cells; shares close") {
    // 2024-01-01 was a Monday (dow 0 under the 0=Monday convention);
    // 1704103200000000 µs = 2024-01-01 10:00 UTC
    val fdir = eventsDir(Seq(
      (1L, 1704103200000000L, 1L, "view"),      // Mon 10:00
      (2L, 1704103200000000L + 3600000000L, 1L, "view"), // Mon 11:00
      (3L, 1704463200000000L, 2L, "view")))     // Fri 2024-01-05 14:00
    val got = EventWindows.trafficProfile(spark, fdir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (0L, 10L, 1L, 165L),   // 168·1 − 3
      (0L, 11L, 1L, 165L),
      (4L, 14L, 1L, 165L)), s"got ${got.toSeq}")
  }

  test("w19 equals an independent fold; cells and shares are coherent") {
    val ev = graft.Tables.eventsUs(spark, dir).select(col("tus")).collect()
      .map(_.getLong(0))
    val want = ev.groupBy(t =>
        ((t / 86400000000L + 3) % 7, (t / 3600000000L) % 24))
      .map { case (k, v) => (k._1, k._2, v.length.toLong) }
      .toSeq.sortBy(t => (t._1, t._2))
    val got = EventWindows.trafficProfile(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    assert(got.map(g => (g._1, g._2, g._3)).toSeq == want,
      s"heatmap diverges: got=${got.take(3).toSeq}… want=${want.take(3)}…")
    assert(got.forall(g => g._1 >= 0 && g._1 <= 6 && g._2 >= 0 && g._2 <= 23))
    assert(got.map(_._3).sum == ev.length.toLong)
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-9)
  }

  test("t21 is deterministic: a re-run emits identical rows") {
    val a = TextOps.bpeMerges(spark, dir).collect().map(_.toString)
    val b = TextOps.bpeMerges(spark, dir).collect().map(_.toString)
    assert(a.toSeq == b.toSeq)
  }
}
