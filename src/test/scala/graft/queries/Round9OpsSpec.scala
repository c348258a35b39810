package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-9 additions: the p17 compaction EXECUTOR (the plan was
  * oracle-checked in round 6; this drives the file-writing path
  * end-to-end and holds the physical layout to the plan).
  */
class Round9OpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("s16: recall ≥ 0.6 vs its full-ADC twin; beats raw-PQ s13 vs exact") {
    // family pattern (s13-vs-s7, s11-vs-s6): the probe-restriction loss
    // is measured against the same encode WITHOUT the IVF probe
    val full = Similarity.residualAdcTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfResidualPqTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val rFull = (full & ivf).size.toDouble / full.size
    info(f"s16 recall@k vs full residual ADC = $rFull%.2f")
    assert(rFull >= 0.6, f"s16 recall vs full ADC $rFull%.2f < 0.6")
    // the residual+L2 encode's end-to-end win: vs the EXACT s1 top-k,
    // s16 must not be worse than the raw-PQ s13 composite it upgrades
    // (measured 0.48 vs 0.30 at sf0.001)
    val exact = Similarity.bruteForceTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val raw = Similarity.ivfPqTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val rRes = (exact & ivf).size.toDouble / exact.size
    val rRaw = (exact & raw).size.toDouble / exact.size
    info(f"s16 recall@k vs exact = $rRes%.2f (raw-PQ s13 = $rRaw%.2f)")
    assert(rRes >= rRaw,
      f"residual encode lost to raw PQ vs exact: $rRes%.2f < $rRaw%.2f")
    assert(ivf.nonEmpty && full.nonEmpty && exact.nonEmpty)
  }

  test("s16: residual reconstruction is tighter than raw-PQ reconstruction") {
    // the reason residual PQ exists: with the coarse centroid absorbed,
    // the SAME M×K codebook budget quantizes a tighter distribution.
    // Mean squared reconstruction error must not be worse than s13's
    // raw-vector encode over the same corpus.
    import org.apache.spark.sql.DataFrame
    def mse(recon: DataFrame): Double = recon
      .join(Similarity.vectors(spark, dir), "vec_id")
      .select(avg(aggregate(
        zip_with(col("v"), col("recon"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x)).as("mse"))
      .head().getDouble(0)
    val resRecon = Similarity.residualReconstructions(spark, dir)
    val rawRecon = Similarity.rawPqReconstructions(spark, dir)
    val (eRes, eRaw) = (mse(resRecon), mse(rawRecon))
    info(f"reconstruction MSE: residual $eRes%.4f vs raw $eRaw%.4f")
    assert(eRes <= eRaw,
      f"residual encode reconstructs worse than raw: $eRes%.4f > $eRaw%.4f")
  }

  test("s16: every hit lies in one of its query's two probed buckets") {
    // s16's buckets are the TRAINED coarse quantizer's (residualFrame),
    // not s2's seed assignment
    val assign = Similarity.residualFrame(spark, dir)
      .select(col("vec_id"), col("centroid_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = Similarity.ivfResidualPqTopK(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getLong(1)).toSet.size <= 2,
        s"query $q drew hits from > 2 buckets")
    }
    rows.foreach { r =>
      assert(assign(r.getLong(2)) == r.getLong(1),
        s"hit ${r.getLong(2)} mislabeled bucket ${r.getLong(1)}")
    }
  }

  /** Write a fixture documents.parquet and return its dir. */
  private def docsDir(docs: Seq[(Long, String)]): String = {
    import spark.implicits._
    val fdir = java.nio.file.Files.createTempDirectory("s17_fix_").toString
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("fix").as("source"), length(col("text")).cast("long").as("n_chars"))
      .coalesce(1).write.parquet(s"$fdir/documents.parquet")
    fdir
  }

  /** Textbook Okapi BM25 in plain Scala — the independent reference
    * the engine's join/agg formulation is held to on the fixture.
    */
  private def refBm25(docs: Seq[(Long, String)])
      : Seq[(Long, Long, Long, Long, Long)] = {
    val words = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").toSeq }.toMap
    val n = docs.size.toLong
    val sumdl = words.values.map(_.size.toLong).sum
    val dfm = words.values.flatMap(_.distinct).groupBy(identity)
      .map { case (t, o) => t -> o.size.toLong }
    docs.map(_._1).filter(_ < Similarity.NumQueries).flatMap { q =>
      val terms = words(q).distinct.take(Similarity.Bm25QueryTerms)
      val scored = docs.map(_._1).filter(_ != q).flatMap { d =>
        val tfs = terms.flatMap { t =>
          val tf = words(d).count(_ == t).toLong
          if (tf == 0) None else Some {
            val df = dfm(t)
            val dl = words(d).size.toLong
            val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            val tfn = tf * 2.2 /
              (tf + 1.2 * (0.25 + 0.75 * ((dl * n).toDouble / sumdl.toDouble)))
            math.floor(idf * tfn * 1e9).toLong
          }
        }
        if (tfs.isEmpty) None
        else Some((d, tfs.size.toLong, tfs.sum))
      }
      scored.sortBy { case (d, _, s) => (-s, d) }
        .take(Similarity.TopK).zipWithIndex
        .map { case ((d, nt, s), i) => (q, d, nt, s, i + 1L) }
    }
  }

  test("s17: engine BM25 equals the textbook reference on a planted fixture") {
    // alpha: common (4 docs); delta: rare (2 docs) → idf(delta) higher.
    // doc 1: tf(alpha)=3, short; doc 2: tf(alpha)=1, long (penalized).
    // doc 6: no query terms of doc 0 → absent from q0's rows.
    val docs = Seq(
      0L -> "alpha beta gamma delta extra words here",
      1L -> "alpha alpha alpha",
      2L -> "alpha filler filler filler filler filler filler filler filler",
      3L -> "beta gamma",
      4L -> "delta solo",
      5L -> "alpha beta",
      6L -> "zzz yyy xxx")
    val fdir = docsDir(docs)
    val got = Similarity.bm25TopK(spark, fdir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val want = refBm25(docs)
    assert(got == want, s"engine $got\nref $want")
    val q0 = got.filter(_._1 == 0L)
    assert(!q0.exists(_._2 == 6L), "doc without query terms must not rank")
    val byDoc = q0.map(r => r._2 -> r._4).toMap
    assert(byDoc(1L) > byDoc(2L),
      "tf=3 short doc must outscore tf=1 long doc on the same term")
  }

  test("s17 invariants on the corpus: bounds, ordering, determinism") {
    val rows = Similarity.bm25TopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.length <= Similarity.TopK)
      val sorted = rs.sortBy(_._5)
      assert(sorted.map(_._4).toSeq.sliding(2).forall {
        case Seq(a, b) => a >= b; case _ => true
      }, s"q$q scores must be non-increasing in rank")
      assert(rs.forall(r => r._3 >= 1 && r._3 <= Similarity.Bm25QueryTerms))
    }
    val again = Similarity.bm25TopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.toSeq == again.toSeq, "must be bit-deterministic")
  }

  test("s18: eval report invariants and the residual-PQ ordering") {
    val rows = Similarity.retrievalEval(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(rows.length == 9 && rows.map(_._1) == rows.map(_._1).sorted)
    rows.foreach { case (v, h, t, ppm) =>
      assert(t == Similarity.NumQueries * Similarity.TopK, s"$v total $t")
      assert(h >= 0 && h <= t, s"$v hits $h")
      assert(ppm == h * 1000000L / t, s"$v ppm $ppm")
    }
    val m = rows.map(r => r._1 -> r._4).toMap
    assert(m("s16_ivf_respq_topk") >= m("s13_ivf_pq_topk"),
      s"residual encode must not lose to raw PQ: $m")
    // the s19 ordering the round-10 verdict asked for: multi-table
    // SRP above the single-table s15
    assert(m("s19_srp_multi_topk") > m("s15_srp_lsh_topk"),
      s"s19 must rank above s15 in the recall ladder: $m")
    // r11: the refine stage must beat the ADC ranking it rescores
    assert(m("s24_ivf_pq_refine") >= m("s13_ivf_pq_topk"),
      s"refine must not lose to unrefined IVF+PQ: $m")
  }

  test("m6: boundary-exact chunk→keyframe alignment through the native asof exec") {
    // 100-byte doc → m5 chunks start at 0,16,32,48,64(+tail); m3
    // frames start at 0,32,64,96. A boundary-exact chunk (start 32)
    // must align to THAT frame (>=), interior chunks to the one before.
    val fdir = docsDir(Seq(0L -> ("x" * 100)))
    val got = Multimodal.avAlign(spark, fdir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5)))
    val want = got.map { case (ci, sb, _, _) =>
      val fi = sb / Multimodal.FrameBytes
      (ci, sb, fi, sb - fi * Multimodal.FrameBytes)
    }
    assert(got.toSeq == want.toSeq, s"got ${got.toSeq}")
    assert(got.exists { case (_, sb, fi, lag) =>
      sb == 32L && fi == 1L && lag == 0L }, "boundary chunk must take its own frame")
    assert(got.exists { case (_, sb, fi, lag) =>
      sb == 16L && fi == 0L && lag == 16L }, "interior chunk must lag into frame 0")
    // and the multimodal path really runs the native operator
    val plan = Multimodal.avAlign(spark, fdir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"native exec missing:\n$plan")
  }

  /** Write a fixture events.parquet (µs timestamps) and return its dir. */
  private def eventsDir(rows: Seq[(Long, Long, Long, String)]): String = {
    import spark.implicits._
    val fdir = java.nio.file.Files.createTempDirectory("w20_fix_").toString
    rows.toDF("event_id", "us", "user_id", "event_type")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.parquet(s"$fdir/events.parquet")
    fdir
  }

  test("w20: planted sessions produce the expected path signatures") {
    val m = 60000000L // one minute in µs
    val base = 1704067200000000L
    val gap = EventWindows.SessionGapSec * 1000000L
    val fdir = eventsDir(Seq(
      // user 1, session 1: view>click>purchase (+ a 4th event that must
      // NOT extend the path signature)
      (1L, base, 1L, "view"),
      (2L, base + m, 1L, "click"),
      (3L, base + 2 * m, 1L, "purchase"),
      (4L, base + 3 * m, 1L, "error"),
      // user 1, session 2 (past the gap): view>click>purchase again
      (5L, base + gap + 10 * m, 1L, "view"),
      (6L, base + gap + 11 * m, 1L, "click"),
      (7L, base + gap + 12 * m, 1L, "purchase"),
      // user 2: a 2-event session and a 1-event session
      (8L, base, 2L, "view"),
      (9L, base + m, 2L, "click"),
      (10L, base + gap + 20 * m, 2L, "signup")))
    val got = EventWindows.topPaths(spark, fdir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("view>click>purchase", 3L, 2L),
      ("signup", 1L, 1L),
      ("view>click", 2L, 1L)), s"got $got")
  }

  test("w20 plan: the in-session rank runs as WindowGroupLimit") {
    val plan = EventWindows.topPaths(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rnk <= PathLen must push into a group limit:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-10 must be a TakeOrdered, not a global sort:\n$plan")
  }

  test("d23: a planted star's hub is most central; mass is conserved modulo truncation") {
    import spark.implicits._
    // star: hub 0 ↔ spokes 1..5; plus an isolated pair 10 ↔ 11
    val pairs = (1L to 5L).map(s => (0L, s)) :+ ((10L, 11L))
    val edges = (pairs ++ pairs.map(p => (p._2, p._1))).toDF("u", "v")
    val got = Dedup.pagerankOn(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val byDoc = got.map(r => r._1 -> r._3).toMap
    assert(got.head._1 == 0L, s"hub must rank first: $got")
    // all spokes are symmetric → identical integer PR
    assert((1L to 5L).map(byDoc).distinct.size == 1, s"spokes differ: $got")
    assert(byDoc(0L) > byDoc(1L) && byDoc(10L) == byDoc(11L))
    // the pair's members exchange their full mass — more than a spoke
    // (which shares the hub's outflow five ways)
    assert(byDoc(10L) > byDoc(1L), s"pair must beat spoke: $got")
    // integer truncation only LOSES mass: Σ pr ≤ scale, but stays close
    val total = got.map(_._3).sum
    assert(total <= Dedup.PrScale && total > Dedup.PrScale * 9 / 10,
      s"mass $total vs scale ${Dedup.PrScale}")
  }

  test("d23 invariants on the corpus: graph-node cover, positive mass, determinism") {
    val rows = Dedup.pagerankCentrality(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._2 >= 1 && r._3 > 0))
    // descending by (pr, doc) — emitted order is the total order
    assert(rows.map(r => (-r._3, r._1)) == rows.map(r => (-r._3, r._1)).sorted)
    val again = Dedup.pagerankCentrality(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == again, "must be bit-deterministic")
  }

  test("t24: rarity ranks keywords; the per-doc rank is a WindowGroupLimit") {
    // 'common' sits in every doc (idf = ln(1) = 0); 'rare' only in doc
    // 0 — it must be doc 0's top keyword despite lower tf
    val fdir = docsDir(Seq(
      0L -> "rare common common",
      1L -> "common other words here",
      2L -> "common more things again"))
    val rows = TextOps.keywords(spark, fdir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.filter(_._1 == 0L).minBy(_._2)._3 == "rare", s"got ${rows.toSeq}")
    rows.groupBy(_._1).foreach { case (d, rs) =>
      assert(rs.length <= TextOps.KeywordsPerDoc, s"doc $d has ${rs.length}")
    }
    // r18: the registered query checkpoints its output before the sort
    // (operators.SortFirst scaladoc), so the rank machinery is pinned on
    // the exposed pre-checkpoint frame (the q6 audit discipline)
    val plan = TextOps.keywordsFrame(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rnk <= 5 must push into a group limit:\n$plan")
  }

  test("p17 executor: one file per bin, per-bin token sums equal the plan") {
    val out = java.nio.file.Files.createTempDirectory("p17_exec_").toString
    TrainingSet.compactionExecute(spark, dir, out)
    // plan columns: in_file, n_docs, file_tokens, out_bin
    val plan = TrainingSet.compactionPlan(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val wantSums = plan.groupBy(_._3).map { case (bin, fs) =>
      bin -> fs.map(_._2).sum
    }
    // one directory per bin, exactly one data file per directory
    val binDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("out_bin="))
    assert(binDirs.map(_.getName).toSet ==
      wantSums.keySet.map(b => s"out_bin=$b"),
      s"bin directories must equal the plan's bins")
    binDirs.foreach { d =>
      val parts = d.listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet"))
      assert(parts.length == 1,
        s"${d.getName} has ${parts.length} data files, compaction wants 1")
    }
    // no doc lost or duplicated; per-bin token mass equals the plan row
    val back = spark.read.parquet(out)
    val nDocs = TextOps.cachedQualityScore(spark, dir).count()
    assert(back.count() == nDocs)
    assert(back.select(col("doc_id")).distinct().count() == nDocs)
    val gotSums = back.groupBy(col("out_bin"))
      .agg(sum(col("n_tokens")).as("t")).collect()
      .map(r => r.get(0).toString.toLong -> r.getLong(1)).toMap
    assert(gotSums == wantSums,
      s"per-bin token sums: files $gotSums vs plan $wantSums")
  }
}
