package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 third batch: s15 (SRP-LSH top-k), t20 (BPE-style
  * pre-tokenizer counts), w14 (session transition matrix), w15
  * (rolling 7-day distinct users), p20 (grouped holdout split).
  */
class Round8cOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // ---------------------------------------------------------------- s15

  test("s15 recall@10 vs exact s1 clears the ANN family bound") {
    val exact = Similarity.bruteForceTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.srpLshTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    info(f"s15 recall@10 vs s1 = $recall%.2f")
    assert(recall >= 0.6, f"SRP-LSH recall $recall%.2f below the 0.6 bound")
  }

  test("s15 plan: band-bucket equi-joins only — no nested loop, no cartesian") {
    val p = Similarity.srpLshTopK(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"s15 has a cartesian join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"s15 regressed to a nested-loop (θ-join) candidate pass:\n$p")
  }

  test("s15 banding genuinely prunes: every query scores < 60% of the corpus") {
    // the asymptotic prune is set by the random-pair collision rate of
    // the probe neighbourhood — 4 tables × Σ C(8,≤2)/2^8 ≈ 0.46 of the
    // corpus, scale-independent; < 0.6 pins it with headroom (tighter
    // pruning = longer bands or smaller probe radius, recall knobs)
    val n = graft.Tables.embeddings(spark, dir).count()
    val perQ = Similarity.srpCandidates(spark, dir)
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_cand"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perQ.size == Similarity.NumQueries)
    perQ.foreach { case (q, c) =>
      assert(c < (n * 6) / 10,
        s"query $q scored $c of $n corpus vectors — banding isn't pruning")
      assert(c > 0, s"query $q has zero candidates — banding over-pruned")
    }
    info(s"candidates/query: ${perQ.toSeq.sortBy(_._1).map(_._2).mkString(", ")} of $n")
  }

  // ---------------------------------------------------------------- t20

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

  test("t20: contraction, digit, and punctuation branches are live (planted)") {
    val fdir = docsDir("t20_fix_", Seq(
      1L -> "it's a test",   // it | 's | _a | _test        → 4 pretokens
      2L -> "a 42 bc7",      // a | _42 | _bc | 7           → 4
      3L -> "hi!! there",    // hi | !! | _there            → 3
      4L -> "a  b"))         // a | '  ' | b (no lookahead) → 3
    val got = TextOps.pretokenCounts(spark, fdir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) == ((4L, 4L, 3L)), s"contractions: ${got(1L)}")
    assert(got(2L) == ((4L, 4L, 3L)), s"digit runs: ${got(2L)}")
    assert(got(3L) == ((3L, 3L, 2L)), s"punctuation runs: ${got(3L)}")
    assert(got(4L) == ((3L, 3L, 2L)), s"space runs: ${got(4L)}")
  }

  test("t20 on the corpus: fertility ≈ 1 on single-space word soup") {
    val rows = TextOps.pretokenCounts(spark, dir).collect()
    assert(rows.length == graft.Tables.documents(spark, dir).count())
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(3),
        s"doc ${r.getLong(0)}: word-soup text must pretokenize 1:1 " +
          s"(${r.getLong(1)} pretokens vs ${r.getLong(3)} words)")
      assert(r.getDouble(4) == 1.0)
    }
  }

  // ---------------------------------------------------------------- w14

  test("w14 transition probabilities row-normalize to 1 per from_type") {
    val rows = EventWindows.transitionMatrix(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (from, rs) =>
      val s = rs.map(_.getDouble(4)).sum
      assert(math.abs(s - 1.0) < 1e-9, s"$from probabilities sum to $s")
      // and every row shares the same from_total
      assert(rs.map(_.getLong(3)).distinct.length == 1)
    }
  }

  test("w14 equals an independent in-memory fold of the event log") {
    val events = graft.Tables.eventsUs(spark, dir)
      .select(col("user_id"), col("tus"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val gapUs = EventWindows.SessionGapSec * 1000000L
    val want = events.groupBy(_._1).values.flatMap { es =>
      es.sortBy(e => (e._2, e._3)).sliding(2).collect {
        case Array(a, b) if b._2 - a._2 <= gapUs => (a._4, b._4)
      }
    }.toSeq.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = EventWindows.transitionMatrix(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want, s"transition counts diverge: got=$got want=$want")
  }

  // ---------------------------------------------------------------- w15

  test("w15 equals an independent distinct-users-in-range fold") {
    val dayUs = 86400L * 1000000L
    val ud = graft.Tables.eventsUs(spark, dir)
      .select(col("user_id"), expr(s"tus div $dayUs").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val days = ud.map(_._2)
    val want = (days.min to days.max).map { d =>
      val wau = ud.filter(p => p._2 >= d - 6 && p._2 <= d).map(_._1).distinct.length
      val dau = ud.filter(_._2 == d).map(_._1).distinct.length
      (d, dau.toLong, wau.toLong)
    }
    val got = EventWindows.rollingDistinct(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want,
      s"rolling distinct diverges: got=${got.toSeq.take(5)}… want=${want.take(5)}…")
    // WAU ≥ DAU everywhere, and strictly greater somewhere (the window
    // is doing work beyond the day itself)
    assert(got.forall(r => r._3 >= r._2))
    assert(got.exists(r => r._3 > r._2))
  }

  // ---------------------------------------------------------------- p20

  test("p20 splits partition the corpus and never tear a source") {
    val d = graft.Tables.documents(spark, dir)
    val rows = TrainingSet.holdoutSplit(spark, dir).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("test", "train", "val"),
      "all three splits must be live")
    // Σ docs = corpus; Σ fractions = 1 exactly (same denominator)
    assert(rows.map(_.getLong(2)).sum == d.count())
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-12)
    // group integrity: Σ per-split distinct sources = global distinct
    // sources ⟺ no source appears in two splits (the operator's point)
    val globalSources = d.select(col("source")).distinct().count()
    assert(rows.map(_.getLong(1)).sum == globalSources,
      "a source appears in more than one split — the coin must key on source")
  }

  test("p20 is deterministic: a re-run emits identical rows") {
    val a = TrainingSet.holdoutSplit(spark, dir).collect().map(_.toString)
    val b = TrainingSet.holdoutSplit(spark, dir).collect().map(_.toString)
    assert(a.toSeq == b.toSeq)
  }
}
