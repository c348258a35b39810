package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 fourth batch: t21 (BPE merge learning). */
class Round8dOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Independent in-memory BPE reference: the textbook algorithm on a
    * word-frequency dict — list-of-symbols state, greedy left-to-right
    * non-overlapping merge application, argmax on (count desc, pair
    * lexicographic asc). Shares NO code or representation with the
    * engine's delimiter-string formulation.
    */
  private def refBpe(
      counts: Map[String, Long],
      rounds: Int): Seq[(Long, String, String, Long)] = {
    var seg: Map[String, Vector[String]] =
      counts.map { case (w, _) => w -> w.map(_.toString).toVector }
    val out = Seq.newBuilder[(Long, String, String, Long)]
    for (step <- 1L to rounds.toLong) {
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      for ((w, syms) <- seg; i <- 0 until syms.length - 1)
        pc((syms(i), syms(i + 1))) =
          pc.getOrElse((syms(i), syms(i + 1)), 0L) + counts(w)
      val ((a, b), n) = pc.minBy { case ((x, y), m) => (-m, x, y) }
      out += ((step, a, b, n))
      seg = seg.map { case (w, syms) =>
        val nb = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            nb += (a + b); i += 2
          } else { nb += syms(i); i += 1 }
        }
        w -> nb.result()
      }
    }
    out.result()
  }

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

  test("t21 is deterministic: a re-run emits identical rows") {
    val a = TextOps.bpeMerges(spark, dir).collect().map(_.toString)
    val b = TextOps.bpeMerges(spark, dir).collect().map(_.toString)
    assert(a.toSeq == b.toSeq)
  }
}
