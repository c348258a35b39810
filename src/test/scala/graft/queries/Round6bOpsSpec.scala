package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-6 second wave: specs for the four new registry rows.
  *
  *   - w5 trailing time-RANGE window vs a brute-force per-user rescan;
  *   - d13 paragraph dedup on a planted shared-section fixture (the
  *     testdata corpus has no cross-doc duplicate paragraphs, so only a
  *     fixture proves the duplicated branch live);
  *   - t14 PII redaction on a planted-PII fixture through the REGISTERED
  *     query (the word-soup testdata has zero PII by construction);
  *   - p13 z-order layout vs an independent bit-interleave
  *     reimplementation, plus the both-dims-tight locality claim.
  */
class Round6bOpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  // ------------------------------------------------------------------- w5

  test("w5: trailing RANGE frame matches a brute-force per-user rescan") {
    val got = EventWindows.timeRangeWindow(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    val ev = graft.Tables.eventsUs(spark, dir)
      .select(col("event_id"), col("user_id"), col("tus"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byUser = ev.groupBy(_._2)
    val lo = EventWindows.TrailSec * 1000000L
    ev.foreach { case (id, u, t, _) =>
      val peers = byUser(u).filter(e => e._3 >= t - lo && e._3 <= t)
      val (n, s) = (peers.length.toLong, peers.map(_._4).sum)
      assert(got(id) == ((n, s)), s"event $id: got ${got(id)}, want ($n,$s)")
    }
  }

  // ------------------------------------------------------------------ d13

  /** Three-paragraph docs (10 words each): docs 0 and 1 share their
    * middle paragraph verbatim, doc 2 is fully unique, doc 3 repeats
    * its own paragraph twice WITHIN the doc (must NOT count — the
    * removal rule is cross-document).
    */
  private lazy val paraDir: String = {
    def para(tag: String) = (0 until 10).map(i => s"$tag$i").mkString(" ")
    val shared = para("dup")
    val docs = Seq(
      (0L, s"${para("a")} $shared ${para("b")}"),
      (1L, s"${para("c")} $shared ${para("d")}"),
      (2L, s"${para("e")} ${para("f")} ${para("g")}"),
      (3L, s"${para("h")} ${para("h")} ${para("i")}"))
    val out = java.nio.file.Files.createTempDirectory("graft_parafix").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$out/documents.parquet")
    out
  }

  test("d13: cross-doc duplicated paragraphs flagged, within-doc repeats not") {
    val rows = Dedup.paragraphDedup(spark, paraDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows(0L) == ((3L, 1L)) && rows(1L) == ((3L, 1L)),
      "docs sharing one paragraph must each report exactly one duplicate")
    assert(rows(2L) == ((3L, 0L)), "fully unique doc must report zero")
    assert(rows(3L) == ((3L, 0L)),
      "within-doc paragraph repeat must NOT count as cross-doc duplication")
  }

  test("d13: paragraph count is ceil(n_tokens / 10) on testdata") {
    val toks = TextOps.cachedQualityScore(spark, dir)
      .select(col("doc_id"), col("n_tokens")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    Dedup.paragraphDedup(spark, dir).collect().foreach { r =>
      val want = (toks(r.getLong(0)) + TextOps.SentenceWords - 1) /
        TextOps.SentenceWords
      assert(r.getLong(1) == want)
    }
  }

  // ------------------------------------------------------------------ t14

  private lazy val piiDir: String = {
    val docs = Seq(
      (0L, "contact Jane.Doe+spam@example.co.uk or call 555-867-5309 now"),
      (1L, "server at 10.0.255.3 and 192.168.1.1 next to 1234.5.6.7 tail"),
      (2L, "plain text with no sensitive content at all"),
      (3L, "two mails a@b.io c@d.org one phone 123.456.7890 ip 8.8.8.8"))
    val out = java.nio.file.Files.createTempDirectory("graft_piifix").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$out/documents.parquet")
    out
  }

  // Cross-engine note: this exact fixture was also run through the t14
  // oracle SQL in DuckDB (RE2) during round 6 — counts and redacted
  // strings matched Spark's java.util.regex output row for row, so the
  // "regex subset agrees across engines" claim is validated on live
  // matches, not just on the zero-match testdata.
  test("t14: planted PII is counted and redacted by the registered query") {
    val rows = TextOps.piiRedaction(spark, piiDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)), r.getString(4))).toMap
    assert(rows(0L)._1 == ((1L, 1L, 0L)))
    assert(rows(0L)._2 == "contact <EMAIL> or call <PHONE> now")
    // 1234.5.6.7: the leading \b\d{1,3} can't match inside "1234" from
    // its start, and any later start is mid-number — not an IP
    assert(rows(1L)._1 == ((0L, 0L, 2L)))
    assert(rows(1L)._2 == "server at <IP> and <IP> next to 1234.5.6.7 tail")
    assert(rows(2L)._1 == ((0L, 0L, 0L)))
    assert(rows(2L)._2 == "plain text with no sensitive content at all")
    assert(rows(3L)._1 == ((2L, 1L, 1L)))
    assert(rows(3L)._2 == "two mails <EMAIL> <EMAIL> one phone <PHONE> ip <IP>")
  }

  test("t14: word-soup testdata carries zero PII and redaction is identity") {
    val rows = TextOps.piiRedaction(spark, dir).collect()
    assert(rows.forall(r => r.getLong(5) == 0L))
    val texts = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.forall(r => r.getString(4) == texts(r.getLong(0))))
  }

  // ------------------------------------------------------------------- w7

  test("w7: axis is dense, gaps are live, carry forward-fills correctly") {
    val rows = EventWindows.gapFillResample(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4)))
    assert(rows.exists(_._4), "no gap buckets — the fill branch is dead")
    rows.groupBy(_._1).foreach { case (et, tr) =>
      val sorted = tr.sortBy(_._2)
      // dense axis: every consecutive bucket is exactly TumbleSec apart
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(b._2 - a._2 == EventWindows.TumbleSec, s"$et axis has a hole")
      }
      // endpoints are non-gap by construction
      assert(!sorted.head._4 && !sorted.last._4)
      // forward fill: a gap bucket carries the previous bucket's carry
      sorted.sliding(2).foreach { case Array(a, b) =>
        if (b._4) assert(b._5 == a._5, s"$et: gap at ${b._2} broke the carry")
      }
      // gap rows have zero events; non-gap rows have >= 1
      sorted.foreach { case (_, _, n, gap, _) =>
        assert(if (gap) n == 0 else n > 0)
      }
    }
  }

  // ------------------------------------------------------------------- t15

  test("t15: IQR fences flag planted extreme-length docs (testdata has none)") {
    // testdata lengths are uniform enough that no doc crosses a Tukey
    // fence (measured: 0/500 at sf0.01) — the flag branch needs a
    // planted corpus: 30 ~50-word docs, one 2-word truncation artifact,
    // one 400-word concatenation artifact
    val docs = (0 until 30).map { i =>
      (i.toLong, (0 until 45 + i % 10).map(j => s"w${i}_$j").mkString(" "))
    } ++ Seq(
      (100L, "too short"),
      (101L, (0 until 400).map(j => s"long$j").mkString(" ")))
    val out = java.nio.file.Files.createTempDirectory("graft_t15fix").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$out/documents.parquet")
    val flagged = TextOps.lengthOutliers(spark, out).collect()
      .filter(_.getBoolean(4)).map(_.getLong(0)).toSet
    assert(flagged == Set(100L, 101L),
      s"expected exactly the planted extremes, got $flagged")
  }

  // ------------------------------------------------------------------- w6

  test("w6: packed ordering key refuses event ids >= 2^30") {
    val out = java.nio.file.Files.createTempDirectory("graft_w6fix").toString
    Seq(
      (1073741824L, 1704067200000000000L, 1L, "click", 1.0, "{}"),
      (1L, 1704067201000000000L, 1L, "click", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/events.parquet")
    val e = intercept[Exception] {
      EventWindows.ohlcResample(spark, out).collect()
    }
    def chain(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ::: chain(t.getCause)
    assert(chain(e).exists(_.contains("overflows")),
      s"guard did not fire: ${chain(e)}")
  }

  // ------------------------------------------------------------------ p13

  /** Independent Morton interleave (bitwise, vs the query's arithmetic
    * formulation). */
  private def zval(x: Long, y: Long): Long =
    (0 until TrainingSet.ZBits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("p13: bucket stats match an independent bit-interleave reimplementation") {
    val dim = 1L << TrainingSet.ZBits
    val ev = graft.Tables.eventsUs(spark, dir)
      .select(col("user_id"), expr("tus div 1000000").as("tsec"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = ev.groupBy { case (u, t) =>
      zval(u % dim, t % dim) >> TrainingSet.ZBucketShift
    }.map { case (b, rows) =>
      b -> (rows.length.toLong,
        rows.map(_._1).min, rows.map(_._1).max,
        rows.map(_._2).min, rows.map(_._2).max)
    }
    val got = TrainingSet.zorderLayout(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5), r.getLong(6)))
      .toMap
    assert(got == want)
  }

  test("p13: z-buckets are tight on BOTH dimensions (the pruning claim)") {
    val rows = TrainingSet.zorderLayout(spark, dir).collect()
    assert(rows.length > 1, "fixture must spread events over several buckets")
    // a z >> 22 bucket fixes the top 5 bits of each 16-bit dim, so the
    // within-bucket span of (dim % 2^16) is < 2^11 on both axes — the
    // min/max file stats a scan would prune with
    val bound = 1L << (TrainingSet.ZBits - (32 - TrainingSet.ZBucketShift) / 2)
    rows.foreach { r =>
      assert(r.getLong(4) < bound, s"user span ${r.getLong(4)} >= $bound")
      val dim = 1L << TrainingSet.ZBits
      val (lo, hi) = (r.getLong(5) % dim, r.getLong(6) % dim)
      if (hi >= lo) assert(hi - lo < bound, s"tsec span ${hi - lo} >= $bound")
    }
  }
}
