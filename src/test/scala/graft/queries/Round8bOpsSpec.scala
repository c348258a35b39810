package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 second batch: t19 (full Gopher-style quality-rule battery).
  * The synthetic corpus has no symbols or newlines, so the planted
  * fixture here is what exercises both branches of every rule.
  */
class Round8bOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Write a fixture documents.parquet and return its dir. */
  private def docsDir(docs: Seq[(Long, String)]): String = {
    import spark.implicits._
    val fdir = java.nio.file.Files.createTempDirectory("t19_fix_").toString
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("fix").as("source"), length(col("text")).cast("long").as("n_chars"))
      .coalesce(1).write.parquet(s"$fdir/documents.parquet")
    fdir
  }

  // 10 words, mean len 4.0, two stopwords (the, a), all alphabetic
  private val goodTen = "the quick brown fox jumps over a lazy dog tonight"

  test("t19: a clean 60-word doc passes every rule") {
    val fdir = docsDir(Seq(1L -> Seq.fill(6)(goodTen).mkString(" ")))
    val r = TextOps.gopherRules(spark, fdir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(1) == 60L)
    (2 to 8).foreach(i => assert(!row.getBoolean(i),
      s"rule flag at col $i must be false for the clean doc"))
    assert(row.getBoolean(9), "keep must be true")
  }

  test("t19: each rule flags its planted violation") {
    val fdir = docsDir(Seq(
      // 10 words < 50 → word-count flag
      2L -> goodTen,
      // 60 long words → mean-len flag (and no stopwords)
      3L -> Seq.fill(60)("extraordinarily").mkString(" "),
      // 7 '#' marks over 60 words → symbol flag (10·7 ≥ 60)
      4L -> (Seq.fill(5)(goodTen).mkString(" ") + " " +
        "###tag ####tag quick brown fox jumps over the a lazy"),
      // 20 of 60 words numeric → alpha flag (40·5 < 60·4)
      5L -> (Seq.fill(4)(goodTen) ++ Seq.fill(2)(
        "111 222 333 444 555 666 777 888 999 000")).mkString(" "),
      // 10 lines, all bullet-led, 4 ellipsis-terminated → both line flags
      6L -> (1 to 10).map(i =>
        s"- ${Seq.fill(6)(goodTen).mkString(" ")}" +
          (if (i <= 4) " trailing..." else "")).mkString("\n")))
    val got = TextOps.gopherRules(spark, fdir).collect()
      .map(r => r.getLong(0) -> r).toMap

    assert(got(2L).getBoolean(2), "doc 2: word-count flag")
    assert(!got(2L).getBoolean(3) && !got(2L).getBoolean(4))
    assert(!got(2L).getBoolean(9))

    assert(got(3L).getBoolean(3), "doc 3: mean-len flag")
    assert(got(3L).getBoolean(6), "doc 3: stopword flag (none present)")
    assert(!got(3L).getBoolean(2), "doc 3: word count in range")

    assert(got(4L).getBoolean(4), "doc 4: symbol flag")
    assert(!got(4L).getBoolean(5), "doc 4: #tag words still alphabetic")

    assert(got(5L).getBoolean(5), "doc 5: alpha flag")
    assert(!got(5L).getBoolean(4), "doc 5: no symbols")

    assert(got(6L).getBoolean(7), "doc 6: bullet-lines flag")
    assert(got(6L).getBoolean(8), "doc 6: ellipsis-lines flag")
    assert(!got(6L).getBoolean(2), "doc 6: plenty of words")
  }

  test("t19 is live on the testdata corpus (both keep branches or a live flag)") {
    val rows = TextOps.gopherRules(spark, dir).collect()
    assert(rows.length == graft.Tables.documents(spark, dir).count())
    // word-count rule must split the corpus (docs range ~25–90 words)
    val wc = rows.map(_.getBoolean(2)).distinct
    assert(wc.length == 2, s"flag_word_count constant on corpus: ${wc.toSeq}")
  }

  test("x20: bloom-pruned join result equals the plain unpruned join") {
    val got = Extended.bloomPrunedJoin(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .join(
        graft.Tables.orders(spark, dir)
          .filter(col("o_totalprice") > Extended.BloomOrderDollars)
          .select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
      .orderBy(col("o_orderpriority"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty && got.toSeq == want.toSeq)
  }

  test("x20: bloom admits no false negatives and ≤5% false positives") {
    val bf = Extended.x20Bloom(spark, dir)
    val mc = udf((k: Long) => bf.value.mightContain(k))
    val li = graft.Tables.lineitem(spark, dir)
    val total = li.count()
    val pruned = li.filter(mc(col("l_orderkey"))).count()
    val matching = li
      .join(
        graft.Tables.orders(spark, dir)
          .filter(col("o_totalprice") > Extended.BloomOrderDollars)
          .select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .count()
    assert(pruned >= matching, "a bloom false negative is impossible")
    assert(pruned <= matching + (total * 5) / 100,
      s"false-positive overshoot: pruned=$pruned matching=$matching total=$total")
    // and the prune must actually bite: ~10% selectivity on this data
    assert(pruned * 2 < total, s"bloom pruned nothing: $pruned of $total")
  }

  test("x20 plan: bloom probe filters the lineitem scan before any shuffle") {
    val plan = Extended.bloomPrunedJoin(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF("),
      s"probe must be the native expression, not a Scala UDF:\n$plan")
    val iProbe = plan.indexOf("might_contain")
    assert(iProbe >= 0, s"bloom probe expression missing from plan:\n$plan")
    val iScan = plan.indexOf("lineitem.parquet", iProbe)
    assert(iScan > iProbe, s"bloom filter must sit above the lineitem scan:\n$plan")
    assert(!plan.substring(iProbe, iScan).contains("Exchange"),
      s"bloom probe must run pre-shuffle, inside the scan stage:\n$plan")
  }

  /** Write a fixture events.parquet (µs timestamps) and return its dir. */
  private def eventsDir(rows: Seq[(Long, Long, Long, String)]): String = {
    import spark.implicits._
    val fdir = java.nio.file.Files.createTempDirectory("w12_fix_").toString
    rows.toDF("event_id", "us", "user_id", "event_type")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.parquet(s"$fdir/events.parquet")
    fdir
  }

  test("w12: window boundaries are exact and cross-bucket pairs are found once") {
    val wUs = EventWindows.IntervalWindowSec * 1000000L
    val base = 1704067200000000L // hour- and band-aligned
    val pus = base + 10000000L   // 10 s into its band
    val fdir = eventsDir(Seq(
      (1L, pus, 1L, "purchase"),
      (11L, pus - 1L, 1L, "view"),        // in, nearest (gap 1 µs)
      (12L, pus, 1L, "view"),             // exactly at purchase: OUT
      (13L, pus - wUs, 1L, "view"),       // boundary: IN, previous band
      (14L, pus - wUs - 1L, 1L, "view"),  // one µs too old: OUT
      (15L, base - 100000000L, 1L, "view"), // previous band, in window
      (2L, base + 5000000000L, 2L, "purchase"),
      (21L, base + 5000000001L, 2L, "view"))) // after the purchase: OUT
    val got = EventWindows.intervalJoin(spark, fdir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (1L, 3L, 11L, 1L),
      (2L, 0L, -1L, -1L)), s"got: ${got.toSeq}")
  }

  test("w12: matches the brute-force θ-join on the testdata") {
    val wUs = EventWindows.IntervalWindowSec * 1000000L
    val ev = graft.Tables.eventsUs(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("tus"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val views = ev.filter(_._3 == "view").groupBy(_._2)
    val want = ev.filter(_._3 == "purchase").map { case (pid, u, _, pus) =>
      val vs = views.getOrElse(u, Array.empty)
        .filter(v => v._4 < pus && v._4 >= pus - wUs)
      if (vs.isEmpty) (pid, 0L, -1L, -1L)
      else {
        val near = vs.maxBy(v => (v._4, v._1))
        (pid, vs.length.toLong, near._1, pus - near._4)
      }
    }.sortBy(_._1)
    val got = EventWindows.intervalJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == want.toSeq)
    assert(got.exists(_._2 > 0L), "w12 must be live on the testdata")
    assert(got.exists(_._2 == 0L), "the no-view branch must be live too")
  }

  test("w12 plan: banded blocking yields a hash join, never a nested loop") {
    val plan = EventWindows.intervalJoin(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") &&
      !plan.contains("CartesianProduct"),
      s"interval join must block to an equi-join:\n$plan")
  }

  test("w13: a planted burst tops the leaderboard with the exact score") {
    val h = 3600000000L
    val base = 1704067200000000L
    val rows =
      (0 until 36).filter(_ != 30).map(i =>
        (100L + i, base + i * h, 1L, "view")) ++
        (0 until 10).map(i => (500L + i, base + 30 * h + i * 1000L, 1L, "view"))
    val got = EventWindows.rateAnomalies(spark, eventsDir(rows.map(r =>
      (r._1, r._2, r._3, r._4)))).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val burstStart = (base / 1000000L) + 30 * 3600L
    assert(got.head == (("view", burstStart, 10L, 24L, 216L, 1L)),
      s"leaderboard: ${got.toSeq}")
    // runners-up are flat baseline hours: score exactly 0
    assert(got.drop(1).forall(r => r._5 == 0L && r._6 <= 3L))
  }

  test("w13 plan: top-k runs as WindowGroupLimit; leaderboard is live at sf0.001") {
    val df = EventWindows.rateAnomalies(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank filter must push into a group limit:\n$plan")
    val rows = df.collect()
    val nTypes = graft.Tables.events(spark, dir)
      .select(col("event_type")).distinct().count()
    assert(rows.length == nTypes * 3,
      s"$nTypes types × top 3 expected, got ${rows.length}")
  }

  test("s14: MMR skips the near-duplicate the plain top-k would return") {
    import spark.implicits._
    val fdir = java.nio.file.Files.createTempDirectory("s14_fix_").toString
    // q0 at ~11°; ids 5/6 nearly collinear at ~0°; id 7 diverse at 60°.
    // Plain top-2 for q0 = {6, 5}; MMR step 2 must skip 5 (sim ≈ 1
    // with the already-selected 6) and take 7.
    // distractors sit at 150°–210°, where rel − sim (the λ=1/2 MMR
    // score against the ~0° selection) stays below id 7's 0.16 — a
    // vector near 95° would legitimately beat 7 on pure diversity
    val vecs = Seq(
      0L -> Seq(1.0f, 0.2f),
      1L -> Seq(-0.866f, 0.5f),
      2L -> Seq(-1.0f, 0.0f),
      3L -> Seq(-0.985f, -0.174f),
      4L -> Seq(-0.866f, -0.5f),
      5L -> Seq(1.0f, 0.0f),
      6L -> Seq(1.0f, 0.001f),
      7L -> Seq(0.5f, 0.866f))
    vecs.toDF("vec_id", "embedding")
      .withColumn("label", lit(0))
      .coalesce(1).write.parquet(s"$fdir/embeddings.parquet")
    val q0 = Similarity.mmrRerank(spark, fdir).collect()
      .filter(_.getLong(0) == 0L)
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(q0(1L) == 6L, s"step 1 must be the most relevant: $q0")
    assert(q0(2L) == 7L,
      s"step 2 must diversify to 7, not the near-dup 5: $q0")
  }

  test("s14 invariants: step 1 = s1 rank 1; selections distinct within query") {
    val got = Similarity.mmrRerank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == Similarity.NumQueries * Similarity.MmrSelect)
    val s1Top = Similarity.bruteForceTopK(spark, dir).collect()
      .filter(_.getLong(3) == 1L).map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).distinct.length == rows.length,
        s"q$q selected a vector twice")
      assert(rows.find(_._2 == 1L).get._3 == s1Top(q),
        s"q$q step 1 must equal the plain top-1")
    }
  }

  test("s14: executor-side greedy is row-identical to the driver baseline") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val df = Similarity.mmrRerank(spark, dir)
    assert(rows(df) == rows(Similarity.mmrRerankDriver(spark, dir)))
    // the registered path runs the greedy ON EXECUTORS: the typed
    // flatMap shows up as an object operator, and no collect feeds it
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SerializeFromObject"),
      s"greedy must be a distributed object operator:\n$plan")
    assert(!plan.contains("LocalTableScan"),
      s"a LocalTableScan would mean driver-materialized rows:\n$plan")
  }

  test("t19 plan: one type-grain aggregate, a per-row text projection, 1:1 join") {
    val plan = TextOps.gopherRules(spark, dir)
      .queryExecution.executedPlan.toString
    // cartesian/BNL audit counted on the plan TREE, stopping at cache
    // boundaries (r18: t19's word stats ride the tfidf session cache,
    // whose BUILD plan legitimately contains the 1-row n_docs
    // crossJoin-broadcast — a string contains() would flag it)
    def badJoinsOutsideCache(
        p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        badJoinsOutsideCache(a.executedPlan)
      case _: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => 0
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec =>
        1 + j.children.map(badJoinsOutsideCache).sum
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec =>
        1 + j.children.map(badJoinsOutsideCache).sum
      case other => other.children.map(badJoinsOutsideCache).sum
    }
    assert(badJoinsOutsideCache(
      TextOps.gopherRules(spark, dir).queryExecution.executedPlan) == 0, plan)
    // the line/symbol counts must not explode rows: since r18 the word
    // stats aggregate the cached (doc, word, tf) TYPE frame — the only
    // Generate anywhere is the words posexplode inside the nested
    // session-cache builds. Counted on the plan TREE, stopping at cache
    // boundaries (r17: the cached-words build plan gained a repartition
    // Exchange, so its AQE-wrapped subtree prints twice — initial +
    // final plan — and a string count double-counts the cache's own
    // Generate). The r18 shape also drops the countDistinct Expand:
    // (doc, word) is unique per type row, so the stopword-kind count is
    // a plain conditional sum.
    def generatesOutsideCache(
        p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        generatesOutsideCache(a.executedPlan)
      case _: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => 0
      case g: org.apache.spark.sql.execution.GenerateExec =>
        1 + g.children.map(generatesOutsideCache).sum
      case other => other.children.map(generatesOutsideCache).sum
    }
    val nGenerate = generatesOutsideCache(
      TextOps.gopherRules(spark, dir).queryExecution.executedPlan)
    assert(nGenerate <= 0,
      s"text-side counts must be array projections, not explodes:\n$plan")
    assert(!plan.contains("Expand"),
      s"t19 stopword-kind count regressed to a distinct-aggregate Expand:\n$plan")
  }
}
