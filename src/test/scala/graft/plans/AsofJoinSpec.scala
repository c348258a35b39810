package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native AS-OF operator (logical node → strategy → SparkPlan):
  * must equal w4's union+window formulation row-for-row (the two
  * spellings certify each other; the driver additionally holds both to
  * the same DuckDB oracle hash), must plan through AsofJoinExec with
  * EnsureRequirements-inserted exchanges/sorts, and must survive the
  * planted boundary cases.
  */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("native asof equals the w4 window formulation row-for-row") {
    val a = graft.queries.EventWindows.asofJoin(spark, dir).collect()
      .map(_.toSeq)
    val b = graft.queries.EventWindows.asofNative(spark, dir).collect()
      .map(_.toSeq)
    assert(a.length == b.length, s"${a.length} vs ${b.length} rows")
    assert(a.toSeq == b.toSeq, "native asof diverges from the window form")
  }

  test("the plan goes through AsofJoinExec; requirements place sorts+exchanges") {
    val df = graft.queries.EventWindows.asofNative(spark, dir)
    df.collect() // finalize AQE
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsofJoin"), s"native operator missing from plan:\n$p")
    // EnsureRequirements must have placed per-side hash exchanges and
    // (key, time[, id]) sorts — the operator declares, Spark schedules
    assert(p.contains("Exchange hashpartitioning"),
      s"no hash exchange under the asof exec:\n$p")
    assert("""Sort \[user_id""".r.findFirstIn(p).isDefined ||
      """Sort \[c_user""".r.findFirstIn(p).isDefined,
      s"no requirement-inserted sort under the asof exec:\n$p")
  }

  private def longsDf(name: String, rows: Seq[(Long, Long, Long)],
      cols: Seq[String]) =
    rows.toDF(cols: _*)

  test("planted edges: same-µs tie takes max id; no-match rows drop; keys don't leak") {
    val left = longsDf("l", Seq(
      (1L, 100L, 10L),   // matches right at exactly 100 (tie → id 23)
      (1L, 50L, 11L),    // before every right row of user 1 → dropped
      (2L, 100L, 12L),   // user 2 has no right rows at all → dropped
      (3L, 999L, 13L)),  // matches user 3's latest at 500
      Seq("user_id", "t_us", "l_id"))
    val right = longsDf("r", Seq(
      (1L, 100L, 22L),
      (1L, 100L, 23L),   // same µs, larger id — must win the tie
      (1L, 90L, 21L),
      (3L, 500L, 31L),
      (3L, 400L, 30L)),
      Seq("r_user", "r_us", "r_id"))
    val got = AsofJoin.asof(left, right)
      .select(col("l_id"), col("r_id"), col("r_us"))
      .orderBy(col("l_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((10L, 23L, 100L), (13L, 31L, 500L)),
      s"got ${got.toSeq}")
  }

  test("NULL keys/times are filtered, never decoded as key 0") {
    // getLong on a NULL ordinal silently reads 0L — without the
    // wrapper's null filter a NULL-key right row would interleave
    // with REAL key 0 and win as-of matches it has no business in
    val left = Seq((0L, 100L, 10L))
      .toDF("user_id", "t_us", "l_id")
    val right = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(0L, 50L, 20L),            // the real match
        org.apache.spark.sql.Row(null, 90L, 21L),          // NULL key
        org.apache.spark.sql.Row(0L, null, 22L))),         // NULL time
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "r_user", org.apache.spark.sql.types.LongType, nullable = true),
        org.apache.spark.sql.types.StructField(
          "r_us", org.apache.spark.sql.types.LongType, nullable = true),
        org.apache.spark.sql.types.StructField(
          "r_id", org.apache.spark.sql.types.LongType, nullable = true))))
    val got = AsofJoin.asof(left, right)
      .select(col("l_id"), col("r_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((10L, 20L)),
      s"null rows must not participate: ${got.toSeq}")
  }

  test("randomized: the exec equals an in-memory asof fold (ties, gaps, dup times)") {
    // deterministic LCG so the case is reproducible; dense key/time
    // ranges force many same-key and same-(key,time) collisions, the
    // regimes where a merge-scan bug would hide
    var seed = 0x5eedL
    def nxt(n: Int): Long = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      math.floorMod(seed >>> 33, n.toLong)
    }
    val left = (0 until 400).map(i => (nxt(20), nxt(50), 1000L + i))
    val right = (0 until 300).map(i => (nxt(20), nxt(50), 2000L + i))
    val want = left.flatMap { case (k, t, id) =>
      val eligible = right.filter(r => r._1 == k && r._2 <= t)
      if (eligible.isEmpty) None
      else {
        val best = eligible.maxBy(r => (r._2, r._3))
        Some((id, best._3))
      }
    }.sorted
    val got = AsofJoin.asof(
      left.toDF("k", "t", "l_id"),
      right.toDF("rk", "rt", "r_id"))
      .select(col("l_id"), col("r_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq == want,
      s"exec diverges from the reference fold on ${got.length} vs " +
        s"${want.length} matches")
  }

  test("the exec produces identical rows with AQE disabled (both planners pinned)") {
    val withAqe = graft.queries.EventWindows.asofNative(spark, dir)
      .collect().map(_.toSeq)
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val noAqe = graft.queries.EventWindows.asofNative(spark, dir)
        .collect().map(_.toSeq)
      assert(noAqe.toSeq == withAqe.toSeq,
        "asof exec diverges between AQE and static planning")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("the wrapper rejects malformed inputs loudly") {
    val l = Seq((1L, 2L, 3L)).toDF("a", "b", "c")
    val rBad = Seq((1L, "x", 3L)).toDF("d", "e", "f")
    val eTy = intercept[IllegalArgumentException](AsofJoin.asof(l, rBad))
    assert(eTy.getMessage.contains("must be LONG"))
    val rDup = Seq((1L, 2L, 3L)).toDF("a", "y", "z")
    val eDup = intercept[IllegalArgumentException](AsofJoin.asof(l, rDup))
    assert(eDup.getMessage.contains("share column names"))
  }
}
