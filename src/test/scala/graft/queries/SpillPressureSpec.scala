package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Spill-under-pressure: the 100 TB posture demands that the heavy
  * operators survive partitions that do NOT fit in executor memory —
  * external sort/agg/window spill paths must produce the SAME rows as
  * the in-memory paths. This suite forces those paths at sf0.001 by
  * dropping every runtime spill threshold to 64 rows (window buffers,
  * sort-merge-join buffers, object-hash-agg fallback) and flipping
  * HashAggregateExec's sort-based-fallback test hook, then asserts:
  *
  *   1. every query COMPLETES under 64-row buffers (nothing assumes
  *      an in-memory partition),
  *   2. rows are IDENTICAL to the unconstrained baseline (spill is
  *      semantically invisible),
  *   3. the spill actually happened — task metrics record
  *      memory/disk bytes spilled > 0, so this is a demonstration,
  *      not a vacuous pass.
  *
  * Queries chosen for their spill surfaces: q6 (GlobalPrefix rolling
  * window — ExternalAppendOnlyUnsafeRowArray in WindowExec), w15
  * (7-day distinct fan-out windows), d17/d19/d24 (gram pipelines:
  * wide hash aggs + per-doc windows + joins), t25 (BPE encode:
  * vocabulary join + corpus-wide checksum aggregation).
  */
class SpillPressureSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private val Queries = Seq(
    "q6_rolling_sentiment", "w15_rolling_distinct",
    "d17_dup_spans", "d19_dup_span_removal",
    // r11: the two heaviest new pipelines — d24's gram join + per-doc
    // windows + span explode, t25's distinct-word merge rewrite +
    // corpus join + per-doc checksum agg
    "d24_minlen_span_removal", "t25_bpe_encode",
    // r11 late: t26's train+infer (vocab-sized class-count agg, the
    // broadcast-weight inference join, per-doc score agg)
    "t26_quality_classifier")

  // 64-row buffers / spill every 256 rows: small enough that every
  // window partition group beyond a page forces the external path,
  // large enough that the per-spill-file reader buffers (~1 MB each,
  // allocated together at iteration) don't themselves exhaust the
  // heap — the first cut at 4 rows OOM'd the test JVM on exactly
  // that, which is its own scale lesson: forced-spill granularity
  // must be sized against the reader-buffer overhead, not just the
  // row budget.
  private val SpillConfs = Map(
    "spark.sql.windowExec.buffer.in.memory.threshold" -> "64",
    "spark.sql.windowExec.buffer.spill.threshold" -> "256",
    "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold" -> "64",
    "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "256",
    "spark.sql.sessionWindow.buffer.in.memory.threshold" -> "64",
    "spark.sql.sessionWindow.buffer.spill.threshold" -> "256",
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "64",
    // HashAggregateExec's documented test hook: stop using the fast
    // hash map after 64 keys and fall back to sort-based aggregation
    // after 128 — the exact mechanism Spark's own metrics suite uses
    // to exercise the agg spill path
    "spark.sql.TungstenAggregate.testFallbackStartsAt" -> "64,128")

  test("forced spill buffers: identical rows, completion, and real spill metrics") {
    val baseline = Queries.map(q =>
      q -> SparkEntry.queries(q)(spark, dir).collect().map(_.toString).toSeq)
      .toMap
    @volatile var spilled = 0L
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) spilled += m.memoryBytesSpilled + m.diskBytesSpilled
      }
    }
    val prior = SpillConfs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    spark.sparkContext.addSparkListener(listener)
    try {
      SpillConfs.foreach { case (k, v) => spark.conf.set(k, v) }
      // drain the async bus before the first query so no task-end
      // events from the baseline pass leak into q1's attribution
      org.apache.spark.graftest.ListenerBridge.flush(spark.sparkContext)
      val perQuery = Queries.map { q =>
        val before = spilled
        val got = SparkEntry.queries(q)(spark, dir).collect()
          .map(_.toString).toSeq
        assert(got == baseline(q),
          s"$q rows diverge under forced spill")
        // the listener bus is async: block until THIS query's task-end
        // events have all been delivered, so the delta is attributed
        // exactly (no polling timeout, no cross-query leakage)
        org.apache.spark.graftest.ListenerBridge.flush(spark.sparkContext)
        q -> (spilled - before)
      }.toMap
      // the fan-out window and gram pipelines MUST have spilled (their
      // per-partition buffers exceed the 64-row threshold at every SF;
      // measured here: w15 ~4 GB, d17 ~75 GB, d19 ~26 GB of spill
      // traffic at sf0.001). q6's GlobalPrefix chunks sit under the
      // threshold at this SF, so it contributes the identity check and
      // the aggregate only.
      assert(perQuery("w15_rolling_distinct") > 0L,
        s"w15 recorded no spill under 64-row window buffers: $perQuery")
      assert(perQuery("d17_dup_spans") > 0L,
        s"d17 recorded no spill under 64-row buffers: $perQuery")
      assert(perQuery("d19_dup_span_removal") > 0L,
        s"d19 recorded no spill under 64-row buffers: $perQuery")
      assert(perQuery.values.sum > 0L, s"nothing spilled: $perQuery")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      prior.foreach { case (k, vOpt) =>
        vOpt match {
          case Some(v) => spark.conf.set(k, v)
          case None => spark.conf.unset(k)
        }
      }
    }
  }
}
