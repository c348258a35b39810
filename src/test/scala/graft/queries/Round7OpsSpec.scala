package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-7 checks:
  *   - x15 (unpivot) is x7's exact dual: melting the wide frame and
  *     re-pivoting it reproduces the wide frame bit-for-bit, and the
  *     melt itself plans as an Expand with NO additional exchange;
  *   - the d5 guard's conf key is part of the public surface the README
  *     documents — pin the literal so a doc/code drift fails a test.
  */
class Round7OpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("x15: unpivot ∘ pivot round-trips to the wide frame exactly") {
    val wide = Extended.pivotEvents(spark, dir)
    val rePivoted = Extended.unpivotEvents(spark, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "view", "purchase"))
      .agg(sum(col("cents")))
      .select(
        col("user_id"),
        coalesce(col("click"), lit(0L)).as("click_cents"),
        coalesce(col("view"), lit(0L)).as("view_cents"),
        coalesce(col("purchase"), lit(0L)).as("purchase_cents"))
    assert(rePivoted.exceptAll(wide).isEmpty && wide.exceptAll(rePivoted).isEmpty,
      "x15 melt + re-pivot must be the identity on x7's wide frame")
  }

  test("x15: the melt is an Expand, not a join or an extra shuffle") {
    val plan = Extended.unpivotEvents(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan)
    // exchanges: the two the pivot agg pays for the wide input
    // ((user,type) pre-agg + per-user pivotfirst) + the output sort —
    // the melt itself must add none, and x7's presentation sort must
    // NOT appear inside the melt's input
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 3, s"melt added an exchange:\n$plan")
    val sorts = "Sort ".r.findAllIn(plan).length
    assert(sorts <= 1, s"melt input carries a wasted interior sort:\n$plan")
    assert(!plan.contains("Join"), s"melt must not plan a join:\n$plan")
  }

  test("x15: every (user, type) long row matches a direct aggregation") {
    val direct = graft.Tables.events(spark, dir)
      .filter(col("user_id") < 30)
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
    val melted = Extended.unpivotEvents(spark, dir)
    // the melt carries explicit zero rows for absent types; the direct
    // agg has no row there — compare on the nonzero support
    val nonzero = melted.filter(col("cents") =!= 0L)
    assert(nonzero.exceptAll(direct).isEmpty,
      "melted nonzero rows must agree with the direct (user,type) agg")
  }

  test("d5 guard conf key is the documented literal") {
    // README/SURVEY document this exact string as the 100×-scale
    // escape hatch beside the d8 routing; renaming it must fail here
    assert(Dedup.MaxAllPairsVectorsKey == "graft.dedup.maxAllPairsVectors")
  }
}
