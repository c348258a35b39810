package graft.queries

import graft.SparkSpec

/** Filtered ANN (s22/s23): the filter must actually bite (results ⊆
  * the lang sliver), the IVF variant's recall vs the exact filtered
  * baseline holds the family's ≥0.6 floor, and filter-then-score
  * semantics return k SURVIVORS (not k results filtered down).
  */
class FilteredAnnSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r =>
      (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet

  test("s22/s23 results stay inside the metadata sliver; full k per query") {
    val allowed = graft.Tables.documents(spark, dir)
      .filter(org.apache.spark.sql.functions.col("lang") === Similarity.FilterLang)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    for (q <- Seq(Similarity.filteredTopK(spark, dir),
        Similarity.ivfFilteredTopK(spark, dir))) {
      val rows = hits(q)
      assert(rows.forall(r => allowed(r._2)),
        "a result escaped the metadata filter")
    }
    // exact baseline returns k survivors per query (the sliver is big
    // enough at every SF) — score-then-filter would come up short
    val perQ = Similarity.filteredTopK(spark, dir).collect()
      .groupBy(_.getAs[Long]("q_id")).view.mapValues(_.length).toMap
    assert(perQ.values.forall(_ == Similarity.TopK),
      s"filtered top-k must return k survivors per query: $perQ")
  }

  test("s23 recall vs the exact filtered baseline holds the family floor") {
    val exact = hits(Similarity.filteredTopK(spark, dir))
    val ivf = hits(Similarity.ivfFilteredTopK(spark, dir))
    val recall = (exact & ivf).size.toDouble / exact.size
    info(f"s23 recall vs s22 = $recall%.2f")
    assert(recall >= 0.6, f"filtered-IVF recall $recall%.2f < 0.6")
  }
}
