package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-10 additions: d24 minimum-length ExactSubstr removal (the
  * Lee 2022 "≥ L tokens" rule) pinned on planted documents whose
  * duplicated runs sit exactly at L and L−1 words.
  */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** Words frame with:
    *   docs 1,2 sharing an 8-word run (exactly L), doc 1 the survivor;
    *   docs 3,4 sharing a 7-word run (L−1 — below the cut);
    * all filler words unique per (doc, pos) so no incidental grams.
    */
  private def planted = {
    val run8 = (0 until 8).map(i => s"dup$i")
    val run7 = (0 until 7).map(i => s"sev$i")
    def doc(id: Long, run: Seq[String]): Seq[(Long, Long, String)] = {
      val ws = (0 until 4).map(i => s"f${id}a$i") ++ run ++
        (0 until 4).map(i => s"f${id}b$i")
      ws.zipWithIndex.map { case (w, p) => (id, p.toLong, w) }
    }
    (doc(1L, run8) ++ doc(2L, run8) ++ doc(3L, run7) ++ doc(4L, run7))
      .toDF("doc_id", "pos", "word")
  }

  test("d24: an 8-word duplicated run is removed from the non-survivor only") {
    val out = Dedup.minLenSpanRemovalFrom(planted, Dedup.MinSpanWords)
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1 is the elected survivor of every shared gram: untouched
    assert(out(1L).getLong(4) == 0L, s"survivor doc lost words: ${out(1L)}")
    assert(out(1L).getLong(2) == 0L)
    // doc 2: ONE maximal span of exactly 8 words, removed in full
    assert(out(2L).getLong(2) == 1L, s"doc 2 n_spans: ${out(2L)}")
    assert(out(2L).getLong(3) == 8L, s"doc 2 max_span_words: ${out(2L)}")
    assert(out(2L).getLong(4) == 8L, s"doc 2 removed_words: ${out(2L)}")
    val clean2 = out(2L).getString(7)
    assert(!clean2.contains("dup"), s"duplicated run survived: $clean2")
    assert(clean2.split(" ").length == 8, s"fillers lost: $clean2")
    // docs 3/4: the 7-word run is below the cut — nothing removed
    Seq(3L, 4L).foreach { d =>
      assert(out(d).getLong(2) == 0L && out(d).getLong(4) == 0L,
        s"below-cut span removed from doc $d: ${out(d)}")
    }
  }

  test("d24: raising L to 9 exempts the 8-word run (the cut is exact)") {
    val out = Dedup.minLenSpanRemovalFrom(planted, 9)
      .collect().map(r => r.getLong(0) -> r).toMap
    (1L to 4L).foreach { d =>
      assert(out(d).getLong(2) == 0L && out(d).getLong(4) == 0L,
        s"L=9 removed an 8-word span from doc $d: ${out(d)}")
    }
  }

  test("s19: table 0 reproduces the s15 signature; other tables diverge") {
    val nT = graft.functions.SrpSig.Tables
    val e = Similarity.vectors(spark, dir)
    val sigs = e.select(
      graft.functions.SrpSig.srpSignature(col("v")).as("s15") +:
        (0 until nT).map(t =>
          graft.functions.SrpSig.srpSignatureT(col("v"), t).as(s"t$t")): _*)
      .collect()
    sigs.foreach(r => assert(r.getLong(0) == r.getLong(1),
      "table 0 must be bit-identical to the s15 signature"))
    // independence: every extra table disagrees with table 0 somewhere
    (2 to nT).foreach { i =>
      assert(sigs.exists(r => r.getLong(1) != r.getLong(i)),
        s"table ${i - 1} is a copy of table 0")
    }
  }

  test("s19: recall beats s15 decisively; the candidate prune still bites") {
    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = df
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = hits(Similarity.bruteForceTopK(spark, dir)
      .select(col("q_id"), col("vec_id")))
    val s15 = hits(Similarity.srpLshTopK(spark, dir)
      .select(col("q_id"), col("vec_id")))
    val s19 = hits(Similarity.srpMultiTopK(spark, dir)
      .select(col("q_id"), col("vec_id")))
    val (r15, r19) = (
      (exact & s15).size.toDouble / exact.size,
      (exact & s19).size.toDouble / exact.size)
    info(f"recall vs exact: s15 $r15%.2f, s19 $r19%.2f")
    assert(r19 > r15,
      f"8 tables + directed probe did not beat s15: $r19%.2f <= $r15%.2f")
    assert(r19 >= 0.9, f"s19 recall regressed below 0.90: $r19%.2f")
    // the candidate prune must still bite: distinct (q, cand) pairs
    // well under the brute-force q × (n − 1) surface. Measured at
    // sf0.1 (2000 vectors, the largest corpus in the testdata): 0.72
    // for recall 0.92, vs s15's 0.45 for recall 0.70 — the full
    // Pareto sweep is in the srpMultiTopK Scaladoc. The FRACTION is
    // inflated by the micro-corpus (buckets hold a ~constant-density
    // neighbourhood while the denominator grows with corpus size; the
    // 500-vector SF scans 0.66 with the same absolute bucket sizes),
    // so the bound here is the micro-corpus bound, not the scale
    // claim.
    val big = "/root/testdata/sf0.1"
    val n = Similarity.vectors(spark, big).count()
    val nCand = Similarity.srpMultiCandidates(spark, big).count()
    val n15 = Similarity.srpCandidates(spark, big).count()
    val denom = (Similarity.NumQueries * (n - 1)).toDouble
    val (frac, frac15) = (nCand / denom, n15 / denom)
    info(f"scan fraction at sf0.1: s19 $frac%.2f, s15 $frac15%.2f ($nCand vs $n15 of ${denom.toLong})")
    assert(frac < 0.8, f"candidate prune does not bite: $frac%.2f >= 0.8")
  }

  test("s20: SQ4 codes stay in [-8, 7]; recall floor holds; SQ8 wins on bits") {
    val exact = Similarity.bruteForceTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val hits = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & hits).size.toDouble / exact.size
    }
    val (r4, r8) = (
      recall(Similarity.sq4TopK(spark, dir)
        .select(col("q_id"), col("vec_id"))),
      recall(Similarity.sq8TopK(spark, dir)
        .select(col("q_id"), col("vec_id"))))
    info(f"recall vs exact: SQ4 $r4%.2f, SQ8 $r8%.2f")
    assert(r4 >= 0.4, f"SQ4 recall collapsed: $r4%.2f")
    assert(r8 >= r4,
      f"8-bit codes must not lose to 4-bit: SQ8 $r8%.2f < SQ4 $r4%.2f")
  }

  test("d24 on the corpus: a strict subset of d19's removals, spans all ≥ L") {
    val d19 = Dedup.dupSpanRemoval(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap // removed_words
    val d24 = Dedup.minLenSpanRemoval(spark, dir).collect()
    d24.foreach { r =>
      val (doc, nSpans, maxSpan, removed) =
        (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(removed <= d19(doc),
        s"doc $doc: d24 removed $removed > d19 ${d19(doc)}")
      if (nSpans > 0)
        assert(maxSpan >= Dedup.MinSpanWords,
          s"doc $doc kept a span below L: $maxSpan")
      else assert(removed == 0L, s"doc $doc removed words with no span")
    }
    // the cut is real on the corpus: some docs keep spans, some don't
    assert(d24.exists(_.getLong(2) > 0) && d24.exists(_.getLong(2) == 0))
  }
}
