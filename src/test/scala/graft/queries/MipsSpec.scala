package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** s9 MIPS: the Bachrach et al. 2014 norm-augmentation reduction made
  * executable, plus proof the registry row isn't redundant with s1.
  */
class MipsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def corpus: Array[(Long, Array[Double])] =
    graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }

  private def norm(a: Array[Double]): Double = math.sqrt(dot(a, a))

  test("s9: augmented-cosine order equals inner-product order (the reduction)") {
    val vecs = corpus
    val u = vecs.map(v => norm(v._2)).max
    // ṽ = v ++ [sqrt(U² − ‖v‖²)]  (‖ṽ‖ = U);  q̃ = q ++ [0]
    val aug = vecs.map { case (id, v) =>
      (id, v :+ math.sqrt(math.max(0.0, u * u - dot(v, v))))
    }
    for (qi <- 0 until Similarity.NumQueries) {
      val q = vecs(qi)._2
      val qAug = q :+ 0.0
      val qn = norm(qAug)
      val byDot = vecs.filter(_._1 != qi)
        .map { case (id, v) => (id, dot(q, v)) }
        .sortBy { case (id, d) => (-d, id) }
      val cosOf = aug.map { case (id, av) =>
        id -> dot(qAug, av) / (qn * norm(av))
      }.toMap
      // walking the exact-dot order, the augmented cosine never
      // increases (beyond FP noise) — same ranking, any tie-break
      byDot.sliding(2).foreach { case Array((ia, _), (ib, _)) =>
        assert(cosOf(ia) >= cosOf(ib) - 1e-12,
          s"q$qi: augmented cosine order breaks at $ia -> $ib")
      }
    }
  }

  test("s9: on the unit-norm testdata corpus, MIPS top-k ≡ cosine top-k") {
    // the testdata embeddings are L2-normalized (norms 1.0 ± 1e-7), so
    // dot and cosine must produce the same neighbor sets — the special
    // case where s1 and s9 coincide, asserted as a cross-check
    val byCos = Similarity.bruteForceTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3)) -> r.getLong(1)).toMap
    val byDot = Similarity.mipsTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3)) -> r.getLong(1)).toMap
    assert(byDot == byCos)
  }

  /** Non-unit-norm corpus where dot and cosine MUST disagree: vector
    * 100 is near-perfectly aligned with query 0 but short (norm 0.5);
    * vector 101 is less aligned but long (norm 4) — dot prefers 101,
    * cosine prefers 100. Written as embeddings.parquet so the
    * REGISTERED s1/s9 queries run on it unmodified.
    */
  private lazy val mipsDir: String = {
    import spark.implicits._
    val d = 8
    def unit(axis: Int): Array[Float] =
      Array.tabulate(d)(i => if (i == axis) 1.0f else 0.0f)
    def scaled(v: Array[Double], s: Double): Array[Float] =
      v.map(x => (x * s).toFloat)
    val diag = Array.tabulate(d)(_ => 1.0 / math.sqrt(d.toDouble))
    val queries = (0 until Similarity.NumQueries)
      .map(q => (q.toLong, unit(q % d).toSeq))
    val aligned = (100L, scaled(unit(0).map(_.toDouble), 0.5).toSeq)
    val long = (101L, scaled(diag, 4.0).toSeq)
    val filler = (102 until 120).map { i =>
      (i.toLong, scaled(Array.tabulate(d)(j =>
        if (j == (i % d)) 0.9 else 0.1), 1.0).toSeq)
    }
    val out = java.nio.file.Files.createTempDirectory("graft_mipsfix").toString
    ((queries :+ aligned :+ long) ++ filler).toDF("vec_id", "embedding")
      .withColumn("label", lit(0))
      .coalesce(1).write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    out
  }

  test("s9: MIPS and cosine rankings diverge on a non-unit-norm corpus") {
    val topCos = Similarity.bruteForceTopK(spark, mipsDir).collect()
      .filter(r => r.getLong(0) == 0L).sortBy(_.getLong(3)).map(_.getLong(1))
    val topDot = Similarity.mipsTopK(spark, mipsDir).collect()
      .filter(r => r.getLong(0) == 0L).sortBy(_.getLong(3)).map(_.getLong(1))
    assert(topCos.head == 100L,
      s"cosine must prefer the aligned short vector, got ${topCos.head}")
    assert(topDot.head == 101L,
      s"dot must prefer the long vector, got ${topDot.head}")
    assert(!topCos.sameElements(topDot))
  }

  test("s10: IVF-MIPS recall@k vs exact s9 is bounded below") {
    // the registered approximate sibling: nprobe=1 over 8 buckets on
    // the testdata corpus. Recall measured 0.88 (sf0.001) / 0.90
    // (sf0.01) — pinned at 0.6 so a bucketing regression (e.g.
    // assignment drifting out of augmented space) fails loudly while
    // seed-centroid sensitivity doesn't flake the suite. The BOUND is
    // the contract; exact values are the DuckDB oracle's job.
    val exact = Similarity.mipsTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.mipsIvfTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, f"s10 recall@k vs s9 = $recall%.2f < 0.6")
    // and it must actually be approximate on this corpus — identical
    // sets would mean the bucket restriction isn't restricting
    assert(approx.nonEmpty && exact.nonEmpty)
  }

  test("s10: reported scores are raw inner products (s9's scale), not cosines") {
    val vecById = corpus.toMap
    for (r <- Similarity.mipsIvfTopK(spark, dir).collect().take(10)) {
      val expected = dot(vecById(r.getLong(0)), vecById(r.getLong(2)))
      assert(math.abs(r.getDouble(3) - expected) < 1e-6,
        s"q${r.getLong(0)}->${r.getLong(2)}: ${r.getDouble(3)} vs $expected")
    }
  }
}
