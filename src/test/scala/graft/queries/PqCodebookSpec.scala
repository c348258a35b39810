package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trained PQ codebooks (Similarity.pqCodebooksFitFrom) vs the static
  * seed codebook they refine — the KMeansSpec two-claim pattern:
  *  1. On the driver testdata (uniform-random, no cluster structure)
  *     the per-subspace k-means OBJECTIVE improves over the seed
  *     codewords — the quantity Lloyd's actually guarantees.
  *  2. On clustered vectors (the shape of real embedding corpora) the
  *     better quantizer turns into better-or-equal PQ recall@10 vs s1
  *     exact ground truth.
  */
class PqCodebookSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  /** Mean best-codeword cosine per subspace, summed — the spherical
    * k-means objective the fit optimizes, measured for any codebook.
    */
  private def pqObjective(e: DataFrame, cb: Seq[Seq[Seq[Double]]]): Double =
    (0 until Similarity.NumSubspaces).map { m =>
      val sub = e.select(
        col("vec_id"),
        slice(col("v"), m * Similarity.SubDim + 1, Similarity.SubDim).as("v"))
      val cents = cb(m).zipWithIndex
        .map { case (v, k) => (k.toLong, v) }
        .toDF("centroid_id", "cv")
      Similarity.kmeansObjective(sub, cents)
    }.sum

  test("per-subspace objective improves over the seed codebook on testdata") {
    val e = Similarity.vectors(spark, dir)
    val seed = Similarity.seedCodebooks(e)
    val trained = Similarity.collectCodebooks(
      Similarity.pqCodebooksFitFrom(e, iters = 2))
    val o0 = pqObjective(e, seed)
    val o2 = pqObjective(e, trained)
    info(s"pq objective seed=$o0 trained=$o2")
    // The GUARANTEE Lloyd's makes is non-decrease (a seed codebook can
    // legally be a fixed point), so >= is the theorem being asserted;
    // the strict check below is an empirical regression canary on THIS
    // deterministic corpus (measured 4.85 → 5.38), valid only while
    // the fixture data stays byte-identical.
    assert(o2 >= o0, s"trained objective $o2 regressed below seeds $o0")
    assert(o2 > o0,
      s"training no longer strictly improves on the fixed testdata " +
        s"($o2 vs $o0) - if the corpus changed this canary may need a " +
        "constructed improving fixture instead")
  }

  /** Same deterministic clustered corpus as KMeansSpec, at the 64-dim
    * PQ geometry.
    */
  private def clustered(k: Int, n: Int, d: Int): DataFrame = {
    def noise(seed: Long, i: Int): Double =
      (((seed * 2862933555777941757L + i * 3037000493L) >>> 33) % 1000L) / 5000.0
    val rows = for {
      c <- 0 until k
      j <- 0 until n
    } yield {
      val id = (c * n + j).toLong
      val v = Array.tabulate(d) { dim =>
        val center = if (dim % k == c) 1.0 else 0.0
        center + noise(id, dim)
      }
      (id, v.toSeq)
    }
    rows.toDF("vec_id", "v")
  }

  private def recallVsExact(e: DataFrame, cb: Seq[Seq[Seq[Double]]]): Double = {
    import graft.functions.VectorFunctions.vecDot
    val vecs = e.withColumn("nrm", sqrt(vecDot(col("v"), col("v"))))
    // s1-style exact ground truth (cosine top-10 per query)
    val q = vecs.filter(col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    val exact = broadcast(q).join(vecs, col("q_id") =!= col("vec_id"))
      .withColumn("cos_sim", vecDot(col("qv"), col("v")) / (col("qn") * col("nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= Similarity.TopK)
      .select(col("q_id"), col("vec_id")).as[(Long, Long)].collect().toSet
    val approx = Similarity.pqTopKFrom(e.select(col("vec_id"), col("v")), cb)
      .select(col("q_id"), col("vec_id")).as[(Long, Long)].collect().toSet
    exact.intersect(approx).size.toDouble / exact.size
  }

  test("PQ recall@10 with trained codebooks >= seed codebooks on clustered vectors") {
    val e = clustered(k = 6, n = 50, d = 64)
    val seed = Similarity.seedCodebooks(e)
    val trained = Similarity.collectCodebooks(
      Similarity.pqCodebooksFitFrom(e, iters = 3))
    val rSeed = recallVsExact(e, seed)
    val rTrained = recallVsExact(e, trained)
    info(s"pq recall@10 seed=$rSeed trained=$rTrained")
    assert(rTrained >= rSeed,
      s"trained recall $rTrained must not regress vs seeds $rSeed")
  }

  test("s7 registry query returns ranked rows over the trained codebooks") {
    val out = Similarity.pqTopK(spark, dir)
    val rows = out.collect()
    assert(rows.length == Similarity.NumQueries * Similarity.TopK)
    assert(out.columns.toSeq == Seq("q_id", "vec_id", "score", "rank"))
  }
}
