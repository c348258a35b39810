package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lloyd's k-means for IVF centroids (Similarity.kmeansFit).
  *
  * Two claims, each against the data that can show it:
  *  1. On the driver testdata embeddings (uniform-random by
  *     construction — no cluster structure), the spherical k-means
  *     OBJECTIVE (mean assignment cosine) strictly improves over the
  *     seed centroids: that is the quantity Lloyd's guarantees.
  *  2. On clustered vectors (synthesized here: well-separated centers
  *     plus small noise — the shape of real embedding corpora), the
  *     improved quantization turns into improved IVF recall@10 vs the
  *     same seed-centroid strategy.
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("objective improves monotonically over seed centroids on testdata") {
    val e = graft.Tables.embeddings(spark, dir)
      .select(
        col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val seeds = e.orderBy(col("vec_id")).limit(Similarity.NumCentroids)
      .select(col("vec_id").as("centroid_id"), col("v").as("cv"))
    val obj0 = Similarity.kmeansObjective(e, seeds)
    val obj2 = Similarity.kmeansObjective(
      e, Similarity.kmeansFit(e, Similarity.NumCentroids, iters = 2))
    val obj5 = Similarity.kmeansObjective(
      e, Similarity.kmeansFit(e, Similarity.NumCentroids, iters = 5))
    assert(obj2 > obj0, s"2 iters $obj2 should beat seeds $obj0")
    assert(obj5 >= obj2 - 1e-9, s"5 iters $obj5 should not regress vs $obj2")
  }

  /** Deterministic clustered corpus: `k` orthogonal-ish centers in
    * `d` dims, `n` points each = center + hash-derived noise.
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

  private def recallAt10(e: DataFrame, cents: DataFrame): Double = {
    import graft.functions.VectorFunctions.vecDot
    val vecs = e.withColumn("nrm", sqrt(vecDot(col("v"), col("v"))))
    def topk(cands: DataFrame): Set[(Long, Long)] = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
      cands
        .filter(col("q_id") =!= col("vec_id"))
        .withColumn(
          "cos_sim",
          vecDot(col("qv"), col("v")) / (col("qn") * col("nrm")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("q_id"), col("vec_id")).as[(Long, Long)]
        .collect().toSet
    }
    val q = vecs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val exact = topk(broadcast(q).crossJoin(
      vecs.select(col("vec_id"), col("v"), col("nrm"))))
    val cn = cents.withColumn("cn", sqrt(vecDot(col("cv"), col("cv"))))
    val assign = vecs.crossJoin(broadcast(cn))
      .withColumn("s", vecDot(col("v"), col("cv")) / (col("nrm") * col("cn")))
      .groupBy(col("vec_id"))
      .agg(max_by(
        col("centroid_id"),
        struct(col("s"), (-col("centroid_id")).as("n"))).as("cid"))
    val ec = vecs.join(assign, "vec_id")
    val qprobe = ec.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("cid"))
    val approx = topk(ec.join(broadcast(qprobe), Seq("cid")))
    exact.intersect(approx).size.toDouble / exact.size
  }

  test("recall@10 improves over seeds on clustered vectors") {
    val e = clustered(k = 6, n = 50, d = 18)
    val seeds = e.orderBy(col("vec_id")).limit(6)
      .select(col("vec_id").as("centroid_id"), col("v").as("cv"))
    val km = Similarity.kmeansFit(e, k = 6, iters = 4)
    val rSeeds = recallAt10(e, seeds)
    val rKm = recallAt10(e, km)
    info(s"recall@10 seeds=$rSeeds kmeans=$rKm")
    assert(rKm > rSeeds, s"kmeans recall $rKm should beat seeds $rSeeds")
  }

  test("s5 registry query returns ranked rows") {
    val out = Similarity.kmeansIvfTopK(spark, dir)
    val rows = out.collect()
    assert(rows.length == 50) // 5 queries × top-10
    assert(out.columns.toSeq ==
      Seq("q_id", "vec_id", "cos_sim", "rank"))
  }
}
