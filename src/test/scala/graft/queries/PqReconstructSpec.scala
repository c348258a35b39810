package graft.queries

import graft.SparkSpec
import graft.functions.PqCodec
import org.apache.spark.sql.functions._

/** The fused PQ encode+reconstruct expression must be indistinguishable
  * from the declarative transform/aggregate/vecDot fold it replaced —
  * same bits on the corpus under BOTH the seed and the trained
  * codebooks — and must stay inside whole-stage codegen.
  *
  * Lives in the queries package to reach the package-private codebook
  * plumbing (seedCodebooks / cachedPqCodebooks).
  */
class PqReconstructSpec extends SparkSpec {
  import graft.functions.VectorFunctions.vecDot

  private val dir = "/root/testdata/sf0.001"

  /** The exact declarative spelling pqEncode used before the fused
    * expression landed — kept as the executable definition.
    */
  private def foldRv(cb: Seq[Seq[Seq[Double]]]): org.apache.spark.sql.Column = {
    val cbLit = typedLit(cb)
    val codes = transform(
      sequence(lit(0), lit(Similarity.NumSubspaces - 1)),
      m => {
        val sv = slice(col("v"), m * Similarity.SubDim + 1,
          lit(Similarity.SubDim))
        aggregate(
          sequence(lit(0), lit(Similarity.NumCodes - 1)),
          struct(lit(0L).as("k"), lit(Double.NegativeInfinity).as("s")),
          (acc, k) => {
            val d = vecDot(sv, element_at(element_at(cbLit, m + 1), k + 1))
            when(d > acc.getField("s"),
              struct(k.cast("long").as("k"), d.as("s"))).otherwise(acc)
          },
          acc => acc.getField("k"))
      })
    flatten(transform(
      codes,
      (c, m) => element_at(element_at(cbLit, m + 1), c.cast("int") + 1)))
  }

  private def vectors = Similarity.vectors(spark, dir)

  test("fused reconstruction equals the declarative fold (seed + trained books)") {
    val books = Seq(
      "seed" -> Similarity.seedCodebooks(vectors),
      "trained" -> Similarity.collectCodebooks(
        Similarity.cachedPqCodebooks(spark, dir)))
    for ((name, cb) <- books) {
      val diverged = vectors
        .select(
          col("vec_id"),
          PqCodec.reconstructed(col("v"), cb).as("fast"),
          foldRv(cb).as("slow"))
        .filter(col("fast") =!= col("slow") || col("fast").isNull)
        .collect()
      assert(diverged.isEmpty,
        s"$name book: ${diverged.length} reconstructions diverge, " +
          s"first ${diverged.headOption.map(_.getLong(0))}")
    }
  }

  /** The L2 argmin as a declarative fold: score = dot − ‖cw‖²/2, the
    * same bias spelling the oracle and the fused loop use.
    */
  private def foldRvL2(cb: Seq[Seq[Seq[Double]]]): org.apache.spark.sql.Column = {
    val cbLit = typedLit(cb)
    val biasLit = typedLit(cb.map(_.map { cw =>
      var s = 0.0
      cw.foreach(x => s += x * x)
      s / 2
    }))
    val codes = transform(
      sequence(lit(0), lit(Similarity.NumSubspaces - 1)),
      m => {
        val sv = slice(col("v"), m * Similarity.SubDim + 1,
          lit(Similarity.SubDim))
        aggregate(
          sequence(lit(0), lit(Similarity.NumCodes - 1)),
          struct(lit(0L).as("k"), lit(Double.NegativeInfinity).as("s")),
          (acc, k) => {
            val d = vecDot(sv, element_at(element_at(cbLit, m + 1), k + 1)) -
              element_at(element_at(biasLit, m + 1), k + 1)
            when(d > acc.getField("s"),
              struct(k.cast("long").as("k"), d.as("s"))).otherwise(acc)
          },
          acc => acc.getField("k"))
      })
    flatten(transform(
      codes,
      (c, m) => element_at(element_at(cbLit, m + 1), c.cast("int") + 1)))
  }

  test("fused L2 reconstruction equals the declarative L2 fold (s16's encode)") {
    // drive with both the residual frame s16 actually encodes and the
    // raw vectors (varying-norm inputs are where MIPS and L2 diverge)
    val resCb = Similarity.collectCodebooks(
      Similarity.cachedResPqCodebooks(spark, dir))
    val frames = Seq(
      "residuals" -> Similarity.residualFrame(spark, dir)
        .select(col("vec_id"), col("resv").as("v")),
      "raw" -> vectors.select(col("vec_id"), col("v")))
    for ((name, f) <- frames) {
      val diverged = f
        .select(
          col("vec_id"),
          PqCodec.reconstructedL2(col("v"), resCb).as("fast"),
          foldRvL2(resCb).as("slow"))
        .filter(col("fast") =!= col("slow") || col("fast").isNull)
        .collect()
      assert(diverged.isEmpty,
        s"$name: ${diverged.length} L2 reconstructions diverge, " +
          s"first ${diverged.headOption.map(_.getLong(0))}")
    }
    // and the two flavors genuinely differ somewhere on this data —
    // otherwise the L2 path is untested dead weight
    val differ = Similarity.residualFrame(spark, dir)
      .select(
        PqCodec.reconstructedL2(col("resv"), resCb).as("l2"),
        PqCodec.reconstructed(col("resv"), resCb).as("mips"))
      .filter(col("l2") =!= col("mips")).count()
    assert(differ > 0, "L2 and MIPS encodes agree everywhere — vacuous")
  }

  test("pq_reconstruct stays inside whole-stage codegen (Janino must compile)") {
    val cb = Similarity.seedCodebooks(vectors)
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = graft.Tables.embeddings(spark, dir)
        .select(PqCodec.reconstructed(
          col("embedding").cast("array<double>"), cb).as("rv"))
      assert(df.collect().nonEmpty)
      val plan = df.queryExecution.executedPlan.toString
      assert("""\*\(\d+\) Project .*pq_reconstruct""".r
          .findFirstIn(plan).isDefined,
        s"pq_reconstruct fell out of whole-stage codegen:\n$plan")
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("degenerate inputs are NULL: wrong length, null element") {
    import spark.implicits._
    val cb = Similarity.seedCodebooks(vectors)
    val dim = Similarity.NumSubspaces * Similarity.SubDim
    val short = Seq(Tuple1(Seq.fill(dim - 1)(0.5)))
      .toDF("v")
      .select(PqCodec.reconstructed(col("v"), cb).as("rv")).collect()
    assert(short(0).isNullAt(0), "short vector must yield NULL")
    val withNull = Seq(Tuple1(
      (0 until dim).map(i => if (i == 5) null
        else java.lang.Double.valueOf(0.5))))
      .toDF("v")
      .select(PqCodec.reconstructed(
        col("v").cast("array<double>"), cb).as("rv")).collect()
    assert(withNull(0).isNullAt(0), "null element must yield NULL")
  }
}
