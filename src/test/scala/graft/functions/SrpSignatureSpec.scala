package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The codegen'd SRP signature must be indistinguishable from the
  * declarative 32×aggregate(zip_with(...)) fold it replaced for speed
  * (s15's signature went 2.27 s → sub-second at sf0.1) — same bits on
  * the real corpus, same codegen discipline as t17, defined null
  * behavior on degenerate inputs.
  */
class SrpSignatureSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** The exact higher-order-function spelling srpSig used before the
    * expression landed — kept here as the executable definition of the
    * signature semantics.
    */
  private def foldSig: org.apache.spark.sql.Column =
    (0 until SrpSig.Bits).map { b =>
      val wts = array((0 until SrpSig.Dim).map(d => lit(SrpSig.weight(b, d))): _*)
      val dp = aggregate(
        zip_with(
          col("v"), wts,
          (x, w) => round(x * 1e6).cast("long") * w),
        lit(0L),
        (acc, y) => acc + y)
      when(dp >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  test("srp_signature equals the declarative fold bit-for-bit on the corpus") {
    val e = graft.Tables.embeddings(spark, dir)
      .select(
        col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val diverged = e
      .select(
        col("vec_id"),
        SrpSig.srpSignature(col("v")).as("fast"),
        foldSig.as("slow"))
      .filter(col("fast") =!= col("slow") || col("fast").isNull)
      .collect()
    assert(diverged.isEmpty,
      s"expression diverges from the fold on ${diverged.length} vectors, " +
        s"first: ${diverged.headOption}")
  }

  test("srp_signature stays inside whole-stage codegen (Janino must compile)") {
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      // plain element-wise Cast, not a transform lambda — higher-order
      // functions are codegen-incompatible and would drag the whole
      // projection out of the span regardless of this expression
      val df = graft.Tables.embeddings(spark, dir)
        .select(SrpSig.srpSignature(
          col("embedding").cast("array<double>")).as("sig"))
      assert(df.collect().nonEmpty)
      val plan = df.queryExecution.executedPlan.toString
      assert("""\*\(\d+\) Project .*srp_signature""".r.findFirstIn(plan).isDefined,
        s"srp_signature projection fell out of whole-stage codegen:\n$plan")
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("degenerate inputs are NULL: null array, null element, wrong length") {
    val rows = Seq(
      (1L, Array.fill(SrpSig.Dim)(0.5)),               // well-formed
      (2L, null.asInstanceOf[Array[Double]]),          // null array
      (3L, Array.fill(SrpSig.Dim - 1)(0.5)))           // short
      .toDF("id", "v")
      .select(col("id"), SrpSig.srpSignature(col("v")).as("sig"))
      .orderBy(col("id"))
      .collect()
    assert(!rows(0).isNullAt(1))
    assert(rows(1).isNullAt(1), "null array must yield NULL")
    assert(rows(2).isNullAt(1), s"length ${SrpSig.Dim - 1} must yield NULL")
    val withNullElem = Seq(Tuple1(
      (0 until SrpSig.Dim).map(i =>
        if (i == 3) null else java.lang.Double.valueOf(0.5))))
      .toDF("v")
      .select(SrpSig.srpSignature(col("v").cast("array<double>")).as("sig"))
      .collect()
    assert(withNullElem(0).isNullAt(0), "null element must yield NULL")
  }

  /** Rank of a table's 32×64 hyperplane matrix via Gaussian
    * elimination with partial pivoting (entries are ≤1024 integers, so
    * double arithmetic with a 1e-6 pivot threshold is exact enough by
    * orders of magnitude).
    */
  private def hyperplaneRank(t: Int): Int = {
    val m = Array.tabulate(SrpSig.Bits, SrpSig.Dim)((b, d) =>
      SrpSig.weightT(t, b, d).toDouble)
    var rank = 0
    var col = 0
    while (rank < SrpSig.Bits && col < SrpSig.Dim) {
      val piv = (rank until SrpSig.Bits).maxBy(r => math.abs(m(r)(col)))
      if (math.abs(m(piv)(col)) > 1e-6) {
        val tmp = m(rank); m(rank) = m(piv); m(piv) = tmp
        for (r <- rank + 1 until SrpSig.Bits) {
          val f = m(r)(col) / m(rank)(col)
          for (c <- col until SrpSig.Dim) m(r)(c) -= f * m(rank)(c)
        }
        rank += 1
      }
      col += 1
    }
    rank
  }

  test("every table's hyperplane matrix is full rank (no RANDU-style ramps)") {
    // RANDU's 65539 ≡ 3 mod 2048 made table 6 rank 5 (every bit a
    // function of two input scalars); MSVC/Delphi residues ≈ ±1024
    // ranked 8/12. A degenerate table adds probe/scan cost with almost
    // no independent recall — pin full rank so a constants change
    // can't silently reintroduce one.
    for (t <- 0 until SrpSig.Tables)
      assert(hyperplaneRank(t) == SrpSig.Bits,
        s"table $t hyperplane matrix rank ${hyperplaneRank(t)} < ${SrpSig.Bits}")
  }

  test("cross-table bit agreement stays near 1/2 on the corpus (independence)") {
    // two independent sign-projection tables agree on ~half their bits;
    // a pair that shares structure drifts toward 0 or 1. Measured range
    // on this corpus is [0.485, 0.525] — assert a loose [0.40, 0.60].
    val e = graft.Tables.embeddings(spark, dir)
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
    val sigs = e.select(
      (0 until SrpSig.Tables).map(t =>
        SrpSig.srpSignatureT(col("v"), t).as(s"t$t")): _*)
    val agreeCols = for {
      t <- 0 until SrpSig.Tables; u <- (t + 1) until SrpSig.Tables
    } yield avg(
      lit(SrpSig.Bits) - bit_count(expr(s"t$t") bitwiseXOR expr(s"t$u")))
      .as(s"a${t}_$u")
    val row = sigs.agg(agreeCols.head, agreeCols.tail: _*).head()
    for (i <- 0 until row.length) {
      val frac = row.getDouble(i) / SrpSig.Bits
      assert(frac > 0.40 && frac < 0.60,
        s"pair ${row.schema(i).name} bit agreement $frac outside [0.40, 0.60]")
    }
  }

  test("quantize matches Spark round-half-up then long cast at midpoints") {
    // ±.5 µ-midpoints are where HALF_UP vs HALF_EVEN vs floor diverge —
    // pin the exact spelling shared with the generated code
    val cases = Seq(
      0.0000005 -> 1L, 0.0000015 -> 2L, -0.0000005 -> -1L,
      -0.0000015 -> -2L, 0.25 -> 250000L, -0.1234567 -> -123457L)
    cases.foreach { case (x, want) =>
      assert(SrpSig.quantize(x) == want, s"quantize($x)")
      val viaSpark = Seq(Tuple1(x)).toDF("x")
        .select(round(col("x") * 1e6).cast("long")).collect()(0).getLong(0)
      assert(viaSpark == want, s"Spark round($x · 1e6) disagrees: $viaSpark")
    }
  }
}
