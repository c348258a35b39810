package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftext.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** The s15 sign-random-projection signature (Charikar 2002) as one
  * fused loop — bit b of the result is the sign of the b-th hyperplane
  * dot over the nano-quantized input vector.
  *
  * Why a custom Expression (SURVEY.md §4 preference order b, the
  * DotProduct precedent): the declarative spelling is 32 independent
  * `aggregate(zip_with(v, wts_b, ...))` columns — 32 allocated
  * intermediate arrays and 64×32 interpreted lambda frames PER ROW,
  * and the band explode's projection collapse multiplies that by the
  * fan-out. Measured on the s15 registered query at sf0.1: 2.27 s with
  * the higher-order-function spelling, ~0.3 s with this expression —
  * the whole gap was signature interpretation, not the candidate join.
  *
  * The math is EXACTLY the fold it replaces, in the same order:
  * q_d = (long) round_half_up(v_d · 1e6) (Spark `round`'s BigDecimal
  * HALF_UP on doubles, re-spelled verbatim in [[SrpSig.quantize]]),
  * dp_b = Σ_d q_d · w(b,d) left-to-right in exact long arithmetic
  * (|q| ≤ 2^21-ish, |w| ≤ 2^10, 64 terms — no overflow), bit set iff
  * dp_b ≥ 0. The DuckDB oracle replays the identical integer pipeline,
  * so signatures are bit-identical cross-engine by construction.
  *
  * Null semantics: a null input array, a null element, or a length
  * other than [[SrpSig.Dim]] yields NULL (the embeddings table has
  * none of the three; the declarative fold would have yielded 0 on
  * degenerate inputs — divergence confined to rows that cannot occur
  * and would be wrong either way).
  */
object SrpSig {

  /** Signature width in bits. Capped at 32 by the LCG modulus: the
    * weight stream repeats with period 2048 = 32 × [[Dim]], so bit
    * 32 + k would silently duplicate bit k.
    */
  val Bits = 32

  /** Expected input dimensionality (the embeddings tables' width). */
  val Dim = 64

  /** Hyperplane component w(b, d) ∈ [−1024, 1023]: one LCG step on the
    * flattened (bit, dim) index — pure BIGINT arithmetic both engines
    * reproduce exactly (the p13 "one expression, two spellings"
    * discipline). Not cryptographic and doesn't need to be: SRP only
    * needs sign-balanced pseudo-random directions.
    */
  def weight(b: Int, d: Int): Long =
    ((1103515245L * (b * Dim + d + 1) + 12345L) % 2048L) - 1024L

  /** Multi-table extension (s19): number of independent hash tables.
    * The single-table stream caps at 32 distinct hyperplanes (the LCG
    * period), so extra tables come from DIFFERENT LCG constants, not
    * more bits — table t's weight stream uses multiplier [[TableA]](t)
    * and increment [[TableC]](t). Table 0 reproduces [[weight]]
    * exactly, so `signature(a, 0)` IS the s15 signature.
    */
  val Tables = 8

  /** Per-table LCG multipliers — classic published constants (glibc,
    * Numerical Recipes, Marsaglia/VAX, Borland, Borosh–Niederreiter,
    * Knuth TAOCP-vol2 1812433253, BCPL, Lehmer minimal-standard). All
    * distinct and odd mod 2048 (1645, 1549, 1485, 1589, 1157, 357,
    * 1005, 423) so no two tables' weight streams are shifts of each
    * other — AND every table's 32×64 hyperplane matrix is FULL RANK
    * over the 2048-periodic weight stream, the property the original
    * picks silently lacked: RANDU (65539 ≡ 3 mod 2048, c = 0) made
    * table 6's weights the affine ramp α_b + 3i, so all 32 of its bits
    * were functions of just two scalars of the input (Σq and Σ i·q_i)
    * — probe/scan cost with almost no independent recall — and MSVC's
    * 214013 / Delphi's 134775813 (≡ 1021 / 1029 ≈ ±2048/2, an
    * alternating ±step) ranked only 8 / 12. SrpSignatureSpec now pins
    * full rank and ~0.5 cross-table bit agreement for every table.
    */
  val TableA: Array[Long] =
    Array(1103515245L, 1664525L, 69069L, 22695477L, 3039177861L,
      1812433253L, 2147001325L, 16807L)

  /** Per-table LCG increments (glibc, Numerical Recipes, Marsaglia
    * xorwow, Borland c=1, Knuth c=1, BCPL; zero for the two
    * multiplicative streams). */
  val TableC: Array[Long] =
    Array(12345L, 1013904223L, 362437L, 1L, 0L, 1L, 715136305L, 0L)

  /** Hyperplane component for table t — [[weight]] generalized to the
    * per-table LCG stream.
    */
  def weightT(t: Int, b: Int, d: Int): Long =
    ((TableA(t) * (b * Dim + d + 1) + TableC(t)) % 2048L) - 1024L

  /** The flattened weight table the generated code indexes:
    * `W[b * Dim + d]`. Public static so Janino references it directly.
    */
  val W: Array[Long] =
    Array.tabulate(Bits * Dim)(i => weight(i / Dim, i % Dim))

  /** Per-table flattened weights: `WT[t][b * Dim + d]`. `WT(0)` is
    * [[W]] by construction.
    */
  val WT: Array[Array[Long]] =
    Array.tabulate(Tables)(t =>
      Array.tabulate(Bits * Dim)(i => weightT(t, i / Dim, i % Dim)))

  /** Spark `round(x)` on a double, verbatim (Round's HALF_UP through
    * BigDecimal.valueOf), then Spark's double→long cast. Shared by the
    * interpreted and generated paths so they cannot drift.
    */
  def quantize(x: Double): Long =
    java.math.BigDecimal.valueOf(x * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP)
      .doubleValue()
      .toLong

  /** Static entry point shared by interpreted eval and generated code
    * (no companion class — Scala emits static forwarders, so Janino
    * calls `graft.functions.SrpSig.signature(...)` directly). Boxed
    * Long so degenerate inputs can signal NULL; one box per row is
    * noise next to the 2048-term loop it guards.
    */
  def signature(a: ArrayData): java.lang.Long = signature(a, 0)

  /** Table-t signature — the same fused loop over `WT(t)`. */
  def signature(a: ArrayData, t: Int): java.lang.Long = {
    if (a.numElements() != Dim) return null
    val q = new Array[Long](Dim)
    var d = 0
    while (d < Dim) {
      if (a.isNullAt(d)) return null
      q(d) = quantize(a.getDouble(d))
      d += 1
    }
    val w = WT(t)
    var sig = 0L
    var b = 0
    while (b < Bits) {
      var dp = 0L
      var i = 0
      val off = b * Dim
      while (i < Dim) {
        dp += q(i) * w(off + i)
        i += 1
      }
      if (dp >= 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** `srpSignature($"v")` — the column-level entry point. */
  def srpSignature(c: Column): Column =
    Bridge.column(SrpSignature(Bridge.expression(c)))

  /** Table-t signature column (s19 multi-table). */
  def srpSignatureT(c: Column, table: Int): Column =
    Bridge.column(SrpSignature(Bridge.expression(c), table))
}

/** The Catalyst expression tier (same rung as DotProduct/NormalizeText):
  * `doGenCode` emits a single static call, so the signature projection
  * stays inside whole-stage codegen — no UDF boundary, no per-bit
  * lambda interpretation, no intermediate arrays.
  */
case class SrpSignature(child: Expression, table: Int = 0)
    extends UnaryExpression {

  require(table >= 0 && table < SrpSig.Tables,
    s"srp_signature table $table out of [0, ${SrpSig.Tables})")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"srp_signature needs array<double>, got $t")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "srp_signature"

  override protected def nullSafeEval(input: Any): Any =
    SrpSig.signature(input.asInstanceOf[ArrayData], table) match {
      case null => null
      case v => v.longValue()
    }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val boxed = ctx.freshName("sig")
      s"""
         |java.lang.Long $boxed =
         |  graft.functions.SrpSig.signature($a, $table);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): SrpSignature =
    copy(child = c)
}
