package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftext.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** PQ encode + reconstruct as ONE fused expression: for each of the M
  * subspaces, argmax-by-dot over the K codewords (strict `>`, so the
  * FIRST maximum — lowest k — wins, matching the oracle's
  * `(dot DESC, k ASC)` row_number), then emit the concatenation of the
  * chosen codewords — the reconstruction ADC scores against.
  *
  * Why an Expression (the DotProduct/SrpSignature/s15 lesson, third
  * verse): the declarative spelling is a `transform` over subspaces
  * wrapping an `aggregate` over codes wrapping a `vecDot` per step —
  * M×K interpreted lambda frames and struct allocations per ROW
  * around each (codegen'd) dot. The fused loop does the identical
  * arithmetic — per (m, k): left-to-right double dot of the
  * subvector against the codeword, same order as the zip_with fold —
  * in one pass with zero allocation beyond the output array.
  *
  * The codebook is CONTROL data (M×K×subDim literals, the same
  * Seq the old fold inlined via typedLit); it ships into generated
  * code through `addReferenceObj`, Catalyst's mechanism for exactly
  * this. Null semantics: null input array or null element → NULL
  * (impossible on the embeddings tables; declared for totality), and
  * a length ≠ M·subDim input is a plan-time-documented error surfaced
  * as NULL rather than a misaligned read.
  */
object PqCodec {

  /** The fused encode+reconstruct over a flattened codebook
    * (layout: cb[(m·K + k)·subDim + i]). Shared by interpreted eval
    * and generated code.
    */
  def reconstruct(
      v: ArrayData, cb: Array[Double], m0: Int, k0: Int,
      subDim: Int): ArrayData = {
    if (v.numElements() != m0 * subDim) return null
    var i = 0
    while (i < m0 * subDim) {
      if (v.isNullAt(i)) return null
      i += 1
    }
    val out = new Array[Double](m0 * subDim)
    var m = 0
    while (m < m0) {
      var bestK = 0
      var bestS = Double.NegativeInfinity
      var k = 0
      while (k < k0) {
        var d = 0.0
        val off = (m * k0 + k) * subDim
        var j = 0
        while (j < subDim) {
          d += v.getDouble(m * subDim + j) * cb(off + j)
          j += 1
        }
        if (d > bestS) { bestS = d; bestK = k }
        k += 1
      }
      System.arraycopy(cb, (m * k0 + bestK) * subDim, out, m * subDim, subDim)
      m += 1
    }
    new GenericArrayData(out)
  }

  /** The L2 variant (FAISS's actual codeword assignment): codeword =
    * argmin ‖v_sub − cw‖², computed as argmax of
    * dot(v_sub, cw) − ‖cw‖²/2 — algebraically identical (‖v_sub‖² is
    * constant across k) and, unlike a subtract-then-square spelling,
    * made of exactly the pieces the DuckDB oracle can reproduce
    * bit-for-bit: a left-fold dot, a left-fold self-dot, one exact
    * halving, one subtraction. `biasHalf(m·K + k) = ‖cw‖²/2`,
    * precomputed from the codebook (control data).
    */
  def reconstructL2(
      v: ArrayData, cb: Array[Double], biasHalf: Array[Double], m0: Int,
      k0: Int, subDim: Int): ArrayData = {
    if (v.numElements() != m0 * subDim) return null
    var i = 0
    while (i < m0 * subDim) {
      if (v.isNullAt(i)) return null
      i += 1
    }
    val out = new Array[Double](m0 * subDim)
    var m = 0
    while (m < m0) {
      var bestK = 0
      var bestS = Double.NegativeInfinity
      var k = 0
      while (k < k0) {
        var d = 0.0
        val off = (m * k0 + k) * subDim
        var j = 0
        while (j < subDim) {
          d += v.getDouble(m * subDim + j) * cb(off + j)
          j += 1
        }
        val s = d - biasHalf(m * k0 + k)
        if (s > bestS) { bestS = s; bestK = k }
        k += 1
      }
      System.arraycopy(cb, (m * k0 + bestK) * subDim, out, m * subDim, subDim)
      m += 1
    }
    new GenericArrayData(out)
  }

  /** Column entry point: `reconstructed($"v", codebook)`. */
  def reconstructed(c: Column, cb: Seq[Seq[Seq[Double]]]): Column =
    Bridge.column(PqReconstruct(Bridge.expression(c), cb))

  /** Column entry point for the L2 flavor: `reconstructedL2($"v", cb)`. */
  def reconstructedL2(c: Column, cb: Seq[Seq[Seq[Double]]]): Column =
    Bridge.column(PqReconstruct(Bridge.expression(c), cb, l2 = true))
}

case class PqReconstruct(
    child: Expression, codebook: Seq[Seq[Seq[Double]]], l2: Boolean = false)
    extends UnaryExpression {

  private val m0 = codebook.length
  private val k0 = codebook.head.length
  private val subDim = codebook.head.head.length
  private lazy val flat: Array[Double] = codebook.flatten.flatten.toArray
  // ‖cw‖²/2 per (m, k), the L2 argmin's bias term — the self-dot runs
  // the same ascending-index left fold as the oracle's
  // list_dot_product(cwv, cwv), and /2 is exact
  private lazy val biasHalf: Array[Double] =
    Array.tabulate(m0 * k0) { mk =>
      var s = 0.0
      var j = 0
      while (j < subDim) {
        s += flat(mk * subDim + j) * flat(mk * subDim + j)
        j += 1
      }
      s / 2
    }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"pq_reconstruct needs array<double>, got $t")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_reconstruct"

  override protected def nullSafeEval(input: Any): Any =
    if (l2)
      PqCodec.reconstructL2(
        input.asInstanceOf[ArrayData], flat, biasHalf, m0, k0, subDim)
    else
      PqCodec.reconstruct(
        input.asInstanceOf[ArrayData], flat, m0, k0, subDim)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", flat, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("rv")
      val call =
        if (l2) {
          val biasRef = ctx.addReferenceObj("pqBiasHalf", biasHalf, "double[]")
          s"graft.functions.PqCodec.reconstructL2($a, $cbRef, $biasRef, $m0, $k0, $subDim)"
        } else {
          s"graft.functions.PqCodec.reconstruct($a, $cbRef, $m0, $k0, $subDim)"
        }
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out = $call;
         |if ($out == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): PqReconstruct =
    copy(child = c)
}
