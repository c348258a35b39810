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

  /** Column entry point: `reconstructed($"v", codebook)`. */
  def reconstructed(c: Column, cb: Seq[Seq[Seq[Double]]]): Column =
    Bridge.column(PqReconstruct(Bridge.expression(c), cb))
}

case class PqReconstruct(child: Expression, codebook: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  private val m0 = codebook.length
  private val k0 = codebook.head.length
  private val subDim = codebook.head.head.length
  private lazy val flat: Array[Double] = codebook.flatten.flatten.toArray

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
    PqCodec.reconstruct(
      input.asInstanceOf[ArrayData], flat, m0, k0, subDim)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", flat, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("rv")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  graft.functions.PqCodec.reconstruct($a, $cbRef, $m0, $k0, $subDim);
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
