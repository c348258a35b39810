package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftext.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The m7 perceptual-hash signature as one fused loop — bit b of the
  * result is the md5-parity of the b-th [[Phash.RegionHex]]-char slice
  * of the (hex-spelled) content.
  *
  * Why a custom Expression (SURVEY.md §4 preference order b, the
  * SrpSignature precedent): the declarative spelling is 60 independent
  * `shiftleft(conv(substring(md5(substring(...)))))` terms — an
  * expression tree large enough to fall OUT of whole-stage codegen
  * entirely (measured: the 60-term projection ran interpreted; the
  * first fix reshaped it as explode + re-aggregate, which codegens but
  * pays a 60× row fan-out and a hash aggregate). This expression is
  * the per-row projection that shape approximated: one static call,
  * no fan-out, no aggregate — the signature rides the scan.
  *
  * The math is EXACTLY the declarative fold: region b = bytes
  * [b·16, b·16+16) of the hex string (regions past a short item's end
  * hash the empty slice — both engines' `substring` semantics), bit =
  * low bit of md5's first hex nibble = bit 4 of digest byte 0.
  * `PhashSignatureSpec` pins bit-equivalence to the declarative fold
  * on the corpus AND on short/empty edge rows, so the two spellings
  * cannot drift.
  */
object Phash {

  /** Signature width in bits (= content regions hashed). 60 keeps
    * every shift inside a nonnegative BIGINT in both engines.
    */
  val Bits = 60

  /** Hex chars per region (8 content bytes). */
  val RegionHex = 16

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static entry point shared by interpreted eval and generated code
    * (Scala emits a static forwarder Janino calls directly).
    */
  def signature(s: UTF8String): Long = {
    val bytes = s.getBytes
    val md = md5.get()
    var sig = 0L
    var b = 0
    while (b < Bits) {
      md.reset()
      val start = b * RegionHex
      if (start < bytes.length)
        md.update(bytes, start, math.min(RegionHex, bytes.length - start))
      // first md5 hex char = high nibble of digest byte 0; its parity
      // is bit 4 of the byte
      if (((md.digest()(0) >> 4) & 1) == 1) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** `phashSignature($"hx")` — the column-level entry point over the
    * hex-spelled content.
    */
  def phashSignature(c: Column): Column =
    Bridge.column(PhashSignature(Bridge.expression(c)))
}

/** The Catalyst expression tier: `doGenCode` emits a single static
  * call, so the signature stays inside whole-stage codegen.
  */
case class PhashSignature(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"phash_signature needs string (hex content), got $t")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "phash_signature"

  override protected def nullSafeEval(input: Any): Any =
    Phash.signature(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.Phash.signature($a)")

  override protected def withNewChildInternal(c: Expression): PhashSignature =
    copy(child = c)
}
