package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The Iceberg table spec's `bucket[N]` transform hash —
  * murmur3_x86_32(seed 0) over the spec's canonical byte encodings
  * (int/long/date widen to 8-byte little-endian, strings hash their
  * UTF-8 bytes), then `(hash & Int.MaxValue) % N`.
  *
  * Static entry points shared by interpreted eval and generated code
  * (no companion class → Scala emits static forwarders Janino can
  * call directly — the [[TextNorm]] discipline).
  */
object BucketHash {

  /** murmur3_x86_32 over `bytes` — the spec's hash (Appendix B). */
  def murmur3(bytes: Array[Byte], seed: Int): Int = {
    val c1 = 0xcc9e2d51; val c2 = 0x1b873593
    var h = seed
    val n = bytes.length / 4 * 4
    var i = 0
    while (i < n) {
      var k = (bytes(i) & 0xFF) | ((bytes(i + 1) & 0xFF) << 8) |
        ((bytes(i + 2) & 0xFF) << 16) | ((bytes(i + 3) & 0xFF) << 24)
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2
      h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
      i += 4
    }
    var k = 0
    (bytes.length & 3) match {
      case 3 =>
        k ^= (bytes(n + 2) & 0xFF) << 16
        k ^= (bytes(n + 1) & 0xFF) << 8
        k ^= bytes(n) & 0xFF
      case 2 =>
        k ^= (bytes(n + 1) & 0xFF) << 8
        k ^= bytes(n) & 0xFF
      case 1 => k ^= bytes(n) & 0xFF
      case _ =>
    }
    if ((bytes.length & 3) != 0) {
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2; h ^= k
    }
    h ^= bytes.length
    h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13
    h *= 0xc2b2ae35; h ^= h >>> 16
    h
  }

  /** bucket over an int/long/date value — the 8-byte little-endian
    * encoding inlined as two 4-byte murmur blocks (no allocation on
    * the per-row hot path; bit-identical to hashing `longLeBytes`).
    */
  def bucketLong(v: Long, n: Int): Int = {
    val c1 = 0xcc9e2d51; val c2 = 0x1b873593
    var h = 0
    var k = (v & 0xFFFFFFFFL).toInt
    k *= c1; k = Integer.rotateLeft(k, 15); k *= c2
    h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
    k = (v >>> 32).toInt
    k *= c1; k = Integer.rotateLeft(k, 15); k *= c2
    h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
    h ^= 8
    h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13
    h *= 0xc2b2ae35; h ^= h >>> 16
    (h & Int.MaxValue) % n
  }

  /** bucket over a string's UTF-8 bytes (UTF8String already holds
    * them — no re-encode).
    */
  def bucketUtf8(s: UTF8String, n: Int): Int =
    (murmur3(s.getBytes, 0) & Int.MaxValue) % n
}

/** `iceberg_bucket(col, N)` as a codegen'd Catalyst expression (r15 —
  * the r14 verdict's write-side-UDF nit): the bucketed-write staging
  * column stays inside whole-stage codegen instead of crossing a
  * ScalaUDF boundary per row. int/long inputs arrive pre-cast to
  * LongType by the caller; DateType's int days widen in-place.
  */
case class IcebergBucket(child: Expression, buckets: Int)
    extends UnaryExpression {
  require(buckets > 0, s"bucket[$buckets] needs N > 0")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case IntegerType | LongType | DateType | StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"iceberg_bucket supports int/long/date/string inputs, got $other")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "iceberg_bucket"

  override protected def nullSafeEval(input: Any): Any =
    child.dataType match {
      case StringType =>
        BucketHash.bucketUtf8(input.asInstanceOf[UTF8String], buckets)
      case LongType =>
        BucketHash.bucketLong(input.asInstanceOf[Long], buckets)
      case _ => // IntegerType | DateType (int days)
        BucketHash.bucketLong(input.asInstanceOf[Int].toLong, buckets)
    }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev, c =>
          s"graft.functions.BucketHash.bucketUtf8($c, $buckets)")
      case _ =>
        defineCodeGen(ctx, ev, c =>
          s"graft.functions.BucketHash.bucketLong((long) $c, $buckets)")
    }

  override protected def withNewChildInternal(c: Expression): IcebergBucket =
    copy(child = c)
}
