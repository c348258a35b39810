package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.graftext.Bridge
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe as a codegen'd Catalyst predicate —
  * the upgrade path for the two row-at-a-time Scala UDF probes the
  * engine used to carry (x20's runtime-filter join, p10's benchmark
  * decontamination), the last per-row lambdas in hot scan paths.
  *
  * Spark's own AQE runtime filter probes with the
  * `BloomFilterMightContain` expression; this wrapper reuses exactly
  * that expression (public Catalyst API) against a filter built by
  * `DataFrame.stat.bloomFilter`: both sides hash longs with the same
  * `BloomFilterImpl` Murmur3 scheme, so `mightContainLong` over the
  * serialized bytes is bit-identical to the UDF's `mightContain(key)`
  * (pinned in `BloomProbeSpec`). The filter rides the expression as a
  * foldable binary literal: codegen turns it into ONE deserialized
  * reference object per generated class, and the task binary that
  * carries it is itself torrent-broadcast per stage — executors fetch
  * the bits once, the same once-per-executor story the explicit
  * `sparkContext.broadcast` gave the UDF, but with the probe inside
  * WholeStageCodegen instead of a boxed lambda call per row.
  *
  * String keys have no `mightContain` expression form — probe
  * `xxhash64(key)` longs on BOTH build and probe sides instead (the
  * p10 spelling): determinism is preserved and the only cost is the
  * vanishing extra false-positive mass of 64-bit hash collisions,
  * which the bloom's ≥1% fpp already dominates.
  */
object BloomProbe {

  /** The wire form `BloomFilterMightContain` deserializes. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** `bf.mightContainLong(key)` as a codegen'd predicate; `key` must
    * be a BIGINT column.
    */
  def mightContainLong(bfBytes: Array[Byte], key: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal(bfBytes, BinaryType),
      Bridge.expression(key)))

  def mightContainLong(bf: BloomFilter, key: Column): Column =
    mightContainLong(serialize(bf), key)
}
