package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** A7 as a typed `Aggregator` (SURVEY §2.8 / §4 optional polish): the
  * ordered-concat reduce (`lambda_5.py:71-81`) without materializing a
  * sorted struct array per group — the buffer keeps (chunk_num, text)
  * pairs and sorts once at reduction end. Equivalent results to the
  * `array_sort(collect_list(struct(...)))` built-in formulation (which
  * remains the default in Transcripts.reduceTranscripts); this form
  * exists for groups long enough that the per-row struct allocation
  * matters, and as the engine's reference `Aggregator` implementation.
  *
  * Usage:
  * {{{
  *   chunks.as[(Long, Int, String)]
  *     .groupByKey(_._1)
  *     .agg(OrderedConcat.toColumn)
  * }}}
  */
object OrderedConcat
    extends Aggregator[(Long, Int, String), mutable.ArrayBuffer[(Int, String)], String] {

  override def zero: mutable.ArrayBuffer[(Int, String)] =
    mutable.ArrayBuffer.empty

  override def reduce(
      buf: mutable.ArrayBuffer[(Int, String)],
      row: (Long, Int, String)): mutable.ArrayBuffer[(Int, String)] = {
    buf += ((row._2, row._3)); buf
  }

  override def merge(
      a: mutable.ArrayBuffer[(Int, String)],
      b: mutable.ArrayBuffer[(Int, String)]): mutable.ArrayBuffer[(Int, String)] = {
    a ++= b; a
  }

  override def finish(buf: mutable.ArrayBuffer[(Int, String)]): String =
    buf.sortBy(_._1).iterator.map(_._2).mkString(" ")

  override def bufferEncoder: Encoder[mutable.ArrayBuffer[(Int, String)]] =
    Encoders.kryo[mutable.ArrayBuffer[(Int, String)]]

  override def outputEncoder: Encoder[String] = Encoders.STRING
}
