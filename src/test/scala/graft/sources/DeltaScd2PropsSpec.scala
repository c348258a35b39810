package graft.sources

import java.nio.file.Files
import scala.util.Random

import graft.SparkSpec

/** Generative check of the SCD2 Delta merge: for RANDOM observation
  * streams split into RANDOM chronological batches, the incremental
  * fold through [[DeltaScd2.merge]] must equal the w21 gaps-and-islands
  * rule applied to the full stream — batching is an implementation
  * detail, never a semantics change.
  */
class DeltaScd2PropsSpec extends SparkSpec {
  import spark.implicits._

  /** The w21 rule by hand: per key, order by (tus, event_id), collapse
    * consecutive equal states into versions, chain valid_to, last is
    * current.
    */
  private def model(
      all: Seq[(Long, String, Long, Long)]): Seq[(Long, Long, String, Long, Long, Boolean)] =
    all.groupBy(_._1).toSeq.flatMap { case (user, evs) =>
      val ordered = evs.sortBy(e => (e._3, e._4))
      val runs = ordered.foldLeft(Vector.empty[(String, Long)]) {
        case (acc, (_, state, tus, _)) =>
          if (acc.nonEmpty && acc.last._1 == state) acc
          else acc :+ (state, tus)
      }
      runs.zipWithIndex.map { case ((state, from), i) =>
        val to = if (i + 1 < runs.size) runs(i + 1)._2 else -1L
        (user, (i + 1).toLong, state, from, to, to == -1L)
      }
    }.sortBy(x => (x._1, x._2))

  test("random batched merges equal the from-scratch w21 fold") {
    for (seed <- Seq(5L, 59L, 211L)) {
      val rnd = new Random(seed)
      val t = Files.createTempDirectory(s"scd2_prop_$seed")
        .resolve("dim").toString
      val states = Vector("a", "b", "c")
      val nEvents = 12 + rnd.nextInt(20)
      // unique strictly-increasing tus keeps batches chronological
      val all = (0 until nEvents).map { i =>
        (rnd.nextInt(4).toLong, states(rnd.nextInt(states.size)),
          (i + 1) * 10L, (i + 100).toLong)
      }
      // random chronological cut points → 1..5 batches
      val nBatches = 1 + rnd.nextInt(5)
      val cuts = (Seq(0, nEvents) ++
        Seq.fill(nBatches - 1)(rnd.nextInt(nEvents + 1))).distinct.sorted
      val batches = cuts.zip(cuts.tail).map { case (a, b) =>
        all.slice(a, b)
      }.filter(_.nonEmpty)
      batches.foreach { b =>
        // shuffle WITHIN the batch: merge must re-order internally
        DeltaScd2.merge(spark, t,
          rnd.shuffle(b).toDF("user_id", "event_type", "tus", "event_id"))
      }
      val got = DeltaLog.read(spark, t)
        .select("user_id", "version", "event_type",
          "valid_from_us", "valid_to_us", "is_current")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getLong(3), r.getLong(4), r.getBoolean(5)))
        .toSeq.sortBy(x => (x._1, x._2))
      val want = model(all)
      assert(got == want,
        s"seed $seed (${batches.size} batches): merged dim diverged\n" +
          s" got: $got\nwant: $want")
    }
  }
}
