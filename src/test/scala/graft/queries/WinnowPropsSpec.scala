package graft.queries

import graft.SparkSpec
import scala.util.Random

/** Generative check of the winnowing guarantee (Schleimer et al. 2003,
  * Theorem: any shared substring of length ≥ w + k − 1 tokens yields at
  * least one shared selected fingerprint), on constructed documents —
  * the corpus test in Round5OpsSpec only exercises the planted pairs.
  */
class WinnowPropsSpec extends SparkSpec {
  import spark.implicits._

  private val RunLen = Dedup.WinnowWindow + Dedup.KGramWords - 1 // 6

  private def wordsDf(docs: Seq[(Long, Seq[String])]) =
    docs.flatMap { case (id, ws) =>
      ws.zipWithIndex.map { case (w, p) => (id, p.toLong, w) }
    }.toDF("doc_id", "pos", "word")

  private def fps(docs: Seq[(Long, Seq[String])]): Map[Long, Set[Long]] =
    Dedup.winnowedFingerprintsFrom(wordsDf(docs)).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      .withDefaultValue(Set.empty[Long])

  test("a shared >= w+k-1 token run always yields a shared fingerprint") {
    val rnd = new Random(42)
    val alphabet = (0 until 200).map(i => s"w$i")
    for (trial <- 1 to 5) {
      val run = Seq.fill(RunLen + rnd.nextInt(4))(alphabet(rnd.nextInt(alphabet.size)))
      def doc() = {
        val pre = Seq.fill(10 + rnd.nextInt(40))(alphabet(rnd.nextInt(alphabet.size)))
        val post = Seq.fill(10 + rnd.nextInt(40))(alphabet(rnd.nextInt(alphabet.size)))
        pre ++ run ++ post
      }
      val m = fps(Seq((1L, doc()), (2L, doc())))
      assert(m(1L).intersect(m(2L)).nonEmpty,
        s"trial $trial: no shared fingerprint despite a shared $RunLen+-token run")
    }
  }

  test("disjoint-vocabulary documents share no fingerprints") {
    val a = (0 until 60).map(i => s"a$i")
    val b = (0 until 60).map(i => s"b$i")
    val m = fps(Seq((1L, a), (2L, b)))
    assert(m(1L).nonEmpty && m(2L).nonEmpty)
    assert(m(1L).intersect(m(2L)).isEmpty)
  }

  test("fingerprints are position-robust: a long prefix shift preserves the run's fingerprint") {
    // same run embedded at very different offsets still collides —
    // the hash carries content only; position rides in the low bits
    // and is stripped for matching
    val rnd = new Random(7)
    val alphabet = (0 until 100).map(i => s"v$i")
    val run = Seq.fill(RunLen)(alphabet(rnd.nextInt(alphabet.size)))
    val short = Seq.fill(5)(alphabet(rnd.nextInt(alphabet.size))) ++ run
    val long = Seq.fill(400)(alphabet(rnd.nextInt(alphabet.size))) ++ run
    val m = fps(Seq((1L, short), (2L, long)))
    assert(m(1L).intersect(m(2L)).nonEmpty)
  }
}
