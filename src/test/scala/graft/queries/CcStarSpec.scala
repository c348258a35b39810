package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** d18 star-contraction connected components:
  *   - on the live LSH graph the labels equal d9's propagation
  *     fixpoint row-for-row (two algorithms, one answer);
  *   - on a planted 64-vertex PATH (diameter 63 — propagation's worst
  *     case) contraction converges in O(log² n) round pairs, the whole
  *     point of the algorithm;
  *   - planted multi-component graphs label each component by its
  *     minimum, isolated vertices never appear (edge-vertex-only
  *     contract shared with d9).
  */
class CcStarSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("d18 equals d9 row-for-row on the live near-dup graph") {
    val star = Dedup.ccStar(spark, dir)
    val prop = Dedup.dedupClusters(spark, dir)
    assert(star.exceptAll(prop).isEmpty && prop.exceptAll(star).isEmpty,
      "star contraction and min-label propagation must agree")
  }

  test("a diameter-63 path converges in logarithmic rounds") {
    val path = (0L until 63L).map(i => (i, i + 1)).toDF("u", "v")
    val (labels, rounds) = Dedup.starContract(path)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 63L).map(_ -> 0L).toMap)
    // propagation would need 63 rounds here; star height halves per
    // round pair → well under log²(64)+c. Pin a generous ceiling so a
    // future regression to linear rounds fails loudly.
    assert(rounds <= 10, s"path took $rounds round pairs")
  }

  test("components label by their minimum; isolated vertices absent") {
    val edges = Seq(
      (5L, 9L), (9L, 7L),            // component min 5
      (20L, 30L), (30L, 20L),        // duplicate + reversed edges
      (40L, 40L)                     // self-loop only → drops out
    ).toDF("u", "v")
    val (labels, _) = Dedup.starContract(edges)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got ==
      Map(5L -> 5L, 7L -> 5L, 9L -> 5L, 20L -> 20L, 30L -> 20L))
  }

  test("empty edge set yields empty labels without iterating") {
    val empty = Seq.empty[(Long, Long)].toDF("u", "v")
    val (labels, rounds) = Dedup.starContract(empty)
    assert(labels.isEmpty && rounds == 0)
  }
}
