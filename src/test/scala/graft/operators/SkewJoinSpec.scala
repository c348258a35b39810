package graft.operators

import graft.SparkSpec

/** Salted join: same result set as the plain join, any salt width. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join result set equals the plain join") {
    // heavily skewed big side: 90% of rows share key 1
    val big = ((1 to 900).map(i => (1L, i)) ++ (1 to 100).map(i => (2L, i)))
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "cold"), (3L, "unmatched")).toDF("k", "v")
    val plain = big.join(small, Seq("k"))
    for (salts <- Seq(1, 4, 16)) {
      val salted = SkewJoin.saltedJoin(big, small, "k", salts)
      assert(salted.count() == plain.count())
      assert(salted.except(plain).count() == 0)
      assert(plain.except(salted).count() == 0)
    }
  }
}
