package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** One assertion per SURVEY §2.2 scalar row. */
class ScalarOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c).head().get(0)

  test("S1 url-encode spaces") {
    assert(one(ScalarOps.urlEncodeSpaces(lit("the ringer show"))) == "the+ringer+show")
  }
  test("S2 feed-link predicate") {
    assert(one(ScalarOps.looksLikeFeed(lit("https://x/feeds/a"))) == true)
    assert(one(ScalarOps.looksLikeFeed(lit("https://x/about"))) == false)
  }
  test("S3 last path segment") {
    assert(one(ScalarOps.lastPathSegment(lit("a/b/chunk_3.json"))) == "chunk_3.json")
  }
  test("S4 trailing number") {
    assert(one(ScalarOps.trailingNumber(lit("episode_id_42"))) == 42L)
  }
  test("S5 job-name sanitize") {
    assert(one(ScalarOps.sanitizeJobName(lit("a_b.c/d"))) == "a-b-c-d")
  }
  test("S6 mp3 to json suffix") {
    assert(one(ScalarOps.mp3ToJson(lit("ep1.mp3"))) == "ep1.json")
    assert(one(ScalarOps.mp3ToJson(lit("mp3.ep"))) == "mp3.ep") // anchored
  }
  test("S7 folder name") {
    assert(one(ScalarOps.folderName(lit("The Ringer Show"))) == "the_ringer_show")
  }
  test("S8 entity key lowercase") {
    assert(one(ScalarOps.entityKey(lit("Bob"))) == "bob")
  }
  test("S11 net sentiment") {
    val v = one(ScalarOps.netSentiment(lit(0.7), lit(0.2))).asInstanceOf[Double]
    assert(math.abs(v - 0.5) < 1e-12)
  }
  test("S14 newline append") {
    assert(one(length(ScalarOps.withNewline(lit("abc")))) == 4)
  }
  test("S15 newline flatten") {
    assert(one(ScalarOps.flattenNewlines(lit("a\nb"))) == "a b")
  }
  test("S16 param defaulting") {
    assert(one(ScalarOps.paramOrDefault(lit(null).cast("string"), lit("PERSON"))) == "PERSON")
    assert(one(ScalarOps.paramOrDefault(lit("ORG"), lit("PERSON"))) == "ORG")
  }
  test("A9 count equality check") {
    val a = Seq(1, 2, 3).toDF("x")
    assert(DataQuality.countsMatch(a, a))
    assert(!DataQuality.countsMatch(a, a.limit(2)))
    intercept[IllegalArgumentException] {
      DataQuality.requireCountsMatch(a, a.limit(2), "sentences vs scores")
    }
  }
}
