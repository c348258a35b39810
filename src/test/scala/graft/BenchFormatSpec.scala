package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** Pins the bench artifact format against the two failure modes that
  * cost rounds 1 and 6 their official numbers:
  *
  *  - the driver's stdout tail buffer clips long lines (round 6: a
  *    94-query ms-precision map ≈ 2.6 KB lost its leading `{` →
  *    "parsed": null) — so the stdout line must stay a few hundred
  *    bytes NO MATTER how many queries are registered, which it can
  *    only do by not containing a per-query map at all;
  *  - both JSON emitters are hand-rolled string builders, so a real
  *    parser must accept their output (quoting, locale decimals).
  */
class BenchFormatSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  test("stdout line stays under 400 bytes regardless of registry size and parses") {
    // The registry is the worst case the driver actually runs — its
    // size must not leak into the line (only the COUNT appears).
    val n = SparkEntry.queries.size
    val line = Bench.stdoutLine(1234.567, n,
      Seq("d5_embedding_neardup", "s9_mips_topk"), "/root/testdata/sf0.1",
      (12.34, 8.56))
    assert(line.length < 400, s"stdout line ${line.length}B: $line")
    assert(!line.contains("t1_sentence_split"),
      "per-query keys belong in the file artifact, not the stdout line")
    val js = mapper.readTree(line)
    assert(js.get("metric").asText == "total")
    assert(js.get("value").asDouble == 1234.567)
    assert(js.get("nqueries").asInt == n)
    assert(js.get("failed").size == 2)
    assert(js.get("queries_file").asText == "BENCH_RESULT.json")
    // r13 protocol pins: the headline statistic is named and the load
    // markers travel with the number they contextualize
    assert(js.get("stat").asText == "median")
    assert(js.get("load").size == 2 && js.get("load").get(0).asDouble == 12.34)
  }

  test("median statistic: odd and even rep counts, one-burst robustness") {
    assert(Bench.median(Seq(0.5, 0.45, 9.99, 0.46, 0.44)) == 0.46,
      "one contention burst must not move the median")
    assert(Bench.median(Seq(2.0, 1.0)) == 1.5)
    assert(Bench.median(Seq(7.0)) == 7.0)
  }

  test("file artifact carries medians, mins AND raw per-rep samples, parseable") {
    // Full real key set + synthetic times: the file has no size budget,
    // but it must parse and expose the per-rep samples that make a
    // contention burst visible in the artifact itself.
    val names = SparkEntry.queries.keys.toSeq.sorted
    val reps = names.map(n => n -> Seq(0.5, 0.45, 9.99, 0.46, 0.44))
    val meds = reps.map { case (n, ts) => n -> Bench.median(ts) }
    val mins = reps.map { case (n, ts) => n -> ts.min }
    val js = mapper.readTree(
      Bench.fileJson(meds, mins, reps, Nil, "/tmp/sf", (1.0, 2.0)))
    assert(js.get("queries").size == names.size)
    assert(js.get("reps").size == names.size)
    val first = js.get("reps").get(names.head)
    assert(first.size == 5 && first.get(2).asDouble == 9.99)
    assert(js.get("queries").get(names.head).asDouble == 0.46,
      "the headline per-query number is the MEDIAN")
    assert(js.get("mins").get(names.head).asDouble == 0.44)
    assert(js.get("stat").asText == "median")
    assert(js.get("load").size == 2)
    assert(js.get("value").asDouble > 0)
  }

  test("total is the sum of per-query medians") {
    val reps = Seq("a" -> Seq(1.0, 3.0), "b" -> Seq(2.0, 10.0))
    val meds = reps.map { case (n, ts) => n -> Bench.median(ts) }
    val mins = reps.map { case (n, ts) => n -> ts.min }
    val js = mapper.readTree(
      Bench.fileJson(meds, mins, reps, Nil, "/tmp/sf", (1.0, 2.0)))
    assert(js.get("value").asDouble == 8.0)
  }
}
