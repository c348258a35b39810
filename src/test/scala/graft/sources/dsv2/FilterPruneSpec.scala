package graft.sources.dsv2

import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite

/** Pure unit coverage of the file-admission logic both DSv2 scans
  * prune with. The contract under test: `admits` returns false ONLY
  * when no row of the file can satisfy the filter — every undecidable
  * case must keep.
  */
class FilterPruneSpec extends AnyFunSuite {

  private def stats(
      exactVals: Map[String, Option[Any]] = Map.empty,
      mins: Map[String, Any] = Map.empty,
      maxs: Map[String, Any] = Map.empty,
      allNulls: Set[String] = Set.empty): FilterPrune.ColumnStats =
    new FilterPrune.ColumnStats {
      override def exact(c: String) = exactVals.get(c)
      override def min(c: String) = mins.get(c)
      override def max(c: String) = maxs.get(c)
      override def allNull(c: String) =
        if (allNulls(c)) Some(true)
        else if (mins.contains(c)) Some(false) else None
      override def mayHaveNull(c: String) = !mins.contains(c)
    }

  private val ranged = stats(
    mins = Map("k" -> BigDecimal(10), "s" -> "ccc"),
    maxs = Map("k" -> BigDecimal(20), "s" -> "ppp"))

  test("range stats: in/out/straddle, strict bounds conservative") {
    assert(FilterPrune.admits(ranged, EqualTo("k", 15)))
    assert(!FilterPrune.admits(ranged, EqualTo("k", 25)))
    assert(!FilterPrune.admits(ranged, GreaterThan("k", 30)))
    assert(FilterPrune.admits(ranged, GreaterThan("k", 20))) // conservative
    assert(!FilterPrune.admits(ranged, LessThan("k", 5)))
    assert(FilterPrune.admits(ranged, In("k", Array(1, 15))))
    assert(!FilterPrune.admits(ranged, In("k", Array(1, 2))))
    assert(!FilterPrune.admits(ranged,
      And(GreaterThanOrEqual("k", 12), EqualTo("k", 25))))
    assert(FilterPrune.admits(ranged,
      Or(EqualTo("k", 25), EqualTo("k", 12))))
    // unknown column: keep
    assert(FilterPrune.admits(ranged, EqualTo("unknown", 1)))
  }

  test("all-null files never match ranges; IsNull/IsNotNull decide") {
    val s = stats(mins = Map("k" -> BigDecimal(1)),
      maxs = Map("k" -> BigDecimal(9)), allNulls = Set("n"))
    assert(!FilterPrune.admits(s, EqualTo("n", 5)))
    assert(FilterPrune.admits(s, IsNull("n")))
    assert(!FilterPrune.admits(s, IsNotNull("n")))
    assert(FilterPrune.admits(s, IsNotNull("k")))
    assert(!FilterPrune.admits(s, IsNull("k"))) // provably no nulls
  }

  test("exact partition values: equality, Not, In, comparisons") {
    val p3 = stats(exactVals = Map("grp" -> Some(BigDecimal(3)),
      "tag" -> Some("west"), "gone" -> None))
    assert(FilterPrune.admits(p3, EqualTo("grp", 3)))
    assert(!FilterPrune.admits(p3, EqualTo("grp", 4)))
    // Not pruning: the whole file IS grp=3, so Not(grp=3) drops it
    assert(!FilterPrune.admits(p3, Not(EqualTo("grp", 3))))
    assert(FilterPrune.admits(p3, Not(EqualTo("grp", 4))))
    assert(!FilterPrune.admits(p3, Not(In("grp", Array(3, 7)))))
    assert(FilterPrune.admits(p3, Not(In("grp", Array(4, 7)))))
    assert(!FilterPrune.admits(p3, GreaterThan("grp", 3)))
    assert(FilterPrune.admits(p3, GreaterThanOrEqual("grp", 3)))
    assert(!FilterPrune.admits(p3, Not(LessThanOrEqual("grp", 5))))
    // null partition value
    assert(!FilterPrune.admits(p3, EqualTo("gone", 1)))
    assert(FilterPrune.admits(p3, IsNull("gone")))
    assert(!FilterPrune.admits(p3, IsNotNull("gone")))
    assert(FilterPrune.admits(p3, Not(EqualTo("gone", 1)))) // null: keep
    // string exacts
    assert(!FilterPrune.admits(p3, Not(EqualTo("tag", "west"))))
    assert(FilterPrune.admits(p3, StringStartsWith("tag", "we")))
    assert(!FilterPrune.admits(p3, StringStartsWith("tag", "ea")))
  }

  test("StringStartsWith prunes on string min/max bounds") {
    // s in [ccc, ppp]
    assert(FilterPrune.admits(ranged, StringStartsWith("s", "d")))
    assert(FilterPrune.admits(ranged, StringStartsWith("s", "ccc")))
    assert(FilterPrune.admits(ranged, StringStartsWith("s", "p")))
    assert(!FilterPrune.admits(ranged, StringStartsWith("s", "q")))
    assert(!FilterPrune.admits(ranged, StringStartsWith("s", "a")))
    assert(!FilterPrune.admits(ranged, StringStartsWith("s", "zzz")))
    // non-string stats: keep
    assert(FilterPrune.admits(ranged, StringStartsWith("k", "1")))
  }

  test("temporal stats compare in the time domain, not lexicographically") {
    // delta-spark writes ISO 'T'; java.sql.Timestamp prints a space —
    // 'T' > ' ' would invert same-day bounds lexicographically
    val s = stats(
      mins = Map("ts" -> "2026-01-05T10:00:00.000Z"),
      maxs = Map("ts" -> "2026-01-05T18:00:00.000Z"))
    val noon = java.sql.Timestamp.valueOf("2026-01-05 12:00:00")
    assert(FilterPrune.admits(s, EqualTo("ts", noon)))
    val nextDay = java.sql.Timestamp.valueOf("2026-01-06 12:00:00")
    assert(!FilterPrune.admits(s, EqualTo("ts", nextDay)))
    assert(!FilterPrune.admits(s, GreaterThanOrEqual("ts", nextDay)))
  }
}
