package graft.functions

/** The 2-D Morton (Z-order) interleave as a SQL expression STRING —
  * Σ_i bit_i(x)·4^i + bit_i(y)·2·4^i written as pure non-negative
  * integer arithmetic (`(v div 2^i) % 2`), so ONE builder emits
  * bit-identical expressions for Spark and the DuckDB oracle (only
  * the integer-division spelling differs: `div` vs `//`). Shared by
  * p13's layout audit (`graft.queries.TrainingSet`) and the Delta
  * `OPTIMIZE ZORDER` write path (`graft.sources.DeltaExport.zorder`).
  */
object ZOrder {

  /** `bits` interleaved per dimension (2·bits-bit z value). `x`/`y`
    * must already be non-negative expressions (callers apply
    * `% 2^bits` / `pmod`).
    */
  def exprStr(
      x: String, y: String, bits: Int,
      div: (String, Long) => String): String =
    (0 until bits).map { i =>
      s"((${div(x, 1L << i)}) % 2) * ${1L << (2 * i)}" +
        s" + ((${div(y, 1L << i)}) % 2) * ${1L << (2 * i + 1)}"
    }.mkString("(", " + ", ")")
}
