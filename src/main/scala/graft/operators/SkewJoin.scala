package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for large joins (100 TB posture, SURVEY.md §7.2 M4):
  * when one join key holds a disproportionate share of rows, a plain
  * shuffle join sends that key's entire volume to one task. Salting
  * splits each hot key across `salts` tasks: the big side gets a
  * deterministic salt column, the small side is replicated once per
  * salt value, and the join key becomes (key, salt).
  *
  * AQE's skew-join handling covers sort-merge joins automatically; this
  * helper is for the cases AQE can't rewrite (e.g. aggregations after
  * the join keyed the same way, or non-SMJ plans).
  */
object SkewJoin {

  /** Inner equi-join of `big` ⋈ `small` on `key`, salted `salts` ways.
    * Result set is identical to `big.join(small, key)` — only the
    * physical distribution changes (each small-side row is replicated
    * `salts` times; big-side rows are spread by a per-row salt).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    // The salt must be a pure function of row CONTENT: a positional
    // source (monotonically_increasing_id) is not stable under task
    // retry / upstream-shuffle recomputation (the SPARK-23207 class of
    // bug) — a retried partition would re-salt rows differently and
    // duplicate or drop join output. Hash of all big-side columns is
    // retry-stable and spreads hot keys as long as the non-key columns
    // vary (identical full rows co-locate, which is harmless).
    val saltedBig = big.withColumn(
      "__salt", pmod(xxhash64(big.columns.map(col): _*), lit(salts.toLong)))
    val replicatedSmall = small.withColumn(
      "__salt", explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig
      .join(replicatedSmall, Seq(key, "__salt"))
      .drop("__salt")
  }
}
