package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.graftext.Bridge

/** One-call SQL registration for every graft expression with a
  * SQL-expressible signature — so a pure-SQL consumer (`spark.sql`,
  * Thrift/JDBC, a notebook `%%sql` cell) reaches the engine's custom
  * operators without the Scala Column API. The same builders are
  * injected cluster-wide by `graft.plans.GraftExtensions`
  * (`--conf spark.sql.extensions=...`), so remote SQL sessions have
  * them from their first query.
  *
  * Names carry a `graft_` prefix: `sentences` would shadow Spark's
  * builtin, and a prefix keeps the whole family discoverable in
  * `SHOW FUNCTIONS LIKE 'graft_%'`. `PqReconstruct` is deliberately
  * absent — its codebook argument is fit-time Scala control data with
  * no SQL literal form (the Column API via `PqCodec` is its surface).
  */
object GraftFunctions {

  /** name → builder for every SQL-registrable graft expression. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_vec_dot" ->
      ((es: Seq[Expression]) => DotProduct(es(0), es(1))),
    "graft_vec_dot_long" ->
      ((es: Seq[Expression]) => DotProductLong(es(0), es(1))),
    "graft_srp_signature" ->
      ((es: Seq[Expression]) => SrpSignature(es(0))),
    "graft_normalize_text" ->
      ((es: Seq[Expression]) => NormalizeText(es(0))),
    "graft_sentences" ->
      ((es: Seq[Expression]) => SentenceGenerator(es(0))),
    // Spark's own runtime-filter probe, surfaced for SQL (the filter
    // bytes arrive as a binary literal, e.g. X'…' from
    // BloomProbe.serialize)
    "graft_bloom_might_contain" ->
      ((es: Seq[Expression]) => BloomFilterMightContain(es(0), es(1))))

  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (n, b) => Bridge.registerFunction(spark, n, b) }
}
