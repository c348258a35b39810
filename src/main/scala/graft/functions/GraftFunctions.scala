package graft.functions

import org.apache.spark.sql.{AnalysisException, SparkSession}
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

  /** Wraps a builder with strict arity validation: a pure-SQL call
    * with the wrong argument count gets Spark's own
    * `WRONG_NUM_ARGS` AnalysisException at plan time (naming the
    * function and both counts) instead of a raw
    * IndexOutOfBoundsException — and EXTRA arguments are rejected
    * rather than silently ignored, which would otherwise let
    * `graft_vec_dot(a, b, c)` plan as a silently wrong query.
    */
  private def arity(
      name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    es => {
      if (es.length != n)
        throw new AnalysisException(
          "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          Map(
            "functionName" -> name,
            "expectedNum" -> n.toString,
            "actualNum" -> es.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      build(es)
    }

  /** name → builder for every SQL-registrable graft expression. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_vec_dot" ->
      arity("graft_vec_dot", 2)(es => DotProduct(es(0), es(1))),
    "graft_vec_dot_long" ->
      arity("graft_vec_dot_long", 2)(es => DotProductLong(es(0), es(1))),
    "graft_srp_signature" ->
      arity("graft_srp_signature", 1)(es => SrpSignature(es(0))),
    // multi-table form (s19): the table index must be a literal int —
    // it selects which generated weight array the codegen inlines, so
    // a non-foldable index has no plannable form
    "graft_srp_signature_t" ->
      arity("graft_srp_signature_t", 2) { es =>
        val t = es(1) match {
          case e if e.foldable && e.dataType ==
              org.apache.spark.sql.types.IntegerType =>
            e.eval().asInstanceOf[Int]
          case other => throw new AnalysisException(
            "INVALID_PARAMETER_VALUE.INTEGER",
            Map(
              "parameter" -> "table",
              "functionName" -> "`graft_srp_signature_t`",
              "invalidValue" -> other.sql))
        }
        require(t >= 0 && t < SrpSig.Tables,
          s"graft_srp_signature_t: table $t outside [0, ${SrpSig.Tables - 1}]")
        SrpSignature(es(0), t)
      },
    "graft_phash_signature" ->
      arity("graft_phash_signature", 1)(es => PhashSignature(es(0))),
    "graft_normalize_text" ->
      arity("graft_normalize_text", 1)(es => NormalizeText(es(0))),
    "graft_sentences" ->
      arity("graft_sentences", 1)(es => SentenceGenerator(es(0))),
    // Spark's own runtime-filter probe, surfaced for SQL (the filter
    // bytes arrive as a binary literal, e.g. X'…' from
    // BloomProbe.serialize)
    "graft_bloom_might_contain" ->
      arity("graft_bloom_might_contain", 2)(
        es => BloomFilterMightContain(es(0), es(1))))

  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (n, b) => Bridge.registerFunction(spark, n, b) }
}
