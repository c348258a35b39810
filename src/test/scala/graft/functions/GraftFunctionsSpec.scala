package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The SQL function surface: after registerAll, a pure-SQL session
  * computes the same bits the Column API does for every registered
  * expression — including the generator and the binary-literal bloom
  * probe.
  */
class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  override def withFixture(test: NoArgTest) = {
    GraftFunctions.registerAll(spark)
    super.withFixture(test)
  }

  test("every graft_ function is visible in SHOW FUNCTIONS") {
    val shown = spark.sql("SHOW FUNCTIONS LIKE 'graft_*'")
      .collect().map(_.getString(0)).toSet
    GraftFunctions.all.foreach { case (n, _) =>
      assert(shown.contains(n), s"$n missing from SHOW FUNCTIONS: $shown")
    }
  }

  test("graft_vec_dot / graft_vec_dot_long compute exact dots in SQL") {
    val d = spark.sql(
      "SELECT graft_vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D))")
      .head().getDouble(0)
    assert(d == 32.0)
    val l = spark.sql(
      "SELECT graft_vec_dot_long(array(2L, 3L), array(10L, 100L))")
      .head().getLong(0)
    assert(l == 320L)
  }

  test("graft_srp_signature in SQL equals the Column API on the corpus") {
    val df = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    df.createOrReplaceTempView("gfs_vecs")
    val viaSql = spark.sql(
      "SELECT vec_id, graft_srp_signature(v) AS sig FROM gfs_vecs")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaApi = df.select(col("vec_id"), SrpSig.srpSignature(col("v")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaApi)
  }

  test("graft_srp_signature_t selects tables from SQL; bad indices fail at plan time") {
    val df = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    df.createOrReplaceTempView("gfs_vecs_t")
    val viaSql = spark.sql(
      "SELECT vec_id, graft_srp_signature_t(v, 3) AS sig FROM gfs_vecs_t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaApi = df
      .select(col("vec_id"), SrpSig.srpSignatureT(col("v"), 3).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaApi)
    // table 0 ≡ the single-table function (the s15/s19 contract)
    val t0 = spark.sql(
      "SELECT graft_srp_signature_t(v, 0) = graft_srp_signature(v) FROM gfs_vecs_t")
      .collect()
    assert(t0.forall(_.getBoolean(0)))
    // non-literal index: no plannable form — plan-time failure
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        "SELECT graft_srp_signature_t(v, CAST(vec_id AS INT)) FROM gfs_vecs_t")
        .collect()
    }
    // out-of-range literal
    intercept[IllegalArgumentException] {
      spark.sql("SELECT graft_srp_signature_t(v, 99) FROM gfs_vecs_t").collect()
    }
  }

  test("graft_normalize_text and graft_sentences work from SQL") {
    val n = spark.sql("SELECT graft_normalize_text('Café  STOP')")
      .head().getString(0)
    val api = Seq("Café  STOP").toDF("t")
      .select(TextNorm.normalized(col("t"))).head().getString(0)
    assert(n == api)
    val sents = spark.sql(
      "SELECT graft_sentences('One. Two! Three?')").collect()
    val apiSents = Seq("One. Two! Three?").toDF("t")
      .select(SentenceGenerator.sentences(col("t"))).collect()
    assert(sents.length == apiSents.length && sents.length >= 3,
      s"sql ${sents.toSeq} vs api ${apiSents.toSeq}")
  }

  test("wrong arity is a plan-time WRONG_NUM_ARGS error, not IOOBE or silence") {
    // too few: used to throw a raw IndexOutOfBoundsException
    val tooFew = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_vec_dot(array(1.0D))").collect()
    }
    assert(tooFew.getCondition == "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      s"got ${tooFew.getCondition}: ${tooFew.getMessage}")
    assert(tooFew.getMessage.contains("graft_vec_dot"))
    // too many: used to be SILENTLY ignored — the worse failure mode
    val tooMany = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        "SELECT graft_vec_dot(array(1.0D), array(2.0D), array(3.0D))")
        .collect()
    }
    assert(tooMany.getCondition == "WRONG_NUM_ARGS.WITHOUT_SUGGESTION")
    val unary = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_sentences('a. b.', 'extra')").collect()
    }
    assert(unary.getMessage.contains("graft_sentences"))
  }

  test("graft_bloom_might_contain probes a hex-literal filter from SQL") {
    val bf = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    Seq(7L, 42L, 99L).foreach(bf.putLong)
    val hex = BloomProbe.serialize(bf).map("%02X".format(_)).mkString
    def probe(k: Long): Boolean = spark.sql(
      s"SELECT graft_bloom_might_contain(X'$hex', ${k}L)")
      .head().getBoolean(0)
    assert(probe(7L) && probe(42L) && probe(99L),
      "false negatives are impossible")
    assert(!(0L until 50L).filterNot(Seq(7L, 42L).contains)
      .forall(k => probe(k)), "everything matched — filter not applied")
  }
}
