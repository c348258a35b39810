package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 second batch: t19 (full Gopher-style quality-rule battery).
  * The synthetic corpus has no symbols or newlines, so the planted
  * fixture here is what exercises both branches of every rule.
  */
class Round8bOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Write a fixture documents.parquet and return its dir. */
  private def docsDir(docs: Seq[(Long, String)]): String = {
    import spark.implicits._
    val fdir = java.nio.file.Files.createTempDirectory("t19_fix_").toString
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("fix").as("source"), length(col("text")).cast("long").as("n_chars"))
      .coalesce(1).write.parquet(s"$fdir/documents.parquet")
    fdir
  }

  // 10 words, mean len 4.0, two stopwords (the, a), all alphabetic
  private val goodTen = "the quick brown fox jumps over a lazy dog tonight"

  test("t19: a clean 60-word doc passes every rule") {
    val fdir = docsDir(Seq(1L -> Seq.fill(6)(goodTen).mkString(" ")))
    val r = TextOps.gopherRules(spark, fdir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(1) == 60L)
    (2 to 8).foreach(i => assert(!row.getBoolean(i),
      s"rule flag at col $i must be false for the clean doc"))
    assert(row.getBoolean(9), "keep must be true")
  }

  test("t19: each rule flags its planted violation") {
    val fdir = docsDir(Seq(
      // 10 words < 50 → word-count flag
      2L -> goodTen,
      // 60 long words → mean-len flag (and no stopwords)
      3L -> Seq.fill(60)("extraordinarily").mkString(" "),
      // 7 '#' marks over 60 words → symbol flag (10·7 ≥ 60)
      4L -> (Seq.fill(5)(goodTen).mkString(" ") + " " +
        "###tag ####tag quick brown fox jumps over the a lazy"),
      // 20 of 60 words numeric → alpha flag (40·5 < 60·4)
      5L -> (Seq.fill(4)(goodTen) ++ Seq.fill(2)(
        "111 222 333 444 555 666 777 888 999 000")).mkString(" "),
      // 10 lines, all bullet-led, 4 ellipsis-terminated → both line flags
      6L -> (1 to 10).map(i =>
        s"- ${Seq.fill(6)(goodTen).mkString(" ")}" +
          (if (i <= 4) " trailing..." else "")).mkString("\n")))
    val got = TextOps.gopherRules(spark, fdir).collect()
      .map(r => r.getLong(0) -> r).toMap

    assert(got(2L).getBoolean(2), "doc 2: word-count flag")
    assert(!got(2L).getBoolean(3) && !got(2L).getBoolean(4))
    assert(!got(2L).getBoolean(9))

    assert(got(3L).getBoolean(3), "doc 3: mean-len flag")
    assert(got(3L).getBoolean(6), "doc 3: stopword flag (none present)")
    assert(!got(3L).getBoolean(2), "doc 3: word count in range")

    assert(got(4L).getBoolean(4), "doc 4: symbol flag")
    assert(!got(4L).getBoolean(5), "doc 4: #tag words still alphabetic")

    assert(got(5L).getBoolean(5), "doc 5: alpha flag")
    assert(!got(5L).getBoolean(4), "doc 5: no symbols")

    assert(got(6L).getBoolean(7), "doc 6: bullet-lines flag")
    assert(got(6L).getBoolean(8), "doc 6: ellipsis-lines flag")
    assert(!got(6L).getBoolean(2), "doc 6: plenty of words")
  }

  test("t19 is live on the testdata corpus (both keep branches or a live flag)") {
    val rows = TextOps.gopherRules(spark, dir).collect()
    assert(rows.length == graft.Tables.documents(spark, dir).count())
    // word-count rule must split the corpus (docs range ~25–90 words)
    val wc = rows.map(_.getBoolean(2)).distinct
    assert(wc.length == 2, s"flag_word_count constant on corpus: ${wc.toSeq}")
  }

  test("x20: bloom-pruned join result equals the plain unpruned join") {
    val got = Extended.bloomPrunedJoin(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .join(
        graft.Tables.orders(spark, dir)
          .filter(col("o_totalprice") > Extended.BloomOrderDollars)
          .select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
      .orderBy(col("o_orderpriority"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty && got.toSeq == want.toSeq)
  }

  test("x20: bloom admits no false negatives and ≤5% false positives") {
    val bf = Extended.x20Bloom(spark, dir)
    val mc = udf((k: Long) => bf.value.mightContain(k))
    val li = graft.Tables.lineitem(spark, dir)
    val total = li.count()
    val pruned = li.filter(mc(col("l_orderkey"))).count()
    val matching = li
      .join(
        graft.Tables.orders(spark, dir)
          .filter(col("o_totalprice") > Extended.BloomOrderDollars)
          .select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .count()
    assert(pruned >= matching, "a bloom false negative is impossible")
    assert(pruned <= matching + (total * 5) / 100,
      s"false-positive overshoot: pruned=$pruned matching=$matching total=$total")
    // and the prune must actually bite: ~10% selectivity on this data
    assert(pruned * 2 < total, s"bloom pruned nothing: $pruned of $total")
  }

  test("x20 plan: bloom probe filters the lineitem scan before any shuffle") {
    val plan = Extended.bloomPrunedJoin(spark, dir)
      .queryExecution.executedPlan.toString
    val iUdf = plan.indexOf("UDF(")
    assert(iUdf >= 0, s"bloom probe UDF missing from plan:\n$plan")
    val iScan = plan.indexOf("lineitem.parquet", iUdf)
    assert(iScan > iUdf, s"bloom filter must sit above the lineitem scan:\n$plan")
    assert(!plan.substring(iUdf, iScan).contains("Exchange"),
      s"bloom probe must run pre-shuffle, inside the scan stage:\n$plan")
  }

  test("t19 plan: one words aggregate, a per-row text projection, 1:1 join") {
    val plan = TextOps.gopherRules(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), plan)
    // the line/symbol counts must not explode rows: the only Generate
    // in the plan is the shared words tokenizer's posexplode
    val nGenerate = "Generate".r.findAllIn(plan).length
    assert(nGenerate <= 1,
      s"text-side counts must be array projections, not explodes:\n$plan")
  }
}
