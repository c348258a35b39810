package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-11 late additions: s24 (IVF+PQ with exact refine — FAISS
  * IndexRefineFlat) and its measured win over the unrefined s13.
  */
class Round11OpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("s24: refine recall ≥ s13's and ≥ the family's 0.6 bound") {
    // the refine stage re-orders s13's candidate pool by the exact
    // cosine — against the exact s1 top-k it must not lose to the
    // ADC-ranked s13 it upgrades (measured: strictly better at
    // sf0.001), and must clear the family's recall floor
    val exact = Similarity.bruteForceTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val raw = Similarity.ivfPqTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ref = Similarity.ivfPqRefineTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rRef = (exact & ref).size.toDouble / exact.size
    val rRaw = (exact & raw).size.toDouble / exact.size
    info(f"s24 recall@k vs exact = $rRef%.2f (unrefined s13 = $rRaw%.2f)")
    assert(rRef >= rRaw,
      f"refine lost to ADC ranking vs exact: $rRef%.2f < $rRaw%.2f")
    assert(rRef >= 0.6, f"s24 recall vs exact $rRef%.2f < 0.6")
    assert(ref.nonEmpty && raw.nonEmpty && exact.nonEmpty)
  }

  test("s24: output is shortlist-bounded and exactly k rows per query") {
    val rows = Similarity.ivfPqRefineTopK(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (adcRank, rank) = (r.getLong(2), r.getLong(4))
      assert(adcRank >= 1L &&
        adcRank <= Similarity.RefineFactor.toLong * Similarity.TopK,
        s"row escaped the ADC shortlist: adc_rank $adcRank")
      assert(rank >= 1L && rank <= Similarity.TopK)
    }
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.length == Similarity.TopK, s"query $q emitted ${rs.length} rows")
      // final ordering is on the exact cosine, not the ADC rank
      val byRank = rs.sortBy(_.getLong(4)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"query $q exact scores not non-increasing in rank")
    }
  }

  test("t26: NB classifier separates its own training terciles") {
    // trained on t22's head-vs-tail pseudo-labels, the model must (a)
    // emit one row per document (middle docs are scored too), and (b)
    // actually separate the classes it trained on — training-set
    // accuracy on head∪tail well above chance, and the head class mean
    // score strictly above the tail class mean
    val scores = TextOps.qualityClassifier(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getDouble(4))).toMap
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(scores.size.toLong == nDocs,
      s"${scores.size} scored rows for $nDocs documents")
    val labels = TextOps.pplBucketAssign(spark, dir)
      .select(col("doc_id"), col("bucket")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val trained = labels.filter { case (_, b) => b == "head" || b == "tail" }
    val correct = trained.count { case (d, b) =>
      val headPred = scores(d)._1 > 0L
      (b == "head") == headPred
    }
    val acc = correct.toDouble / trained.size
    val headMean = trained.collect { case (d, "head") => scores(d)._2 }
    val tailMean = trained.collect { case (d, "tail") => scores(d)._2 }
    val (hm, tm) = (headMean.sum / headMean.size, tailMean.sum / tailMean.size)
    info(f"t26 training accuracy = $acc%.2f; mean avg_nb head $hm%.3f vs tail $tm%.3f")
    assert(acc >= 0.9, f"NB training-set accuracy $acc%.2f < 0.9")
    assert(hm > tm, f"head mean $hm%.4f not above tail mean $tm%.4f")
  }

  test("t26: feature accounting is consistent") {
    val rows = TextOps.qualityClassifier(spark, dir).collect()
    rows.foreach { r =>
      val (n, scored) = (r.getLong(1), r.getLong(2))
      assert(scored >= 0L && scored <= n,
        s"doc ${r.getLong(0)}: n_scored $scored outside [0, $n]")
    }
    // the wordNgrams=2 space has exactly 2n−1 features for an n-token
    // doc (n ≥ 1): n unigrams + n−1 adjacent bigrams — checked against
    // t4's independent whitespace token count
    val t4 = TextOps.tokenCounts(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val expected = 2L * t4(r.getLong(0)) - 1L
      assert(expected == r.getLong(1),
        s"doc ${r.getLong(0)}: n_feats ${r.getLong(1)} != 2n-1 = $expected")
    }
  }

  test("m7: planted in-place edits are found; unrelated content is not") {
    import spark.implicits._
    val base = ("the quick brown fox jumps over the lazy dog " * 16).trim
    // doc 2: three in-place single-char edits (same length) — flips
    // only the touched regions' bits; doc 3: unrelated; doc 4: exact copy
    val edited = {
      val sb = new StringBuilder(base)
      sb.setCharAt(40, 'X'); sb.setCharAt(200, 'Y'); sb.setCharAt(410, 'Z')
      sb.toString
    }
    val other = ("entirely different content with no shared layout " * 15).trim
    val fdir = java.nio.file.Files.createTempDirectory("m7_fix_").toString
    Seq((1L, base), (2L, edited), (3L, other), (4L, base))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$fdir/documents.parquet")
    val pairs = Multimodal.phashNearDup(spark, fdir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 4L)) && pairs((1L, 4L)) == 0L,
      s"exact copy must pair at Hamming 0: $pairs")
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) <= 3L,
      s"3 in-place edits flip at most 3 region bits: $pairs")
    assert(pairs.contains((2L, 4L)), "edited doc must pair with the copy too")
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated content must not collide within Hamming ${Multimodal.PhashMaxHamming}: $pairs")
  }

  test("m7: signature is a pure projection; bands partition the bits") {
    import spark.implicits._
    val sigs = Multimodal.phashFrame(
      Seq((1L, "abc"), (2L, "abc"), (3L, "abd"))
        .toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L), "identical content must hash identically")
    assert(sigs.values.forall(s => s >= 0L && s < (1L << 60)),
      "signatures must stay in the nonnegative 60-bit domain")
    // reassembling the 4 bands reproduces the signature
    val s1 = sigs(1L)
    val re = (0 until Multimodal.PhashBands).map { b =>
      ((s1 >> (b * Multimodal.PhashBandBits)) &
        ((1L << Multimodal.PhashBandBits) - 1)) << (b * Multimodal.PhashBandBits)
    }.sum
    assert(re == s1, "band decomposition must partition the signature")
  }

  test("t27: roundtrip holds corpus-wide; a corrupted vocab trips the audit") {
    import org.apache.spark.sql.functions._
    val clean = TextOps.bpeDecode(spark, dir).collect()
    assert(clean.nonEmpty)
    assert(clean.forall(_.getBoolean(3)),
      "decode(encode(w)) must equal w for every corpus word")
    // corrupt the vocab with a COLLISION: the top merge token takes
    // another token's id (a bijective id swap is a harmless
    // relabeling — roundtrip is invariant under it; a collision makes
    // one spelling undecodable) — the audit MUST notice (a fidelity
    // check that cannot fail checks nothing)
    val (segf, vocab) = TextOps.bpeVocabFrames(spark, dir)
    val top2 = vocab.orderBy(col("id").desc).limit(2).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(top2.length == 2)
    val corrupted = vocab
      .withColumn(
        "id",
        when(col("token") === top2(0)._1, top2(1)._2)
          .otherwise(col("id")))
    val audited = TextOps.bpeDecodeFrom(spark, dir, segf, corrupted).collect()
    assert(audited.exists(!_.getBoolean(3)),
      "an id collision must surface as roundtrip failures")
    val broken = audited.count(!_.getBoolean(3))
    info(s"t27 audit flagged $broken/${audited.length} docs under the collided vocab")
  }

  test("p24: temperature damps the head and upsamples the tail") {
    val rows = TrainingSet.temperatureMix(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3),
        r.getLong(5), r.getDouble(6)))
    assert(rows.length >= 2, "needs at least two languages to mix")
    val (smallest, largest) =
      (rows.minBy(_._2), rows.maxBy(_._2))
    info(f"p24: ${smallest._1} epochs ${smallest._5}%.3f vs ${largest._1} ${largest._5}%.3f")
    // α = 0.5: a smaller language's implied epoch count must EXCEED a
    // larger one's (weight ∝ sqrt(share) ⇒ budget/n ∝ 1/sqrt(share))
    assert(smallest._5 > largest._5,
      f"temperature failed to upsample: ${smallest._5}%.4f <= ${largest._5}%.4f")
    // budget conservation: Σ budgets ≤ T (floor division only loses)
    val total = rows.map(_._2).sum
    assert(rows.map(_._4).sum <= total / 2,
      "budgets exceed the half-corpus target")
    assert(rows.map(_._4).sum >= total / 2 - rows.length,
      "floor losses exceed one token per language")
    // shares sum to 1 within float tolerance
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-9)
  }

  test("s24: refined top-k scores dominate s13's ADC-ranked picks") {
    // the point of paying the 4·k raw reads: the exact quality of the
    // served set. Per query, the refined set's total exact cosine must
    // be ≥ s13's picks' total exact cosine (they draw from the same
    // probed pool; refine picks the pool's exact-best by construction)
    val e = Similarity.vectors(spark, dir)
    def exactSum(pairs: org.apache.spark.sql.DataFrame) = pairs
      .join(e.select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn")), "q_id")
      .join(e, "vec_id")
      .withColumn("cs",
        round(graft.functions.VectorFunctions.vecDot(col("qv"), col("v"))
          / (col("qn") * col("nrm")), 6))
      .groupBy(col("q_id")).agg(sum(col("cs")).as("total"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val refined = exactSum(Similarity.ivfPqRefineTopK(spark, dir)
      .select(col("q_id"), col("vec_id")))
    val adc = exactSum(Similarity.ivfPqTopK(spark, dir)
      .select(col("q_id"), col("vec_id")))
    adc.foreach { case (q, t13) =>
      val t24 = refined(q)
      assert(t24 >= t13 - 1e-9,
        f"query $q: refined exact total $t24%.6f < ADC-picked $t13%.6f")
    }
  }
}
