package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-7 checks:
  *   - x15 (unpivot) is x7's exact dual: melting the wide frame and
  *     re-pivoting it reproduces the wide frame bit-for-bit, and the
  *     melt itself plans as an Expand with NO additional exchange;
  *   - the d5 guard's conf key is part of the public surface the README
  *     documents — pin the literal so a doc/code drift fails a test.
  */
class Round7OpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("x15: unpivot ∘ pivot round-trips to the wide frame exactly") {
    val wide = Extended.pivotEvents(spark, dir)
    val rePivoted = Extended.unpivotEvents(spark, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "view", "purchase"))
      .agg(sum(col("cents")))
      .select(
        col("user_id"),
        coalesce(col("click"), lit(0L)).as("click_cents"),
        coalesce(col("view"), lit(0L)).as("view_cents"),
        coalesce(col("purchase"), lit(0L)).as("purchase_cents"))
    assert(rePivoted.exceptAll(wide).isEmpty && wide.exceptAll(rePivoted).isEmpty,
      "x15 melt + re-pivot must be the identity on x7's wide frame")
  }

  test("x15: the melt is an Expand, not a join or an extra shuffle") {
    val plan = Extended.unpivotEvents(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan)
    // exchanges: the two the pivot agg pays for the wide input
    // ((user,type) pre-agg + per-user pivotfirst) + the output sort —
    // the melt itself must add none, and x7's presentation sort must
    // NOT appear inside the melt's input
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 3, s"melt added an exchange:\n$plan")
    val sorts = "Sort ".r.findAllIn(plan).length
    assert(sorts <= 1, s"melt input carries a wasted interior sort:\n$plan")
    assert(!plan.contains("Join"), s"melt must not plan a join:\n$plan")
  }

  test("x15: every (user, type) long row matches a direct aggregation") {
    val direct = graft.Tables.events(spark, dir)
      .filter(col("user_id") < 30)
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
    val melted = Extended.unpivotEvents(spark, dir)
    // the melt carries explicit zero rows for absent types; the direct
    // agg has no row there — compare on the nonzero support
    val nonzero = melted.filter(col("cents") =!= 0L)
    assert(nonzero.exceptAll(direct).isEmpty,
      "melted nonzero rows must agree with the direct (user,type) agg")
  }

  test("d14: every verdict is a d3 pair, and the BEST one per new doc") {
    // d14's candidates are d3's bands restricted to new×index, so each
    // (new_id, dup_of) must appear in d3's pair set (new_id < 100 ≤
    // dup_of ⇒ ordered the same way), and dup_of must be the max-sim /
    // lowest-id match among that doc's boundary-crossing d3 pairs
    val d3 = Dedup.minhashLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val boundary = d3.filter { case (a, b, _) =>
      a < Dedup.IncrementalBatchMaxId && b >= Dedup.IncrementalBatchMaxId }
    val best = boundary.groupBy(_._1).map { case (a, ps) =>
      a -> ps.maxBy { case (_, b, s) => (s, -b) }
    }
    val d14 = Dedup.incrementalDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(d14.nonEmpty, "d14 live branch not exercised by testdata")
    for ((n, d, s) <- d14) {
      val (_, eb, es) = best(n)
      assert((d, s) == (eb, es), s"d14 best for $n: got ($d,$s), d3 says ($eb,$es)")
    }
    assert(d14.map(_._1).toSet == best.keySet,
      "d14 must cover exactly the new docs with a boundary-crossing d3 pair")
  }

  test("d14: the new-batch band side rides a broadcast") {
    val p = Dedup.incrementalDedup(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"d14 candidate join is not broadcast:\n$p")
  }

  test("d15: both verdict branches live; bucket-minimum ids always kept") {
    val rows = Dedup.semanticDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val (kept, removed) = rows.partition(_._3)
    assert(kept.nonEmpty && removed.nonEmpty,
      s"verdict branches not both live: kept=${kept.length} removed=${removed.length}")
    // the lowest vec_id in a bucket has no smaller-id neighbor, so the
    // keep-lowest-id rule can never remove it
    val minPerBucket = rows.groupBy(_._2).map { case (_, rs) => rs.minBy(_._1) }
    assert(minPerBucket.forall(_._3),
      "a bucket-minimum vector was removed — the survivor rule is broken")
  }

  // ------------------------------------------------------------------ t16

  /** Two docs with IDENTICAL unigram multisets (4×a, 3×b) but different
    * bigram structure: doc 0 alternates (its bigrams are the corpus
    * majority), doc 1 runs (aa/bb, the corpus minority). A bag model
    * cannot tell them apart; a bigram model must.
    */
  private lazy val lmDir: String = {
    val docs = Seq(
      (0L, "a b a b a b a"),
      (1L, "a a a b b b a"))
    val out = java.nio.file.Files.createTempDirectory("graft_lmfix").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$out/documents.parquet")
    out
  }

  test("t16: word order separates docs that t10's bag model cannot") {
    val t10 = TextOps.unigramLogprob(spark, lmDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val t16 = TextOps.bigramLogprob(spark, lmDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(t10(0L) == t10(1L),
      "identical unigram multisets must tie under the bag model")
    assert(t16(0L) != t16(1L),
      "the bigram LM must separate different word orders")
    // the alternating doc's bigrams dominate the corpus (6 of 12
    // positions are ab/ba from doc 0 alone) → it must score HIGHER
    assert(t16(0L) > t16(1L),
      s"majority-bigram doc must outscore the minority: $t16")
  }

  test("t16: interpolation keeps unseen-in-context bigrams finite") {
    // every score must be finite and negative (it is a log-prob of a
    // proper mixture strictly between 0 and 1)
    val rows = TextOps.bigramLogprob(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val lp = r.getDouble(2)
      assert(!lp.isNaN && !lp.isInfinite && lp < 0.0,
        s"doc ${r.getLong(0)}: avg_logprob $lp out of range")
    }
  }

  // ------------------------------------------------------------------ s11

  test("s11: every candidate comes from the query's own IVF bucket") {
    val assign = Similarity.ivfAssign(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = Similarity.ivfSq8TopK(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (q, c, v) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(assign(q) == c && assign(v) == c,
        s"s11 candidate $v for query $q escaped bucket $c")
    }
  }

  test("s11: quantized bucket ranking tracks the float bucket ranking (s3)") {
    // same coarse quantizer as s3, scores quantized to centered int8
    // codes — the neighbor sets must substantially agree (pinned at
    // 0.6 so encoder regressions fail loudly while quantization-
    // boundary churn doesn't flake). With the pre-r7 UNCENTERED codes
    // this agreement was 0.14 — the affine bias ranked by coordinate
    // sums, which is what this spec now guards against.
    val s3 = Similarity.ivfTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val s11 = Similarity.ivfSq8TopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (s3 & s11).size.toDouble / s3.size
    assert(recall >= 0.6, f"s11 agreement with s3 = $recall%.2f < 0.6")
  }

  test("s6: centered-code recall@k vs brute force is bounded below") {
    // raw unsigned code dots measured 0.06 vs s1 (ranking by
    // coordinate sums, not similarity); centered signed-int8 codes
    // measured 0.78 — the bound keeps the bias fix from regressing
    val s1 = Similarity.bruteForceTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val s6 = Similarity.sq8TopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (s1 & s6).size.toDouble / s1.size
    assert(recall >= 0.6, f"s6 recall vs s1 = $recall%.2f < 0.6")
  }

  // ------------------------------------------------------------------ d16

  test("d16: removal rule is exactly d13's ddf>=2 rule, per doc") {
    val d13 = Dedup.paragraphDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val d16 = Dedup.boilerplateStrip(spark, dir).collect()
    assert(d16.nonEmpty)
    for (r <- d16)
      assert(r.getLong(2) == d13(r.getLong(0)),
        s"d16 removed ${r.getLong(2)} for doc ${r.getLong(0)}, d13 counted ${d13(r.getLong(0))}")
    // the strip branch must be LIVE on testdata (cross-doc duplicated
    // paragraphs exist at every SF — ddf up to 5 at sf0.001)
    assert(d16.exists(_.getLong(2) > 0), "no paragraph was ever removed")
  }

  test("d16: untouched docs reconstruct to their normalized text verbatim") {
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"),
        array_join(split(lower(col("text")), "\\s+"), " ").as("norm"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Dedup.boilerplateStrip(spark, dir)
      .filter(col("removed_paragraphs") === 0L).collect()
    assert(rows.nonEmpty)
    for (r <- rows)
      assert(r.getString(3) == docs(r.getLong(0)),
        s"doc ${r.getLong(0)} reconstruction drifted with zero removals")
  }

  test("d16: clean_text never contains a removed paragraph, word budget adds up") {
    val rows = Dedup.boilerplateStrip(spark, dir).collect()
    val words = TextOps.cachedWords(spark, dir)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (r <- rows if r.getLong(2) > 0) {
      val kept = if (r.getString(3).isEmpty) 0L
        else r.getString(3).split(" ").length.toLong
      // removed paragraphs are full 10-word groups except possibly the
      // doc's tail group — kept words must be the doc total minus
      // [removed full groups worst case, at least one word per removed]
      val total = words(r.getLong(0))
      assert(kept < total, s"doc ${r.getLong(0)}: removal did not shrink the doc")
      assert(kept >= total - r.getLong(2) * TextOps.SentenceWords,
        s"doc ${r.getLong(0)}: removed more words than its removed groups could hold")
    }
  }

  // ------------------------------------------------------------------ p15

  test("p15: root digest is the XOR of shard digests, counts sum") {
    val rows = TrainingSet.datasetDigest(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val (root, shards) = rows.partition(_._1 == -1L)
    assert(root.length == 1 && shards.nonEmpty)
    assert(root.head._3 == shards.map(_._3).reduce(_ ^ _),
      "Merkle property broken: root must be the XOR of shard digests")
    assert(root.head._2 == shards.map(_._2).sum)
  }

  test("p15: a single-doc edit changes exactly its shard's digest and the root") {
    def corpus(editDoc7: Boolean): String = {
      val docs = (0L until 20L).map { i =>
        val text = if (i == 7L && editDoc7) "edited text for doc seven"
          else s"stable text body for document number $i"
        (i, text)
      }
      val out = java.nio.file.Files.createTempDirectory("graft_digfix").toString
      docs.toDF("doc_id", "text")
        .withColumn("lang", lit("en"))
        .withColumn("source", lit("src0"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .coalesce(1).write.mode("overwrite").parquet(s"$out/documents.parquet")
      out
    }
    def digests(d: String): Map[Long, Long] =
      TrainingSet.datasetDigest(spark, corpus(d == "edited"))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val before = digests("base")
    val after = digests("edited")
    val changed = before.keySet.filter(k => before(k) != after(k))
    // doc 7's shard + the root (−1) — nothing else moves
    assert(changed.contains(-1L), "root digest must see the edit")
    assert(changed.size == 2,
      s"edit must localize to one shard + root, changed: $changed")
  }

  // ------------------------------------------------------------------ p16

  test("p16: report rows are internally consistent (Merkle + sums)") {
    val rows = TrainingSet.releasePipeline(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val (root, shards) = rows.partition(_._1 == -1L)
    assert(root.length == 1 && shards.nonEmpty)
    assert(root.head._2 == shards.map(_._2).sum)
    assert(root.head._3 == shards.map(_._3).sum)
    assert(root.head._4 == shards.map(_._4).reduce(_ ^ _),
      "release digest must XOR-fold across shards")
  }

  test("p16: released set is exactly the stage composition") {
    // re-compose the gates from the REGISTERED stage queries and check
    // the report's root doc count — an independent derivation of the
    // pipeline's set algebra
    val survivors = Dedup.exactDedup(spark, dir)
      .collect().map(_.getLong(1)).toSet
    val kept = TextOps.c4Filters(spark, dir).filter(col("keep"))
      .collect().map(_.getLong(0)).toSet
    val contam = TrainingSet.contamination(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val expected = (survivors intersect kept)
      .filter(_ >= TrainingSet.BenchmarkDocs) diff contam
    val total = TrainingSet.releasePipeline(spark, dir)
      .filter(col("shard") === -1L).head().getLong(1)
    assert(total == expected.size.toLong,
      s"report says $total released, stage composition says ${expected.size}")
    // the funnel must actually drop something and keep something
    val all = graft.Tables.documents(spark, dir).count()
    assert(total > 0L && total < all,
      s"funnel inert: released $total of $all")
  }

  // ------------------------------------------------------------------ d17

  /** Docs 0/1 share one 5-word substring (three overlapping duplicated
    * 3-grams must MERGE into one maximal span); docs 3/4 share two
    * 3-word substrings separated by >k unique words (the island break
    * must keep them as TWO spans); doc 2 shares nothing.
    */
  private lazy val spanDir: String = {
    val docs = Seq(
      (0L, "a b c d e f g h"),
      (1L, "x y a b c d e z"),
      (2L, "m n o u v w"),
      (3L, "p q r c1 c2 c3 s t u"),
      (4L, "p q r c4 c5 c6 s t u"))
    val out = java.nio.file.Files.createTempDirectory("graft_spanfix").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$out/documents.parquet")
    out
  }

  test("d17: planted shared substrings resolve to exact maximal spans") {
    val got = Dedup.dupSpans(spark, spanDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))).toMap
    assert(got(0L) == ((8L, 1L, 5L, 5L, 5.0 / 8.0)),
      s"overlapping duplicated grams must merge to one span, got ${got(0L)}")
    assert(got(1L) == ((8L, 1L, 5L, 5L, 5.0 / 8.0)))
    assert(got(2L) == ((6L, 0L, 0L, 0L, 0.0)),
      "a doc sharing nothing must report zero spans")
    assert(got(3L) == ((9L, 2L, 3L, 6L, 6.0 / 9.0)),
      s"spans separated by >k unique words must NOT merge, got ${got(3L)}")
    assert(got(4L) == ((9L, 2L, 3L, 6L, 6.0 / 9.0)))
  }

  test("d17: span membership agrees with d10's duplicated-shingle rule") {
    // the df cap is inert on testdata (max df 25 < 100), so d10 and d17
    // apply the same cross-doc rule — a doc has a span iff it has a
    // duplicated shingle
    val inD17 = Dedup.dupSpans(spark, dir).collect()
      .filter(_.getLong(2) > 0).map(_.getLong(0)).toSet
    val inD10 = Dedup.dupNgramCoverage(spark, dir).collect()
      .filter(_.getLong(2) > 0).map(_.getLong(0)).toSet
    assert(inD17 == inD10,
      s"membership drift: ${(inD17 diff inD10) ++ (inD10 diff inD17)}")
    assert(inD17.nonEmpty, "vacuous: no duplicated spans at sf0.001")
    // spans are merged disjoint intervals inside the doc:
    // max_span ≤ covered words ≤ token count
    Dedup.dupSpans(spark, dir).collect().foreach { r =>
      assert(r.getLong(3) <= r.getLong(4) && r.getLong(4) <= r.getLong(1),
        s"span accounting broken for doc ${r.getLong(0)}: $r")
    }
  }

  // ------------------------------------------------------------------ s12

  test("s12: fusion re-derives exactly from the two retriever lists") {
    val sem = Similarity.bruteForceTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    // the lexical list recomputed independently of rrfFusion's plumbing:
    // shared distinct-shingle counts ranked (count desc, doc_id)
    val sh = Dedup.shingles(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("sh")))
    val byDoc = sh.groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).toSet }
    val lex = (0L until Similarity.NumQueries.toLong).flatMap { q =>
      byDoc.keys.filter(_ != q).toSeq
        .map(d => (d, (byDoc(q) intersect byDoc(d)).size))
        .filter(_._2 > 0)
        .sortBy { case (d, n) => (-n, d) }
        .take(Similarity.TopK)
        .zipWithIndex
        .map { case ((d, _), i) => (q, d) -> (i + 1L) }
    }.toMap
    val expected = (sem.keySet ++ lex.keySet).groupBy(_._1).flatMap {
      case (q, keys) =>
        keys.toSeq
          .map { k =>
            val score =
              sem.get(k).map(r => 1.0 / (Similarity.RrfK + r)).getOrElse(0.0) +
                lex.get(k).map(r => 1.0 / (Similarity.RrfK + r)).getOrElse(0.0)
            (k._2, score)
          }
          .sortBy { case (d, s) => (-s, d) }
          .take(Similarity.TopK)
          .zipWithIndex
          .map { case ((d, s), i) => (q, d) -> ((s, i + 1L)) }
    }
    val got = Similarity.rrfFusion(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getLong(3))))
      .toMap
    assert(got == expected,
      s"fusion drifted from the rank algebra: ${(got.toSet diff expected.toSet).take(3)}")
  }

  test("s12: a doc both retrievers return outranks any single-list doc") {
    // with k=60 and TopK=10: min both-lists score 2/(60+10) = 0.0286 >
    // max single-list score 1/(60+1) = 0.0164 — fusion's defining
    // property, and why hybrid beats either retriever alone
    val sem = Similarity.bruteForceTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fused = Similarity.rrfFusion(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val single = 1.0 / (Similarity.RrfK + 1)
    fused.groupBy(_._1).foreach { case (_, rows) =>
      val (both, one) = rows.partition(r => r._3 > single + 1e-12)
      // every both-lists doc must rank strictly above every single-list doc
      if (both.nonEmpty && one.nonEmpty)
        assert(both.map(_._4).max < one.map(_._4).min,
          s"a single-list doc outranked a both-lists doc: $rows")
    }
    assert(fused.exists(r => sem.contains((r._1, r._2))),
      "vacuous: fusion shares nothing with the semantic list")
  }

  // ------------------------------------------------------------------ x17

  test("x17: asymmetric sets — both marginals, no grand total, one Expand") {
    val rows = Extended.groupingSetsOrders(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(!rows.exists(r => r._1 == -1L && r._2 == "ALL"),
      "grand-total row present — that's CUBE, not this set list")
    val detail = rows.filter(r => r._1 != -1L && r._2 != "ALL")
    val yrMarg = rows.filter(r => r._1 != -1L && r._2 == "ALL")
    val priMarg = rows.filter(r => r._1 == -1L && r._2 != "ALL")
    assert(detail.nonEmpty && yrMarg.nonEmpty && priMarg.nonEmpty)
    // each marginal must re-derive exactly from the detail rows — the
    // grouping-set expansion is an identity over the base aggregation
    assert(yrMarg.map(r => (r._1, r._3, r._4)).toSet ==
      detail.groupBy(_._1)
        .map { case (y, xs) => (y, xs.map(_._3).sum, xs.map(_._4).sum) }.toSet,
      "year marginal drifted from the detail rows")
    assert(priMarg.map(r => (r._2, r._3, r._4)).toSet ==
      detail.groupBy(_._2)
        .map { case (p, xs) => (p, xs.map(_._3).sum, xs.map(_._4).sum) }.toSet,
      "priority marginal drifted from the detail rows")
    assert(Extended.groupingSetsOrders(spark, dir)
      .queryExecution.executedPlan.toString.contains("Expand"),
      "grouping sets lost the single Expand pass")
  }

  test("d5 guard conf key is the documented literal") {
    // README/SURVEY document this exact string as the 100×-scale
    // escape hatch beside the d8 routing; renaming it must fail here
    assert(Dedup.MaxAllPairsVectorsKey == "graft.dedup.maxAllPairsVectors")
  }
}
