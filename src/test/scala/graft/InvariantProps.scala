package graft

import graft.etl.{Entities, Transcripts, WarehouseWriter}
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based invariants (SURVEY.md §5 item 3) over the ETL
  * operators, on arbitrary generated inputs:
  * offsets partition exactly, ordered concat is order-insensitive to
  * input arrival, INSERT IGNORE is idempotent, alignment is total.
  */
object InvariantProps extends Properties("graft.invariants") {

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val word: Gen[String] =
    Gen.oneOf("alpha", "bravo", "charlie", "delta", "echo", "spark", "x")
  private val sentenceGen: Gen[String] =
    Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  property("W2: spans partition the newline-joined text exactly") =
    Prop.forAll(Gen.nonEmptyListOf(sentenceGen)) { sents =>
      val df = sents.zipWithIndex
        .map { case (s, i) => (1L, i, s) }
        .toDF("episode_id", "sentence_index", "sentence_text")
      val rows = Entities.sentenceSpans(df)
        .orderBy("sentence_index").collect()
      val contiguous = rows.sliding(2).forall {
        case Array(a, b) =>
          b.getAs[Long]("span_start") == a.getAs[Long]("span_end") + 1
        case _ => true
      }
      val lengthsMatch = rows.zip(sents).forall { case (r, s) =>
        r.getAs[Long]("span_end") - r.getAs[Long]("span_start") == s.length
      }
      rows.head.getAs[Long]("span_start") == 0L && contiguous && lengthsMatch
    }

  property("A7: ordered concat is invariant to chunk arrival order") =
    Prop.forAll(Gen.nonEmptyListOf(sentenceGen)) { texts =>
      val inOrder = texts.zipWithIndex.map { case (t, i) => (1L, i, t) }
      val shuffled = inOrder.reverse // worst-case arrival order
      def reduce(rows: Seq[(Long, Int, String)]) =
        Transcripts.reduceTranscripts(
          rows.toDF("episode_id", "chunk_num", "text"))
          .select("text").as[String].head()
      reduce(inOrder) == texts.mkString(" ") &&
        reduce(shuffled) == texts.mkString(" ")
    }

  property("E6: insertIgnore is idempotent and never loses existing rows") =
    Prop.forAll(
      Gen.listOf(Gen.zip(Gen.chooseNum(0L, 9L), Gen.alphaStr)),
      Gen.listOf(Gen.zip(Gen.chooseNum(0L, 9L), Gen.alphaStr))) { (ex, in) =>
      val existing = (("sentinel", -1L) :: Nil)
        .map(_.swap).++(ex).toDF("k", "v").dropDuplicates("k")
      val incoming = in.toDF("k", "v")
      val once = WarehouseWriter.insertIgnore(existing, incoming, Seq("k"), Seq("v"))
      val twice = WarehouseWriter.insertIgnore(once, incoming, Seq("k"), Seq("v"))
      once.count() == twice.count() &&
        once.except(twice).count() == 0 &&
        existing.join(once, Seq("k"), "left_anti").count() == 0
    }

  property("p2/p5 budget math: `div` is exact on longs beyond 2^53") =
    Prop.forAll(
      Gen.nonEmptyListOf(Gen.zip(
        Gen.chooseNum((1L << 53) + 1, Long.MaxValue - 1),
        Gen.chooseNum(2L, 1L << 20)))) { pairs =>
      val got = pairs.toDF("x", "n")
        .selectExpr("x div n AS q").as[Long].collect().toSeq.sorted
      got == pairs.map { case (x, n) => x / n }.sorted
    }

  property("double `/`+cast diverges above 2^53 — why the budget math uses div") =
    Prop {
      val x = (1L << 53) + 1 // not representable as a double
      val df = Seq((x, 1L)).toDF("x", "n")
      val viaDiv = df.selectExpr("x div n").as[Long].head()
      val viaDouble = df.selectExpr("CAST(x / n AS LONG)").as[Long].head()
      viaDiv == x && viaDouble != x
    }

  property("d19: Spark removal equals an in-memory reference on random corpora") =
    Prop.forAll(
      Gen.chooseNum(2, 4).flatMap(nd => Gen.listOfN(nd,
        Gen.chooseNum(5, 12).flatMap(n => Gen.listOfN(n, word))))) { docs =>
      // in-memory reference of the survivor-exempt policy
      val ws = docs.zipWithIndex.map { case (d, i) => (i.toLong + 1, d) }
      val grams = for {
        (id, w) <- ws; i <- 0 to w.length - 3
      } yield (id, i, w.slice(i, i + 3).mkString(" "))
      val marked: Set[(Long, Int)] = grams.groupBy(_._3).values
        .filter(occ => occ.map(_._1).distinct.size >= 2)
        .flatMap { occ =>
          occ.sortBy(o => (o._1, o._2)).tail
            .flatMap(o => (o._2 until o._2 + 3).map(p => (o._1, p)))
        }.toSet
      val want = ws.map { case (id, w) =>
        val kept = w.zipWithIndex.collect {
          case (x, p) if !marked((id, p)) => x
        }
        id -> ((w.length.toLong, (w.length - kept.length).toLong,
          kept.mkString(" ")))
      }.toMap
      val dir = java.nio.file.Files.createTempDirectory("d19p_").toString
      ws.map { case (id, w) => (id, w.mkString(" ")) }
        .toDF("doc_id", "text").coalesce(1)
        .write.parquet(s"$dir/documents.parquet")
      val got = graft.queries.Dedup.dupSpanRemoval(spark, dir).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(5))))
        .toMap
      got == want
    }

  property("w11: decayed sum equals a BigInt reference on random event sets") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.zip(
      Gen.chooseNum(1L, 3L),       // user
      Gen.chooseNum(0L, 20L),      // day offset from base
      Gen.chooseNum(0L, 1000L)))) { evs =>
      val base = 1704067200000000L // 2024-01-01 UTC
      val dayUs = 86400L * 1000000L
      val ref = evs.map(_._2).max
      val want = evs.groupBy(_._1).view.mapValues { es =>
        es.map { case (_, d, c) =>
          BigInt(c) * BigInt(1L << (32 - math.min((ref - d) / 7, 32L)).toInt)
        }.sum
      }.toMap
      val dir = java.nio.file.Files.createTempDirectory("w11p_").toString
      evs.zipWithIndex.map { case ((u, d, c), i) =>
        (i.toLong, base + d * dayUs, u, c / 100.0)
      }.toDF("event_id", "us", "user_id", "value")
        .selectExpr("event_id", "timestamp_micros(us) AS ts", "user_id",
          "'view' AS event_type", "value", "'{}' AS props")
        .coalesce(1).write.parquet(s"$dir/events.parquet")
      val got = graft.queries.EventWindows.decayedEngagement(spark, dir)
        .collect().map(r => r.getLong(0) -> BigInt(r.getLong(2))).toMap
      got == want
    }

  property("t21: BPE merges equal the textbook fold on random corpora") =
    Prop.forAll(
      Gen.nonEmptyListOf(Gen.zip(
        // tiny alphabet + short words force heavy pair collisions,
        // repeat runs ("aaaa"), and merged-symbol reuse — the regimes
        // where the delimiter-string formulation could diverge
        Gen.chooseNum(2, 6).flatMap(n =>
          Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString)),
        Gen.chooseNum(1, 9)))) { wordCounts =>
      val counts = wordCounts.groupBy(_._1).view
        .mapValues(_.map(_._2.toLong).sum).toMap
      val want = graft.queries.BpeReference.merges(
        counts, graft.queries.TextOps.MergeRounds)
      // the engine requires full merge capacity (it assert-guards a dry
      // round); only drive it on samples where 8 rounds are live
      if (want.length < graft.queries.TextOps.MergeRounds) Prop.passed
      else {
        val dir = java.nio.file.Files.createTempDirectory("t21p_").toString
        val text = counts.toSeq.sortBy(_._1)
          .flatMap { case (w, n) => Seq.fill(n.toInt)(w) }.mkString(" ")
        Seq((1L, text)).toDF("doc_id", "text")
          .selectExpr("doc_id", "text", "'en' AS lang", "'fix' AS source",
            "CAST(length(text) AS LONG) AS n_chars")
          .coalesce(1).write.parquet(s"$dir/documents.parquet")
        val got = graft.queries.TextOps.bpeMerges(spark, dir).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2),
            r.getLong(3))).toSeq
        Prop(got == want) :| s"got=$got want=$want corpus=$counts"
      }
    }

  property("J3: every in-range offset aligns to exactly one sentence") =
    Prop.forAll(Gen.nonEmptyListOf(sentenceGen)) { sents =>
      val df = sents.zipWithIndex
        .map { case (s, i) => (1L, i, s) }
        .toDF("episode_id", "sentence_index", "sentence_text")
      val spans = Entities.sentenceSpans(df)
      val total = sents.map(_.length + 1).sum
      val probes = (0 until total)
        .map(b => (1L, s"e$b", "PERSON", b.toLong))
        .toDF("episode_id", "entity_text", "entity_type", "begin_off")
      Entities.align(probes, spans).count() == total.toLong
    }
}
