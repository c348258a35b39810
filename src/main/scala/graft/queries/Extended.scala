package graft.queries

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Remaining SURVEY §2 inventory rows as oracle-checked queries: the
  * declared-but-unqueried episode⋈time join (J5), top-1-per-key (W3),
  * and set union (U1), plus an approx-distinct demo from the
  * beyond-reference tier.
  */
object Extended {

  /** J5 + E8 — fact ⋈ derived time dimension: build the time dim from
    * distinct order dates (exactly how FeedIngest builds it from episode
    * dates), join back, aggregate by year. The dim is broadcast.
    */
  def dateDimJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("date"))
    // long, not int: DuckDB EXTRACT(year) is BIGINT and the local
    // type-strict selfcheck holds Spark to the oracle's exact types
    val timeDim = o.select(col("date")).distinct()
      .select(col("date"), year(col("date")).cast("long").as("year"),
        month(col("date")).as("month_number"))
    o.join(broadcast(timeDim), Seq("date"))
      .groupBy(col("year"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("year"))
  }

  /** W3 — top-1 per key (`lambda_3.py:57-68`: most recent undownloaded
    * episode per podcast): most recent order per customer, deterministic
    * tiebreak on orderkey, bounded key range for output size.
    */
  def top1PerKey(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey"))
    orders(spark, dir)
      .filter(col("o_custkey") < 100)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("latest_date"))
      .orderBy(col("o_custkey"))
  }

  /** U1 — union with dedup (`lambda_1.py:70-72`: hardcoded feeds ∪
    * scraped feeds): brands from two disjoint size filters.
    */
  def unionBrands(spark: SparkSession, dir: String): DataFrame = {
    val p = part(spark, dir)
    p.filter(col("p_size") < 5).select(col("p_brand"))
      .unionByName(p.filter(col("p_size") > 45).select(col("p_brand")))
      .distinct()
      .orderBy(col("p_brand"))
  }

  /** Distinct aggregates (beyond-reference §7: the exact baseline for
    * sketch-based `approx_count_distinct`, which has no cross-engine
    * oracle — HLL implementations differ, so the approx variant is
    * exposed on the API but the gate checks the exact form).
    */
  def distinctCounts(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** x5 — semi-structured JSON extraction over the event stream's
    * `props` payload: `get_json_object` pulls the typed field out of
    * the JSON string per row (codegen'd path expression, no UDF), then
    * a per-type hash aggregate. The shape every event pipeline runs on
    * schemaless payload columns; at 100 TB the extraction is a pure
    * projection inside the scan stage and the aggregate shuffles one
    * small row per event_type.
    *
    * The money sum is quantized to integer cents BEFORE the aggregate
    * (sum of doubles is summation-order-dependent; sum of longs is
    * exact) — `round(value·100)` is the same half-up on identical IEEE
    * doubles in both engines.
    */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        col("user_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("cents")).as("sum_value_cents"))
      .orderBy(col("event_type"))

  /** x6 — ROLLUP grouping sets: per-(year, month) order counts and
    * exact money totals with YEAR subtotals and a grand total in one
    * pass (grouping sets (yr,mo), (yr), ()) — the OLAP cube family (`GROUP BY ROLLUP`). Spark expands
    * grouping sets inside a single hash aggregate (each input row feeds
    * its grouping-set combinations map-side), so the shape stays one
    * shuffle regardless of how many levels roll up. NULL group keys are
    * projected to -1 sentinels: the output carries no NULLs, keeping
    * the cross-engine sort order unambiguous (Spark sorts NULLs first,
    * DuckDB last — sentinels sidestep the divergence).
    */
  def rollupOrders(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .select(
        year(col("o_orderdate").cast("date")).cast("long").as("yr"),
        month(col("o_orderdate").cast("date")).cast("long").as("mo"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .rollup(col("yr"), col("mo"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("sum_cents"))
      .select(
        coalesce(col("yr"), lit(-1L)).as("year"),
        coalesce(col("mo"), lit(-1L)).as("month"),
        col("n_orders"), col("sum_cents"))
      .orderBy(col("year"), col("month"))

  /** x16 — CUBE grouping sets, completing x6's ROLLUP: all FOUR
    * aggregation granularities over (event_type, user cohort) — both
    * dims, each dim alone, grand total — in ONE hash-agg pass (Spark
    * plans `Expand` + a single aggregate; four separate GROUP BYs would
    * scan and shuffle four times). Same sentinel discipline as x6:
    * grouping-NULLs become 'ALL' / -1 so cross-engine NULL ordering
    * never matters; sums are integer cents.
    */
  def cubeEvents(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(
        col("event_type").as("et"),
        (col("user_id") % 10).as("ch"),
        round(col("value") * 100).cast("long").as("cents"))
      .cube(col("et"), col("ch"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
      .select(
        coalesce(col("et"), lit("ALL")).as("event_type"),
        coalesce(col("ch"), lit(-1L)).as("cohort"),
        col("n_events"), col("sum_cents"))
      .orderBy(col("event_type"), col("cohort"))

  /** x17 — explicit GROUPING SETS, the general form x6's ROLLUP and
    * x16's CUBE specialize: the asymmetric set list ((yr,pri), (yr),
    * (pri)) — detail plus BOTH one-dim marginals, NO grand total —
    * which rollup cannot express (its sets nest) and cube overshoots
    * (it would add the grand total). One `Expand` + ONE hash-agg pass,
    * same as x6/x16: each input row feeds its three grouping-set
    * combinations map-side, so the multi-granularity report still
    * costs a single shuffle. Set identity is carried by the sentinel
    * pattern itself (exactly one of year/priority is -1/'ALL' on the
    * marginal rows) — no grouping_id() in the output, whose bit order
    * is an engine-convention hazard the sentinels sidestep entirely.
    */
  def groupingSetsOrders(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .select(
        year(col("o_orderdate").cast("date")).cast("long").as("yr"),
        col("o_orderpriority").as("pri"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupingSets(
        Seq(Seq(col("yr"), col("pri")), Seq(col("yr")), Seq(col("pri"))),
        col("yr"), col("pri"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("sum_cents"))
      .select(
        coalesce(col("yr"), lit(-1L)).as("year"),
        coalesce(col("pri"), lit("ALL")).as("priority"),
        col("n_orders"), col("sum_cents"))
      .orderBy(col("year"), col("priority"))

  /** x7 — pivot (long→wide reshaping): per-user money totals with
    * event types as columns. The value list is EXPLICIT — with it the
    * pivot is a single pass of conditional aggregates (exactly the
    * CASE-WHEN form the oracle writes); without it Spark must first run
    * a distinct-values job to discover the columns, a second scan a
    * 100 TB pipeline shouldn't pay. Missing cells coalesce to 0.
    */
  def pivotEvents(spark: SparkSession, dir: String): DataFrame =
    wideEvents(spark, dir).orderBy(col("user_id"))

  /** The unsorted wide frame x7 and x15 share — x15 must melt the
    * PRE-sort form, or x7's presentation sort becomes a wasted range
    * exchange buried inside the melt.
    */
  private def wideEvents(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .filter(col("user_id") < 30)
      .select(
        col("user_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "view", "purchase"))
      .agg(sum(col("cents")))
      .select(
        col("user_id"),
        coalesce(col("click"), lit(0L)).as("click_cents"),
        coalesce(col("view"), lit(0L)).as("view_cents"),
        coalesce(col("purchase"), lit(0L)).as("purchase_cents"))

  /** x15 — unpivot / wide→long reshaping, x7's exact dual (the melt
    * every feature-matrix → (entity, feature, value) normalization
    * runs): take x7's per-user wide cents row and emit one row per
    * (user, event_type). Native `Dataset.unpivot` plans as a single
    * Expand — a per-row projection with NO shuffle and no
    * distinct-values discovery; the only exchange in the query is the
    * one hash agg x7 already paid for the wide input. Round-trip
    * (x7 ∘ x15 = identity on the long form) is spec'd.
    */
  def unpivotEvents(spark: SparkSession, dir: String): DataFrame =
    wideEvents(spark, dir)
      .select(
        col("user_id"),
        col("click_cents").as("click"),
        col("view_cents").as("view"),
        col("purchase_cents").as("purchase"))
      .unpivot(
        Array(col("user_id")),
        Array(col("click"), col("view"), col("purchase")),
        "event_type", "cents")
      .orderBy(col("user_id"), col("event_type"))

  val BigOrderDollars = 300000

  /** x8 — left-semi and left-anti joins as first-class plan nodes (the
    * EXISTS / NOT EXISTS duals): customers with a >$300k order (semi,
    * bounded to custkey < 100) and customers with none (anti — the
    * J4/E6 dedup-insert primitive as a query). Both probe the same
    * filtered orders side; semi/anti joins shuffle only the keys and
    * emit at most one row per left row — no fan-out, the join shape
    * that never explodes at scale.
    */
  def semiAnti(spark: SparkSession, dir: String): DataFrame = {
    val big = orders(spark, dir)
      .filter(col("o_totalprice") > BigOrderDollars)
      .select(col("o_custkey"))
    val c = customer(spark, dir).select(col("c_custkey"), col("c_name"))
    val semi = c.filter(col("c_custkey") < 100)
      .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .withColumn("kind", lit("has_big_order"))
    val anti = c
      .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
      .withColumn("kind", lit("no_big_order"))
    semi.unionByName(anti).orderBy(col("c_custkey"), col("kind"))
  }

  /** x9 — exact interpolated percentiles over integer cents: Spark's
    * `percentile` and DuckDB's `quantile_cont` share the linear-
    * interpolation definition, and on exact integer inputs the
    * interpolation arithmetic is the same IEEE expression — probed
    * bit-identical across engines at every SF before registering (the
    * approx_percentile sketch variant has no cross-engine oracle, same
    * status as approx_count_distinct).
    *
    * Scale note: exact percentiles sort each group's values — fine for
    * bounded per-group cardinality; an unbounded 100 TB group uses the
    * t-digest/approx path this query is the exact baseline for.
    */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(
        col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"))
      .agg(
        expr("percentile(cents, 0.5)").as("p50_cents"),
        expr("percentile(cents, 0.95)").as("p95_cents"))
      .orderBy(col("event_type"))

  /** x10 — EXCEPT and INTERSECT (with U1's union, the full §2.7 set-
    * operation family), on a corpus-shaped problem: the 3-gram shingle
    * vocabulary unique to source src0 vs shared with src1 — the
    * "what does this crawl contribute that the other lacks" question.
    * Reuses the session-cached df-capped shingles; both output branches
    * are live at every SF (probed: the closed word lexicon makes
    * per-source WORD sets identical, shingle sets not).
    *
    * One-pass formulation: `s0 EXCEPT s1` and `s0 INTERSECT s1` each
    * plan as their own distinct + join over the shingle sets — two full
    * aggregate passes for one partition of the same set. A single
    * groupBy(sh) with two boolean membership flags computes both
    * branches in ONE shuffle (map-side partial combine on the flags),
    * then `kind` is a pure projection of the flags — same output,
    * strictly less work at any scale.
    */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val sh = graft.queries.Dedup.cachedShingles(spark, dir)
      .join(documents(spark, dir).select(col("doc_id"), col("source")), "doc_id")
      .filter(col("source").isin("src0", "src1"))
    sh.groupBy(col("sh"))
      .agg(
        max(when(col("source") === "src0", 1).otherwise(0)).as("in0"),
        max(when(col("source") === "src1", 1).otherwise(0)).as("in1"))
      .filter(col("in0") === 1)
      .select(
        col("sh"),
        when(col("in1") === 1, lit("shared")).otherwise(lit("src0_only"))
          .as("kind"))
      .orderBy(col("sh"), col("kind"))
  }

  /** x11 — the HLL++ sketch variant of x4 (bench-only: sketch estimates
    * have no cross-engine oracle — DuckDB's HLL differs, so the driver
    * records a rows-only check; x4 is the exact baseline next to it).
    * This is the 100 TB rationale made measurable: approx_count_distinct
    * keeps a bounded sketch per group (map-side combinable — the shuffle
    * carries one sketch per (partition, group), never the distinct
    * values themselves), where exact countDistinct expands every
    * distinct value into the aggregate. The opt-in Catalyst rule
    * `plans/ApproxDistinctRewrite` rewrites x4's form into this one.
    */
  def approxDistinctCounts(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("n_parts"),
        approx_count_distinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** x19 Count-Min-Sketch parameters: ε·N additive overestimate bound
    * at `CmsConf` confidence; the fixed seed makes the sketch — whose
    * counters are order-independent SUMS — fully deterministic on
    * given data, so the spec's bound checks are stable, not flaky.
    */
  val CmsEps = 0.0001
  val CmsConf = 0.99
  val CmsSeed = 42
  val CmsTopK = 15

  /** x19 — Count-Min-Sketch heavy hitters (Cormode & Muthukrishnan
    * 2005), completing the sketch family next to x11's HLL++ (distinct
    * count) and x12's t-digest (quantiles) with the FREQUENCY sketch:
    * per-key counts from a fixed-size mergeable array of counters —
    * one linear pass, no shuffle of keys, the only per-key-count shape
    * that survives 100 TB of words (`DataFrameStatFunctions
    * .countMinSketch` aggregates per-partition sketches and merges —
    * the treeAggregate posture). CMS errs UPWARD only: estimate ∈
    * [true, true + ε·N] w.p. `CmsConf` — the spec pins both sides on
    * the testdata (deterministic under the fixed seed).
    *
    * Bench-only like x11/x12 (sketch internals are engine-private; no
    * DuckDB oracle by nature — driver records rows-only): q8's exact
    * word frequency is the oracle-checked twin, and doubles here as
    * the candidate source — production probes known keys or a sampled
    * candidate set against the sketch precisely to SKIP the exact agg;
    * the 15-row candidate collect is bounded control data (p9
    * discipline).
    */
  def cmsHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val words = TextOps.cachedWords(spark, dir)
    // r17 opt (guide §2.3): exact candidate counts ride the cached
    // (doc_id, word, tf) frame — the word-keyed aggregate shuffles
    // pre-combined per-doc type rows instead of raw occurrences
    // (Σ tf over docs = occurrence count, exactly). The sketch pass
    // below stays on the occurrence stream — that IS the operator.
    val candidates = TextOps.cachedTfidf(spark, dir)
      .groupBy(col("word")).agg(sum(col("tf")).as("exact_n"))
      .orderBy(col("exact_n").desc, col("word"))
      .limit(CmsTopK)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val sketch = words.select(col("word"))
      .stat.countMinSketch("word", CmsEps, CmsConf, CmsSeed)
    candidates
      .map { case (w, n) =>
        val est = sketch.estimateCount(w)
        (w, n, est, est - n)
      }
      .toDF("word", "exact_n", "cms_n", "overestimate")
      .orderBy(col("exact_n").desc, col("word"))
  }

  /** x12 — the t-digest sketch variant of x9 (bench-only, same
    * no-cross-engine-oracle status as x11): approx_percentile holds a
    * fixed-size quantile sketch per group instead of buffering and
    * sorting every value — the only percentile shape that survives an
    * unbounded 100 TB group.
    */
  def approxPercentiles(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(
        col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"))
      .agg(
        expr("approx_percentile(cents, 0.5)").as("p50_cents"),
        expr("approx_percentile(cents, 0.95)").as("p95_cents"))
      .orderBy(col("event_type"))

  /** Salt fan-out for the x13 skew demo — each hot key spreads across
    * this many shuffle tasks.
    */
  val SaltFactor = 8

  /** x13 — skew-mitigated join via `operators.SkewJoin.saltedJoin`, on
    * a GENUINELY skewed key: `event_type` has 3 values over the whole
    * event stream, so a plain shuffle join on it funnels each type's
    * entire volume through one task — at 100 TB, three tasks do all the
    * work (the hot-key dual of the d2 shingle cap). Salting rewrites the
    * join key to (event_type, salt): the big side takes a
    * content-derived salt, the 3-row dim replicates `SaltFactor` ways,
    * and each type now spreads across 8 tasks. Result set is provably
    * identical to the plain join (SkewJoinSpec asserts it, and the
    * oracle computes the unsalted form); AQE's skew handling covers the
    * sort-merge cases automatically — this operator is for the plans
    * AQE can't rewrite.
    */
  def saltedJoinDemo(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = events(spark, dir).select(
      col("event_type"), col("user_id"),
      round(col("value") * 100).cast("long").as("cents"))
    val dim = Seq(("click", 1L), ("view", 2L), ("purchase", 3L))
      .toDF("event_type", "type_weight")
    graft.operators.SkewJoin.saltedJoin(ev, dim, "event_type", SaltFactor)
      .filter(col("user_id") < 50)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("cents") * col("type_weight")).as("weighted_cents"))
      .orderBy(col("user_id"))
  }

  /** x14 — the ranking-window family as first-class inventory (rank /
    * dense_rank / cume_dist / ntile): per-customer order ranking by
    * priority class. Two window specs on the SAME partitioning: the
    * tied ordering (priority) feeds rank/dense_rank/cume_dist — all
    * deterministic under ties by definition — while ntile runs over the
    * tie-broken total order (ntile assigns by row position, so a tied
    * ordering would make it nondeterministic; the tiebreak pins it).
    * One shuffle on o_custkey serves both specs (same partitioning →
    * one Exchange, two sorts at most). cume_dist emits exact ratios of
    * window row counts — IEEE division of small ints, cross-engine
    * bit-stable.
    */
  def rankFamily(spark: SparkSession, dir: String): DataFrame = {
    val byPriority = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderpriority"))
    val total = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
    orders(spark, dir)
      .filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderpriority"))
      .withColumn("rnk", rank().over(byPriority).cast("long"))
      .withColumn("drnk", dense_rank().over(byPriority).cast("long"))
      .withColumn("cume", cume_dist().over(byPriority))
      .withColumn("tile4", ntile(4).over(total).cast("long"))
      .orderBy(col("o_custkey"), col("o_orderpriority"), col("o_orderkey"))
  }

  /** Keyset bound for x18's probe side: pairs are emitted only when
    * the smaller custkey is ≤ this, keeping the oracle's brute-force
    * replay (bound × corpus lev calls) tractable at every SF.
    */
  private val FuzzyProbeMaxKey = 600

  /** x18 — fuzzy self-join under edit distance ≤ 1 (entity-resolution
    * blocking): customer records whose names differ by one edit are
    * candidate duplicate entities. The naive formulation is a theta-
    * join (`abs(len(a)-len(b)) ≤ 1 AND levenshtein ≤ 1`) — a nested-
    * loop cartesian at any scale. Instead: SymSpell-style deletion-
    * neighborhood blocking — each name emits itself plus every
    * single-character deletion as join keys; two strings within one
    * edit ALWAYS share a key (substitution → same delete-at-p;
    * insert/delete → one side's deletion equals the other), so a pure
    * EQUI-join on the key finds every candidate and the codegen'd
    * `levenshtein` residual keeps only true pairs. Work ∝ Σ
    * bucket-pair sizes (name-length keys per row, near-unique
    * buckets), never |A|×|B|; at 100 TB the incoming batch explodes
    * its ~L keys per row and hash-joins the reference set's key index
    * — no inequality condition anywhere, so Catalyst plans a shuffled
    * (or broadcast) hash join, never BroadcastNestedLoop.
    *
    * The oracle replays the BRUTE-FORCE definition, so the driver's
    * hash compare also certifies the blocking is lossless.
    */
  def fuzzyJoin(spark: SparkSession, dir: String): DataFrame = {
    // r18 opt (guide §2.5 input skew): the customer file is a 1-split
    // scan, so BOTH the broadcast build (explode + hash) and the probe
    // stream (explode + join + levenshtein) ran as single ~300 ms
    // tasks. A deterministic hash repartition on the key spreads the
    // per-row work across the cores; the candidate volume itself was
    // measured harmless (63k candidate rows → 15k lev-1 rows at sf0.1
    // — the deletion-key blocking is ~4× over-generation, not the
    // bottleneck the length-band refinement was proposed for).
    val c = customer(spark, dir)
      .select(col("c_custkey"), lower(col("c_name")).as("name"))
      .repartition(
        spark.sparkContext.defaultParallelism, col("c_custkey"))
    def delKeys(n: Column): Column =
      array_distinct(concat(
        array(n),
        transform(
          sequence(lit(1), length(n)),
          i => concat(n.substr(lit(1), i - 1),
            n.substr(i + 1, length(n) - i)))))
    def keyed(df: DataFrame, prefix: String): DataFrame =
      df.select(
        col("c_custkey").as(s"${prefix}_custkey"),
        col("name").as(s"${prefix}_name"),
        explode(delKeys(col("name"))).as("k"))
    val probe = keyed(c.filter(col("c_custkey") <= FuzzyProbeMaxKey), "a")
    val build = keyed(c, "b")
    probe.join(build, "k")
      .filter(col("a_custkey") < col("b_custkey"))
      // levenshtein residual BEFORE the dedup shuffle (guide §2.3):
      // a candidate pair shares up to ~L deletion keys, so the
      // pre-distinct frame is ~L× the pair set; the residual is cheap
      // codegen (short names) and drops non-duplicates before the
      // Exchange instead of after it. lev is a pure function of the
      // names, so distinct over (+lev) keeps the identical pair set.
      .withColumn(
        "lev", levenshtein(col("a_name"), col("b_name")).cast("long"))
      .filter(col("lev") === 1L)
      .select(
        col("a_custkey"), col("b_custkey"), col("a_name"), col("b_name"),
        col("lev"))
      .distinct()
      .orderBy(col("a_custkey"), col("b_custkey"))
  }

  /** x20 build-side predicate: ~10% of orders at every SF, so the
    * bloom prunes ~90% of the probe side pre-shuffle — selective
    * enough that the runtime-filter shape actually pays.
    */
  val BloomOrderDollars = 450000

  /** False-positive probability for the x20 bloom: 1% keeps the filter
    * a few KB per million build keys while letting only ~1% of
    * non-matching probe rows through to the residual join.
    */
  val BloomFpp = 0.01

  /** x20 — Bloom-pruned join (the "runtime filter" / sideways-
    * information-passing shape Spark's own
    * `InjectRuntimeFilter`/`BloomFilterMightContain` rule applies
    * under AQE, written out as a first-class operator): the selective
    * build side (orders > $450k, ~10% of keys) folds its join keys
    * into a fixed-size Bloom filter, the filter broadcasts to every
    * probe task, and the 100×-bigger probe side (lineitem) drops ~90%
    * of its rows INSIDE the scan stage — before paying the shuffle.
    * The residual equi-join then removes the bloom's ≤1% false
    * positives, so the result is EXACTLY the plain join's (false
    * negatives are impossible by construction) — which is why, unlike
    * the p10 contamination probe, this query is fully oracle-checked:
    * the oracle replays the unpruned join.
    *
    * 100 TB posture: the win is shuffle bytes — the probe side
    * shuffles 10% of itself instead of 100%. The build side may be
    * far too big to broadcast AS ROWS (no broadcast-hash join) while
    * its bloom is still KB–MB (8–10 bits/key at 1% fpp): the probe is
    * branch-free hashing in the scan. The bloom build is FIT-time
    * control data (memoized per session/dir, the p10/k-means
    * discipline); the probe is Spark's own `BloomFilterMightContain`
    * Catalyst expression via [[graft.functions.BloomProbe]] — the
    * exact expression AQE's InjectRuntimeFilter plants — so it runs
    * inside WholeStageCodegen rather than as a boxed per-row UDF, and
    * the filter bytes ride the stage's torrent-broadcast task binary
    * (fetched once per executor, the same distribution story the old
    * explicit broadcast + UDF closure had).
    */
  /** The memoized broadcast bloom of x20's build-side keys (exposed to
    * the spec, which bounds the false-positive rate against it).
    */
  private[queries] def x20Bloom(spark: SparkSession, dir: String)
      : org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter] =
    SessionCache.memo(spark, dir, "x20Bloom") {
      val big = orders(spark, dir)
        .filter(col("o_totalprice") > BloomOrderDollars)
        .select(col("o_orderkey"))
      val n = big.count()
      spark.sparkContext.broadcast(
        big.stat.bloomFilter("o_orderkey", math.max(n, 1L), BloomFpp))
    }

  /** Root of the Verify-dumped bloom bytes (one file per source dir —
    * the bloom's key set is SF-dependent, so a cross-dir file would
    * admit false NEGATIVES and break the exactly-the-plain-join
    * contract). The s5 centroid dump-then-read discipline, applied to
    * the bloom after the r9/r10 driver artifacts twice lost exactly
    * this query's verify row: with the file present (Verify dumps it
    * before the query pass), the registered query path runs NO
    * `stat.bloomFilter` build job — the one structural job x20 alone
    * used to carry.
    */
  val BloomDumpRoot = graft.RepoPaths.target("graft_x20_bloom")

  private def bloomDumpFile(dir: String): java.nio.file.Path =
    java.nio.file.Paths.get(BloomDumpRoot,
      java.lang.Integer.toHexString(
        new java.io.File(dir).getAbsolutePath.hashCode) + ".bloom")

  /** Build + serialize the x20 bloom and write it beside the other
    * fit-time dumps — called by Verify before the query pass.
    */
  def dumpBloom(spark: SparkSession, dir: String): Unit = {
    val bytes = graft.functions.BloomProbe.serialize(x20Bloom(spark, dir).value)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(BloomDumpRoot))
    java.nio.file.Files.write(bloomDumpFile(dir), bytes)
  }

  /** The bloom's wire bytes: the Verify-dumped file when present
    * (dump-then-read — zero build jobs in the query path), else built
    * in-session (Bench/spec runs, where no dump phase ran). Both
    * sources are bit-identical: bloom insertion is an OR of hash
    * positions, so the bit array is deterministic in (keys, n, fpp)
    * regardless of partition merge order.
    */
  private def bloomBytes(spark: SparkSession, dir: String): Array[Byte] =
    SessionCache.memo(spark, dir, "x20BloomBytes") {
      val f = bloomDumpFile(dir)
      if (java.nio.file.Files.exists(f)) java.nio.file.Files.readAllBytes(f)
      else graft.functions.BloomProbe.serialize(x20Bloom(spark, dir).value)
    }

  def bloomPrunedJoin(spark: SparkSession, dir: String): DataFrame = {
    val big = orders(spark, dir)
      .filter(col("o_totalprice") > BloomOrderDollars)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val bfBytes = bloomBytes(spark, dir)
    lineitem(spark, dir)
      .select(
        col("l_orderkey"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .filter(
        graft.functions.BloomProbe.mightContainLong(bfBytes, col("l_orderkey")))
      .join(big, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lineitems"),
        sum(col("cents")).as("sum_cents"))
      .orderBy(col("o_orderpriority"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // x21_bloom_prune2 (r11's one-round A/B alias of this key) retired
    // in r12 per the pre-registered decision rule: both keys landed
    // green in CORRECTNESS_r11, proving the task-embedded
    // df.stat.bloomFilter bytes were the cause and the dump-phase
    // bloom build (Verify.scala) is the durable fix.
    "x20_bloom_join" -> bloomPrunedJoin,
    "x18_fuzzy_join" -> fuzzyJoin,
    "x10_set_ops" -> setOps,
    "x14_rank_family" -> rankFamily,
    "x13_salted_join" -> saltedJoinDemo,
    "x11_approx_distinct" -> approxDistinctCounts,
    "x19_cms_heavy_hitters" -> cmsHeavyHitters,
    "x12_approx_percentiles" -> approxPercentiles,
    "x7_pivot" -> pivotEvents,
    "x15_unpivot" -> unpivotEvents,
    "x8_semi_anti" -> semiAnti,
    "x9_percentiles" -> percentiles,
    "x6_rollup" -> rollupOrders,
    "x16_cube" -> cubeEvents,
    "x17_grouping_sets" -> groupingSetsOrders,
    "x5_json_extract" -> jsonExtract,
    "x1_date_dim_join" -> dateDimJoin,
    "x2_top1_per_key" -> top1PerKey,
    "x3_union_brands" -> unionBrands,
    "x4_distinct_counts" -> distinctCounts)

  val oracleSql: Map[String, String] = Map(
    // x20: the UNPRUNED join — the bloom admits no false negatives and
    // the residual equi-join removes its false positives, so the plain
    // form IS the correctness contract (the x13 salting argument)
    "x20_bloom_join" ->
      s"""SELECT o_orderpriority,
                 COUNT(*) AS n_lineitems,
                 CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                   AS BIGINT) AS sum_cents
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_totalprice > $BloomOrderDollars
          GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    // the blocking-free brute force: if Spark's deletion-neighborhood
    // blocking dropped ANY true pair, the hashes would diverge
    "x18_fuzzy_join" ->
      s"""WITH c AS (SELECT c_custkey, lower(c_name) AS name FROM customer)
          SELECT a.c_custkey AS a_custkey, b.c_custkey AS b_custkey,
                 a.name AS a_name, b.name AS b_name,
                 CAST(levenshtein(a.name, b.name) AS BIGINT) AS lev
          FROM c a JOIN c b
            ON a.c_custkey < b.c_custkey
           AND a.c_custkey <= $FuzzyProbeMaxKey
           AND abs(length(a.name) - length(b.name)) <= 1
          WHERE levenshtein(a.name, b.name) = 1
          ORDER BY a_custkey, b_custkey""",
    "x14_rank_family" ->
      """SELECT o_custkey, o_orderkey, o_orderpriority,
                CAST(rank() OVER wp AS BIGINT) AS rnk,
                CAST(dense_rank() OVER wp AS BIGINT) AS drnk,
                cume_dist() OVER wp AS cume,
                CAST(ntile(4) OVER wt AS BIGINT) AS tile4
         FROM orders WHERE o_custkey < 100
         WINDOW wp AS (PARTITION BY o_custkey ORDER BY o_orderpriority),
                wt AS (PARTITION BY o_custkey
                       ORDER BY o_orderpriority, o_orderkey)
         ORDER BY o_custkey, o_orderpriority, o_orderkey""",
    // the UNSALTED join: salting only changes physical distribution,
    // so the plain form IS the correctness contract for x13
    "x13_salted_join" ->
      """WITH dim(event_type, type_weight) AS (
           VALUES ('click', 1), ('view', 2), ('purchase', 3))
         SELECT user_id, COUNT(*) AS n_events,
                CAST(SUM(CAST(ROUND(value * 100) AS BIGINT) * type_weight) AS BIGINT)
                  AS weighted_cents
         FROM events JOIN dim USING (event_type)
         WHERE user_id < 50
         GROUP BY user_id ORDER BY user_id""",
    // the shingle CTE is Dedup's OWN definition (words → 3-grams →
    // df-cap), interpolated rather than copied: a future change to the
    // word-split or cap semantics lands in exactly one place for both
    // the Spark session cache and every oracle that mirrors it.
    "x10_set_ops" ->
      s"""WITH ${graft.queries.Dedup.shinglesCte},
          ss AS (
            SELECT s.sh, d.source FROM shingles s
            JOIN documents d USING (doc_id)
            WHERE d.source IN ('src0', 'src1')),
          flags AS (
            SELECT sh,
                   MAX(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS in0,
                   MAX(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS in1
            FROM ss GROUP BY sh)
          SELECT sh, CASE WHEN in1 = 1 THEN 'shared' ELSE 'src0_only' END AS kind
          FROM flags WHERE in0 = 1
          ORDER BY sh, kind""",
    "x7_pivot" ->
      """SELECT user_id,
                CAST(SUM(CASE WHEN event_type='click' THEN CAST(ROUND(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS click_cents,
                CAST(SUM(CASE WHEN event_type='view' THEN CAST(ROUND(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS view_cents,
                CAST(SUM(CASE WHEN event_type='purchase' THEN CAST(ROUND(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS purchase_cents
         FROM events WHERE user_id < 30
         GROUP BY user_id ORDER BY user_id""",
    "x15_unpivot" ->
      """WITH wide AS (
           SELECT user_id,
                  CAST(SUM(CASE WHEN event_type='click' THEN CAST(ROUND(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS click,
                  CAST(SUM(CASE WHEN event_type='view' THEN CAST(ROUND(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS view,
                  CAST(SUM(CASE WHEN event_type='purchase' THEN CAST(ROUND(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS purchase
           FROM events WHERE user_id < 30 GROUP BY user_id)
         SELECT user_id, 'click' AS event_type, click AS cents FROM wide
         UNION ALL
         SELECT user_id, 'view' AS event_type, view AS cents FROM wide
         UNION ALL
         SELECT user_id, 'purchase' AS event_type, purchase AS cents FROM wide
         ORDER BY user_id, event_type""",
    "x8_semi_anti" ->
      s"""SELECT c_custkey, c_name, 'has_big_order' AS kind
          FROM customer c
          WHERE c_custkey < 100
            AND EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_totalprice > $BigOrderDollars)
          UNION ALL
          SELECT c_custkey, c_name, 'no_big_order' AS kind
          FROM customer c
          WHERE NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_custkey = c.c_custkey
                              AND o.o_totalprice > $BigOrderDollars)
          ORDER BY c_custkey, kind""",
    "x9_percentiles" ->
      """SELECT event_type,
                quantile_cont(CAST(ROUND(value*100) AS BIGINT), 0.5) AS p50_cents,
                quantile_cont(CAST(ROUND(value*100) AS BIGINT), 0.95) AS p95_cents
         FROM events GROUP BY event_type ORDER BY event_type""",
    "x17_grouping_sets" ->
      """SELECT COALESCE(CAST(EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS BIGINT), -1) AS year,
                COALESCE(o_orderpriority, 'ALL') AS priority,
                COUNT(*) AS n_orders,
                CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
         FROM orders
         GROUP BY GROUPING SETS (
           (EXTRACT(year FROM CAST(o_orderdate AS DATE)), o_orderpriority),
           (EXTRACT(year FROM CAST(o_orderdate AS DATE))),
           (o_orderpriority))
         ORDER BY year, priority""",
    "x16_cube" ->
      """SELECT COALESCE(event_type, 'ALL') AS event_type,
                COALESCE(CAST(user_id % 10 AS BIGINT), -1) AS cohort,
                COUNT(*) AS n_events,
                CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
         FROM events
         GROUP BY CUBE (event_type, user_id % 10)
         ORDER BY event_type, cohort""",
    "x6_rollup" ->
      """SELECT COALESCE(CAST(EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS BIGINT), -1) AS year,
                COALESCE(CAST(EXTRACT(month FROM CAST(o_orderdate AS DATE)) AS BIGINT), -1) AS month,
                COUNT(*) AS n_orders,
                CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
         FROM orders
         GROUP BY ROLLUP (EXTRACT(year FROM CAST(o_orderdate AS DATE)),
                          EXTRACT(month FROM CAST(o_orderdate AS DATE)))
         ORDER BY year, month""",
    "x5_json_extract" ->
      """SELECT event_type,
                COUNT(*) AS n_events,
                CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
                CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
                CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
         FROM events GROUP BY event_type ORDER BY event_type""",
    "x1_date_dim_join" ->
      """SELECT year, COUNT(*) AS n_orders FROM (
           SELECT o_orderkey, EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS year
           FROM orders)
         GROUP BY year ORDER BY year""",
    "x2_top1_per_key" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS latest_date
         FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                      row_number() OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate DESC, o_orderkey) AS rn
               FROM orders WHERE o_custkey < 100)
         WHERE rn = 1 ORDER BY o_custkey""",
    "x3_union_brands" ->
      """SELECT p_brand FROM part WHERE p_size < 5
         UNION
         SELECT p_brand FROM part WHERE p_size > 45
         ORDER BY p_brand""",
    "x4_distinct_counts" ->
      """SELECT l_returnflag,
                COUNT(DISTINCT l_partkey) AS n_parts,
                COUNT(DISTINCT l_suppkey) AS n_supps,
                COUNT(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
}
