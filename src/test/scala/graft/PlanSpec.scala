package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.matchers.should.Matchers

import graft.queries.QueryDef

/** Physical-plan assertions — the 100 TB guardrails. A query that passes
  * correctness but reads all columns, skips pushdown, or shuffles a
  * broadcastable dimension would regress at scale without failing any
  * value-level test; these specs pin the plan shape.
  */
class PlanSpec extends SparkSpec with Matchers {

  private def planOf(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sfDir)

  test("p01 scan prunes to exactly the projected columns (ReadSchema)") {
    val plan = planOf(q("p01_table_scan"))
    plan should include("ReadSchema")
    // only the three projected columns reach the parquet reader
    plan should include("o_orderkey")
    (plan should not).include("o_totalprice")
    (plan should not).include("o_orderdate")
  }

  test("p09 batch filter is pushed down to the parquet scan") {
    val plan = planOf(q("p09_batch_filter"))
    // pmod(o_orderkey, 6) = 0 itself can't push, but the scan must not
    // materialize other columns
    (plan should not).include("o_custkey")
    plan should include("Filter")
  }

  /** Count physical nodes via their formatted-mode detail headers
    * ("(3) Exchange") — tree lines would double-count.
    */
  private def nodeCount(plan: String, node: String): Int =
    raw"\(\d+\) $node".r.findAllIn(plan).length

  test("b02 star join broadcasts both dimension tables — no shuffle join") {
    val plan = planOf(q("b02_join_star"))
    nodeCount(plan, "BroadcastHashJoin") shouldBe 2
    (plan should not).include("SortMergeJoin")
    (plan should not).include("ShuffledHashJoin")
  }

  test("b01 aggregation is two-phase (map-side partial before the shuffle)") {
    val plan = planOf(q("b01_agg_lineitem"))
    plan should include("HashAggregate")
    plan.toLowerCase should include("partial")
  }

  test("b03 window top-k applies group-limit pushdown before the full sort") {
    val plan = planOf(q("b03_window_topk"))
    plan should include("WindowGroupLimit")
  }

  test("p05 anti join stays an equi-join (hashable), not a nested loop") {
    val plan = planOf(q("p05_anti_join"))
    plan should include("LeftAnti")
    (plan should not).include("BroadcastNestedLoopJoin")
  }

  test("x01 exact dedup is a single hash aggregate over one shuffle") {
    val plan = planOf(q("x01_dedup_exact"))
    plan should include("HashAggregate")
    // one Exchange for the groupBy, one for the final orderBy — no more
    nodeCount(plan, "Exchange") should be <= 2
  }

  test("x07 brute-force ANN broadcasts the query side") {
    val plan = planOf(q("x07_ann_bruteforce"))
    plan should include("Broadcast")
  }

  test("x08b IVF broadcasts the codebook — corpus vectors never shuffle for assignment") {
    val plan = planOf(q("x08b_ann_ivf"))
    plan should include("BroadcastHashJoin")
    // cell assignment is max_by partial-agg after the broadcast, no window
    plan should include("max_by")
  }

  test("x08d trained IVF embeds the codebook as a literal — no nested training subtrees") {
    // trainCodebook materializes each Lloyd iteration (collect-to-literal:
    // the codebook is nlist × dim doubles), so the returned plan carries a
    // LocalTableScan, and the consumer's corpus-scan count equals the
    // untrained x08b shape (corpus + queries) instead of growing by one
    // nested assignment subtree per training iteration.
    val plan = planOf(q("x08d_ann_ivf_trained"))
    plan should include("LocalTableScan")
    nodeCount(plan, "Scan parquet") should be <= 2
  }

  test("x56 IVF-SQ8 broadcasts the codebook and stays in the integer domain") {
    val plan = planOf(q("x56_ann_ivf_sq8"))
    // coarse assignment: broadcast codebook + map-side max_by, like x08b
    plan should include("BroadcastHashJoin")
    plan should include("max_by")
    (plan should not).include("SortMergeJoin")
    // compressed-domain scoring: no float cosine anywhere in the plan
    (plan.toLowerCase should not).include("cosine")
  }

  test("x57 paragraph dedup is explode -> digest groupBy -> join-back, never docs x docs") {
    val plan = planOf(q("x57_paragraph_dedup"))
    (plan should not).include("CartesianProduct")
    (plan should not).include("BroadcastNestedLoopJoin")
    // frequency side aggregates partially before its shuffle, and the
    // whole pipeline needs at most 4 hash exchanges (pre-distinct,
    // count-distinct, doc regroup) + the output range exchange
    plan.toLowerCase should include("partial_count(distinct")
    nodeCount(plan, "Exchange") should be <= 5
  }

  test("x58 model quality scoring is map-only — no join, no aggregate, one output sort exchange") {
    val plan = planOf(q("x58_quality_model"))
    (plan.toLowerCase should not).include("join")
    (plan should not).include("HashAggregate")
    nodeCount(plan, "Exchange") shouldBe 1
  }

  test("x18 salted join shards the hot key over (key, salt) when broadcast is off") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = planOf(q("x18_salted_join"))
      // join keys must include the salt so the shuffle spreads the hot key
      plan should include("__salt")
      (plan should not).include("BroadcastHashJoin")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  // (the old "x03 computes the feature aggregate ONCE via ReusedExchange"
  // pin is superseded: the native map-side extraction has NO feature
  // exchange to reuse — see "x03 minhash feature extraction is map-side")

  test("whole-stage codegen covers the text operators (no UDF black boxes)") {
    val df = q("x10_text_quality")
    df.collect() // AQE reveals codegen stages only in the executed final plan
    val plan = df.queryExecution.executedPlan.toString
    plan should include("*(") // WholeStageCodegen stage markers
    (plan should not).include("BatchEvalPython")
  }

  test("b09 global top-10 plans TakeOrderedAndProject, not a full sort") {
    // if the limit ever degenerates into Sort + GlobalLimit, the
    // TakeOrderedAndProject node disappears and this fails
    val plan = planOf(q("b09_tpch_q3_topk"))
    plan should include("TakeOrderedAndProject")
  }

  test("x22 top-k Aggregator runs with map-side partial aggregation") {
    // the k-capped buffer merges before the shuffle: groups*k entries
    // cross the wire, not all rows — the reason to prefer it over a window
    val plan = planOf(q("x22_topk_aggregator"))
    plan.toLowerCase should include("partial")
    plan should include("topkaggregator")
  }

  test("x08c large-query-side ANN: no forced broadcast of queries, no window sort") {
    // when the query set is too big to broadcast, the operator must not
    // pin it to a BroadcastExchange (the explicit hint is what we're
    // guarding against — AQE may still *choose* broadcast for a side that
    // proves small at runtime, which is fine), and the per-query top-k
    // must run through the bounded-state aggregator, not a window that
    // sorts every candidate row of a query in one partition
    val df = SparkEntry.queries("x08c_ann_lsh_shuffle")(spark, sfDir)
    val plan = planOf(df)
    (plan should not).include("Window")
    plan.toLowerCase should include("topkdoubleaggregator")
    plan.toLowerCase should include("partial")
    // the explicit broadcast() hint would survive into the optimized plan
    val optimized = df.queryExecution.optimizedPlan.toString
    (optimized should not).include("ResolvedHint")
  }

  test("ivfTopK broadcastProbes=false: cell join degrades to a shuffle join, top-k is bounded-state") {
    // the batch-scoring contract: a large query set must NOT be pinned to
    // a BroadcastExchange (which would OOM instead of degrading). With
    // the auto-broadcast threshold off, only the hinted codebook
    // broadcasts remain and the probe->cell candidate join plans as a
    // shuffle join; the per-query top-k runs through the bounded-state
    // aggregator instead of a window over every candidate row.
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val df = graft.operators.Similarity.ivfTopK(emb, emb, "vec_id",
        "embedding", k = 3, nlist = 8, nprobe = 2, broadcastProbes = false)
      val plan = planOf(df)
      (nodeCount(plan, "SortMergeJoin") +
        nodeCount(plan, "ShuffledHashJoin")) should be >= 1
      plan.toLowerCase should include("topkdoubleaggregator")
      plan.toLowerCase should include("partial")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("x28b as-of join is a pure union+window — no join node, minimal exchanges") {
    // the union-trick plan: ONE hash exchange for the window partition and
    // one range exchange for the output ordering; a theta-join formulation
    // would show a Join node and a |L|×|matching R| intermediate
    val plan = planOf(q("x28b_asof_join_forward"))
    (plan should not).include("Join")
    nodeCount(plan, "Exchange") should be <= 3 // window + orderBy + AQE margin
  }

  test("x32 curation pipeline: map-side chunk features, stage exchanges stay bounded") {
    // clean→chunk→minhash-dedup→quality: the chunk feature sets compute
    // map-side in each consuming branch (no collect_set exchange to
    // reuse); the remaining exchanges belong to the bucket/verify joins
    // and the downstream stages, and must not multiply per stage
    val df = q("x32_curation_pipeline")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    plan should include("graft_shingles")
    "Exchange hashpartitioning".r.findAllIn(plan).length should be <= 11
  }

  test("b05 rollup expands grouping sets in ONE aggregation pass") {
    val plan = planOf(q("b05_rollup_revenue"))
    plan should include("Expand")
    // one partial + one final aggregate over a single shuffle — no
    // per-grouping-set re-aggregation
    nodeCount(plan, "Exchange") should be <= 2
  }

  test("x35 decontamination broadcasts the eval shingle set; corpus features are map-side") {
    // eval sets are tiny next to the corpus: the membership probe must be
    // a broadcast hash join (the corpus side never shuffles on the
    // shingle hash), and since round 8 the corpus feature sets compute
    // map-side (graft_shingles) — there is no feature exchange at all,
    // only the matched-count regroup keyed on doc
    val df = q("x35_decontamination")
    val plan = planOf(df)
    nodeCount(plan, "BroadcastHashJoin") should be >= 1
    plan should include("graft_shingles")
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
    // the remaining exchanges are doc-keyed (matched-count regroup + the
    // totals join's two sides) — none carry the exploded shingle stream
    "Exchange hashpartitioning".r.findAllIn(executed).length should be <= 4
  }

  test("x37 PII redaction is map-only — no exchange except the output ordering") {
    // counting + replacement are codegen'd regexp projections over the
    // scan; the only exchange the query may contain is its orderBy's range
    // partitioning
    val df = q("x37_pii_redaction")
    val plan = planOf(df)
    nodeCount(plan, "Exchange") should be <= 1
    (plan should not).include("Join")
    df.collect() // codegen stages appear in the executed final plan
    df.queryExecution.executedPlan.toString should include("*(")
  }

  test("x40 data mixture is map-only: language-id, sample, and upsample add no shuffle") {
    // languageId is a projection, stratifiedSample a filter,
    // replicateByWeight a per-row explode — the whole mixture pipeline
    // must stay shuffle-free except the output ordering
    val plan = planOf(q("x40_data_mixture"))
    nodeCount(plan, "Exchange") should be <= 1
    (plan should not).include("Join")
    plan should include("Generate") // the epoch-replication explode
  }

  test("x43 corpus report expands the rollup in one aggregation pass") {
    val plan = planOf(q("x43_corpus_report"))
    plan should include("Expand")
    // distinct-agg rewrites add one expand+regroup; still bounded passes
    nodeCount(plan, "Exchange") should be <= 3
  }

  test("x46 centroid assignment broadcasts the centroids — the corpus never shuffles") {
    // the per-vector distance scan must probe a BroadcastExchange of the
    // (few) centroids, not shuffle the embedding table against them
    val df = q("x46_centroid_confusion")
    val plan = planOf(df)
    plan should include("BroadcastNestedLoopJoin")
    (plan should not).include("SortMergeJoin")
  }

  test("x45 source dup matrix: map-side features, exchanges bounded by the join/agg keys") {
    val df = q("x45_source_dup_matrix")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    plan should include("graft_shingles")
    "Exchange hashpartitioning".r.findAllIn(plan).length should be <= 5
  }

  test("x47 funnel is one aggregation pass — no self-join chain, no window") {
    // the 9-stage funnel must not plan as 8 range self-joins (the naive
    // SQL shape, quadratic per stage) or a global-order window: one
    // collect_list aggregate + the reached-count regroup
    val plan = planOf(q("x47_funnel"))
    (plan should not).include("Join")
    (plan should not).include("Window")
    nodeCount(plan, "Exchange") should be <= 3 // user agg + regroup + sort
  }

  test("x38 sequence packing windows per shard, never one global partition") {
    // the running sum must partition by the hash shard — a global-order
    // window would serialize the whole corpus through one task (Spark even
    // warns 'No Partition Defined for Window operation')
    val df = q("x38_sequence_packing")
    val plan = df.queryExecution.executedPlan.toString
    plan should include("Window")
    // the exchange feeding the window partitions on the shard key
    plan should include("hashpartitioning(shard")
    (plan should not).include("SinglePartition")
  }

  test("x49 distinctive terms: rank filter becomes a window group limit, windows per doc") {
    val df = q("x49_distinctive_terms")
    val plan = df.queryExecution.executedPlan.toString
    // rank <= k prunes inside each window partition BEFORE the full sort
    // materializes (the 100 TB difference between top-k and sort-everything)
    plan should include("WindowGroupLimit")
    plan should include("hashpartitioning(doc")
    (plan should not).include("SinglePartition")
  }

  test("x50 column profile: one aggregation pass (Expand), no join, no per-column scans") {
    val df = q("x50_column_profile")
    val plan = planOf(df)
    plan should include("Expand") // the exact multi-distinct shape
    (plan should not).include("Join")
    // one scan feeds everything: profile agg + final ordering only
    nodeCount(plan, "Scan parquet") shouldBe 1
  }

  test("x51 quantization is map-only — no exchange except the output ordering") {
    val df = q("x51_embedding_quantize")
    val plan = planOf(df)
    nodeCount(plan, "Exchange") should be <= 1
    (plan should not).include("Join")
  }

  test("x52 incremental dedup: hashable anti-join; in-batch groupBy reuses its partitioning") {
    val df = q("x52_incremental_dedup")
    val plan = planOf(df)
    (plan should not).include("NestedLoop")
    // exchanges: batch fingerprints, index fingerprints, final orderBy —
    // the post-anti-join aggregate must NOT add a fourth
    nodeCount(plan, "Exchange") should be <= 3
  }

  test("x60 keep-best selection folds each cluster in ONE max_by aggregate, no window") {
    // the oracle ranks with row_number; the Spark side must instead be a
    // single agg pass — a Window here would sort every cluster at 100 TB
    val plan = planOf(q("x60_dedup_keep_best"))
    plan should include("max_by")
    nodeCount(plan, "Window") shouldBe 0
    (plan should not).include("CartesianProduct")
    (plan should not).include("BroadcastNestedLoopJoin")
  }

  test("x61 incremental near-dup: map-side features per side, no quadratic fallback") {
    val df = q("x61_incremental_neardup")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    plan should include("graft_shingles")
    "Exchange hashpartitioning".r.findAllIn(plan).length should be <= 3
    (plan should not).include("CartesianProduct")
    (plan should not).include("NestedLoop")
  }

  test("x62 bloom probe: codegen'd dense-array literal probe, exact anti-join confirm") {
    val plan = planOf(q("x62_bloom_incremental_dedup"))
    // the sketch is an embedded dense-array literal probed with element_at
    // (O(1) per bit) — the bitmap bit_or fold ran eagerly at build time
    plan should include("element_at")
    plan should include("LeftAnti")         // suspects still confirmed exactly
    // no driver-object probe UDF (stat.bloomFilter's shape); the only
    // nested-loop is the one-row sketch broadcast
    (plan should not).include("BatchEvalPython")
    (plan.toLowerCase should not).include("scalaudf")
  }

  test("x63 cluster-balanced sample: map-side cell assignment, quota pushes to WindowGroupLimit") {
    val plan = planOf(q("x63_cluster_balanced_sample"))
    plan should include("max_by")           // assignment aggregates, no per-vector window
    plan should include("WindowGroupLimit") // quota keeps perCell rows per task pre-shuffle
    (plan should not).include("SortMergeJoin")
  }

  test("x64 exact quantiles: histogram aggregates partially; window runs over the histogram only") {
    val plan = planOf(q("x64_exact_quantiles"))
    // stage 1 collapses each partition to its local histogram pre-shuffle
    plan.toLowerCase should include("partial_count")
    // stage 2's cumulative window exists but consumes the aggregate, not
    // the raw scan — the scan side must never feed a Window directly
    plan should include("Window")
    nodeCount(plan, "Window") should be <= 2
    (plan should not).include("CartesianProduct")
  }

  test("x65 vocab coverage: top-V cut is TakeOrdered, vocab broadcasts to the probe") {
    val plan = planOf(q("x65_vocab_coverage"))
    plan should include("TakeOrderedAndProject") // never a full token-frequency sort
    plan should include("BroadcastHashJoin")     // V-row vocab broadcasts
    (plan should not).include("SortMergeJoin")
  }

  test("b23 correlated subquery decorrelates to an aggregate + equi-join, no per-row re-scan") {
    val plan = planOf(q("b23_correlated_subquery"))
    (plan should not).include("CartesianProduct")
    (plan should not).include("BroadcastNestedLoopJoin")
    // the subquery became a partkey aggregate feeding a join
    plan.toLowerCase should include("partial_avg")
  }

  test("x126 domain curation is map-only plus one window — no joins") {
    val plan = planOf(q("x126_domain_curation"))
    (plan should not).include("Join")
    nodeCount(plan, "Window") shouldBe 1
  }

  test("x127 compaction plan is one window cumulative sum — no joins") {
    val plan = planOf(q("x127_compaction_plan"))
    (plan should not).include("Join")
    nodeCount(plan, "Window") shouldBe 1
  }

  test("x128 luhn audit is pure map-side work — no joins, no windows, no aggregates") {
    val plan = planOf(q("x128_luhn_card_audit"))
    (plan should not).include("Join")
    (plan should not).include("Window")
    (plan should not).include("HashAggregate")
  }

  test("x130 PQ trains/encodes/scores through broadcast joins — no sort-merge") {
    val plan = planOf(q("x130_pq_adc_topk"))
    (plan should not).include("SortMergeJoin")
    plan should include("BroadcastHashJoin")
  }

  test("x125b routes extraction through the fused native expression") {
    val df = q("x125b_winnowing_native")
    df.collect() // AQE reveals codegen stages only in the executed final plan
    val plan = df.queryExecution.executedPlan.toString
    plan should include("graft_winnow")
    plan should include("*(") // WholeStageCodegen stage markers
    // the declarative HOF chain is gone
    (plan should not).include("aggregate(slice")
  }

  test("x03 minhash feature extraction is map-side — the collect_set exchange is gone") {
    val df = q("x03_dedup_minhash_lsh")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    plan should include("graft_shingles")
    // old shape: 7 hashpartitioning exchanges (the (doc, hash) shuffle
    // replicated across the reused branches); native shape: only the
    // bucket self-join + verify join remain
    "Exchange hashpartitioning".r.findAllIn(plan).length should be <= 3
  }

  test("b28 exists/not-exists pair becomes one semi and one anti join, no per-row re-scan") {
    val plan = planOf(q("b28_tpch_q21"))
    (plan should not).include("CartesianProduct")
    (plan should not).include("BroadcastNestedLoopJoin")
    plan should include("LeftSemi")
    plan should include("LeftAnti")
  }

  test("b34/b35/b36 literal TPC-H decorrelations: semi joins + one aggregate pass, no re-scan") {
    // Q4's EXISTS (correlated on the outer order's DATE, not just the
    // key) must become one left-semi join with the date condition as a
    // join filter — never a per-order lineitem re-scan
    val p4 = planOf(q("b34_tpch_q4"))
    (p4 should not).include("CartesianProduct")
    (p4 should not).include("BroadcastNestedLoopJoin")
    p4 should include("LeftSemi")
    // Q17's correlated scalar avg decorrelates into ONE per-partkey
    // aggregate joined back: aggregates = avg (partial+final) + the
    // top count/sum (partial+final) + AQE variants — bounded, not
    // one per probe row
    val p17 = planOf(q("b35_tpch_q17"))
    (p17 should not).include("CartesianProduct")
    (p17 should not).include("BroadcastNestedLoopJoin")
    nodeCount(p17, "HashAggregate") should be <= 6
    // Q18's IN-over-grouped-HAVING folds into a semi join against the
    // grouped lineitem (b25 is the hand-decorrelated twin)
    val p18 = planOf(q("b36_tpch_q18"))
    (p18 should not).include("CartesianProduct")
    (p18 should not).include("BroadcastNestedLoopJoin")
    p18 should include("LeftSemi")
  }

  test("b37/b38: Q10 broadcasts the dimensions and takes top-20 without a global sort; Q13 keeps the outer join") {
    val p10 = planOf(q("b37_tpch_q10"))
    (p10 should not).include("CartesianProduct")
    p10 should include("BroadcastHashJoin")
    p10 should include("TakeOrderedAndProject")
    // Q13's priority filter rides the JOIN CONDITION — pushing it to a
    // post-join WHERE would drop the zero-order customers; the plan must
    // keep the left-outer hash join
    val p13 = planOf(q("b38_tpch_q13"))
    (p13 should not).include("CartesianProduct")
    p13 should include("LeftOuter")
  }

  test("x155 triangle count: equi-joins only, semi-join closure, no nested loop") {
    val plan = planOf(q("x155_triangle_count"))
    (plan should not).include("CartesianProduct")
    (plan should not).include("BroadcastNestedLoopJoin")
    // the wedge-closing existence check stays a semi join
    plan should include("LeftSemi")
    // round 16: the canonical edge set and degree table are materialized
    // ONCE and consumed as RDD scans — the edge construction (scan + lag
    // window + dedup) is outside this plan entirely, so it cannot run
    // once per consumer (the pre-fix plan repeated it into 601 nodes)
    plan should include("Scan ExistingRDD")
    (plan should not).include("Window")
    // one pass credits all three triangle corners (explode, not a 3-way
    // union that re-runs the wedge join per corner)
    plan should include("explode")
    (plan should not).include("Union")
  }

  test("x150c shuffle URL gate: equi-joins only — no nested loop reaches the rule table") {
    val plan = planOf(q("x150c_url_policy_shuffle"))
    // the whole point of the shuffle shape: the rule probe is an
    // EQUALITY on the exploded prefix, never a startsWith theta join
    (plan should not).include("BroadcastNestedLoopJoin")
    (plan should not).include("CartesianProduct")
    // formatted mode writes the explode as a Generate node with the
    // function in its Arguments line
    nodeCount(plan, "Generate") should be >= 1
    plan should include("explode")
  }

  test("x156 clustering coefficient shares the edge dedup and degree shuffle with the triangle core") {
    val plan = planOf(q("x156_clustering_coefficient"))
    // the canonical edge set and the degree table are localCheckpoint'ed
    // ONCE and consumed as materialized RDD scans by all three readers
    // (two orientation joins + the output degree join) — the edge dedup
    // aggregate and the lag() window that builds the raw edges are
    // outside this plan entirely, so they cannot run twice (the round-10
    // advisory: the nested triangleCount call recomputed both)
    plan should include("Scan ExistingRDD")
    (plan should not).include("Window")
    (plan should not).include("CartesianProduct")
    plan should include("LeftSemi")
  }

  test("b39/b40: Q14 broadcasts part; Q6's whole predicate set reaches the parquet scan") {
    val p14 = planOf(q("b39_tpch_q14"))
    (p14 should not).include("CartesianProduct")
    p14 should include("BroadcastHashJoin")
    // Q6 IS predicate pushdown: date range, discount band, quantity cap
    // all land in PushedFilters on the lineitem scan
    val p6 = planOf(q("b40_tpch_q6"))
    (p6 should not).include("Join")
    p6 should include("PushedFilters")
    Seq("l_shipdate", "l_discount", "l_quantity").foreach { c =>
      p6.linesIterator.filter(_.contains("PushedFilters"))
        .mkString should include(c)
    }
  }

  test("b41-b44: Q1 one scan + map-side partials; Q9 broadcasts dims; Q11 never re-scans the fact; Q12 equi-joins") {
    // Q1: no join at all; the eight aggregates collapse map-side, the
    // one keyed exchange carries 6 slim rows, plus the output sort
    val p1 = planOf(q("b41_tpch_q1"))
    (p1 should not).include("Join")
    p1.toLowerCase should include("partial")
    nodeCount(p1, "Exchange") should be <= 2
    // Q9: five-table join — every dimension side a broadcast, never a
    // cartesian, and the LIKE filter rides the part scan
    val p9 = planOf(q("b42_tpch_q9"))
    (p9 should not).include("CartesianProduct")
    (p9 should not).include("BroadcastNestedLoopJoin")
    p9 should include("BroadcastHashJoin")
    // Q11: the global scalar subquery and the per-part aggregate BOTH
    // consume the one materialized filtered fact — no parquet scan
    // survives in the final plan (AQE defeats ReusedExchange here; the
    // b30 checkpoint discipline is the fix)
    val p11 = planOf(q("b43_tpch_q11"))
    (p11 should not).include("Scan parquet")
    p11 should include("Scan ExistingRDD")
    p11 should include("Subquery")
    // Q12: fact-fact equi-join, no nested loop
    val p12 = planOf(q("b44_tpch_q12"))
    (p12 should not).include("CartesianProduct")
    (p12 should not).include("BroadcastNestedLoopJoin")
  }

  test("x68 line dedup is map-only — array HOFs, no shuffle beyond the output sort") {
    val plan = planOf(q("x68_line_dedup"))
    (plan should not).include("HashAggregate")
    (plan should not).include("Join")
    nodeCount(plan, "Exchange") shouldBe 1 // only the output orderBy
  }

  test("x69 quality-binned sample: cuts ride a one-row broadcast; windows only over the histogram") {
    val plan = planOf(q("x69_quality_binned_sample"))
    (plan should not).include("SortMergeJoin")
    // the only windows are the quantile stage's cumulative pass over the
    // score HISTOGRAM — the doc-level path stays window-free and map-only
    nodeCount(plan, "Window") should be <= 2
    plan should include("BroadcastNestedLoopJoin") // the 3-long cuts row
  }

  test("x70 persisted-index probe never re-shingles the index — only the batch aggregates") {
    val plan = planOf(q("x70_persisted_lsh_probe"))
    // the index side is two column-pruned parquet scans of the store;
    // the only minhash signature subtrees belong to the batch (statically
    // duplicated twice: bucket side + verify side)
    "partial_collect_set".r.findAllIn(plan).length should be <= 2
    (plan should not).include("CartesianProduct")
  }

  test("x110 absorb loop: batch-2 probes read stored signatures from all three index versions") {
    val plan = planOf(q("x110_ingest_absorb"))
    // every index generation — including v2, built from batch 1's
    // admitted docs INSIDE the query — is probed via its persisted
    // stores, never re-shingled in-plan. Since round 13 the probe's
    // candidate stage (batch signatures × pruned stored buckets) is
    // checkpointed so the verify fetch can prune the features
    // partitions — the final plan therefore scans each version's
    // FEATURES dirs (partition-pruned to the candidates' f set) plus
    // the checkpointed candidate RDDs; the buckets scans live inside
    // the checkpoint stage, and NO feature-set aggregate remains (the
    // batch front end is checkpointed too)
    Seq("v0", "v1", "v2").foreach { v =>
      plan should include(s"$v/features")
    }
    "partial_collect_set".r.findAllIn(plan).length should be <= 6
    (plan should not).include("CartesianProduct")
  }

  test("x111 stored-label manifest: consumes the label artifact, no LSH recompute") {
    val plan = planOf(q("x111_manifest_from_labels"))
    // the canonical labels arrive from the persisted artifact (a parquet
    // scan of the labels store); the plan contains NO minhash/LSH
    // subtree — no feature collect_set, no signature array_min — and no
    // label-propagation checkpoint scans: the consumer is a scan-join-
    // aggregate, which is the whole point of the shared artifact
    plan should include("labels_")
    (plan should not).include("collect_set")
    (plan should not).include("array_min")
    (plan should not).include("CartesianProduct")
  }

  test("x105b/x88b label consumers: no LSH recompute — scan the artifact, join, aggregate") {
    // The round-9 consumers of the shared canonical-labels artifact: like
    // x111, neither plan may contain the minhash front end (native
    // graft_shingles/graft_minhash or the legacy collect_set/array_min
    // shapes) — the near-dup labels arrive as a parquet scan. x88b's plan
    // is checkpoint-staged, so pin its stageCheckpoints=false twin (the
    // fully-declarative shape; the staged default hides subtrees behind
    // localCheckpoint scans — the x119 lesson).
    val census = planOf(q("x105b_census_from_labels"))
    census should include("labels_")
    for (bad <- Seq("graft_shingles", "graft_minhash", "collect_set", "array_min"))
      (census should not).include(bad)
    val funnel = planOf(graft.queries.ExtensionQueries.curationFunnel(
      spark.read.parquet(s"$sfDir/documents.parquet"),
      stageCheckpoints = false,
      labelsPath = Some(graft.queries.ExtensionQueries.labelsPathForSpec(spark, sfDir))))
    funnel should include("labels_")
    // graft_shingles legitimately remains (the DECONTAMINATION stage
    // shingles corpus + eval sets); what the artifact removes is the
    // near-dup minhash signature front end.
    (funnel should not).include("graft_minhash")
  }

  test("x144b variant consumer: field extraction with ZERO re-parse; filter precedes the agg") {
    val plan = planOf(q("x144b_variant_rollup"))
    // the filter and the aggregate BOTH extract '$.k' — against the stored
    // binary VARIANT encoding, never by re-parsing the JSON string (the
    // parse ran once, at the staged table's write time)
    "variant_get".r.findAllIn(plan).length should be >= 2
    (plan should not).include("parse_json")
    // shredded access stays pre-shuffle: the variant_get predicate sits in
    // a Filter node's condition (scan side); the only exchanges are the
    // event_type aggregation's hash exchange + the output-order range
    // exchange — no extraction-induced shuffle
    "(?s)\\(\\d+\\) Filter.{0,600}?variant_get".r.findFirstIn(plan) should
      not be empty
    nodeCount(plan, "Exchange") should be <= 2
  }

  test("x117b stored-pair consumer: edges from the index scans, no re-shingling") {
    // the pair-family artifact consumer: like x111/x105b, no minhash
    // front end anywhere — candidates self-join the STORED buckets and
    // verification reads the STORED features
    val plan = planOf(q("x117b_split_leakage_from_index"))
    plan should include("lshidx_")
    for (bad <- Seq("graft_shingles", "graft_minhash", "collect_set"))
      (plan should not).include(bad)
  }

  test("x147 unicode clean is map-only: native graft_nfc in-plan, zero exchanges before the sort") {
    val plan = planOf(q("x147_unicode_clean"))
    plan should include("graft_nfc")
    // cleaning is one projection over the scan; the only exchange is the
    // output-order range partitioning
    nodeCount(plan, "Exchange") should be <= 1
  }

  test("x151 invisible clean: native graft_nfkc in-plan, map-side cleaning on both join legs") {
    val plan = planOf(q("x151_invisible_clean"))
    plan should include("graft_nfkc")
    (plan should not).include("CartesianProduct")
    // both legs are projections over the documents scan; exchanges are
    // the doc_id equi-join's two sides + the output-order partitioning
    // (AQE may broadcast one leg and drop an exchange)
    nodeCount(plan, "Exchange") should be <= 3
  }

  test("x150b robots-scale gate: per-length broadcast hash joins, zero pre-sort exchanges") {
    val plan = planOf(q("x150b_url_policy_bylength"))
    (plan should not).include("BroadcastNestedLoopJoin")
    plan should include("BroadcastHashJoin")
    // the whole gate is map-side: the only exchange is the output
    // orderBy's range partitioning — no hash exchange anywhere
    "Arguments: hashpartitioning".r.findAllIn(plan).length shouldBe 0
    // the theta twin keeps its nested-loop shape (right for config-sized
    // rule lists; the pair is the documented join-algebra trade)
    planOf(q("x150_url_policy")) should include("BroadcastNestedLoopJoin")
  }

  test("x148 token spectrum: TakeOrdered cut, never a global sort of the vocabulary") {
    val plan = planOf(q("x148_token_spectrum"))
    plan should include("TakeOrderedAndProject")
    // the windows run over the k-row result; the vocabulary-wide stages
    // are the keyed count's partial/final pair only
    plan.toLowerCase should include("partial_count")
  }

  test("p18 partition filter prunes the scan to one partition directory") {
    val df = q("p18_partition_pruning")
    val plan = planOf(df)
    plan should include("PartitionFilters")
    plan should include("month")
    // the month predicate must be a partition filter, not a post-scan Filter
    (plan should not).include("PushedFilters: [IsNotNull(month)")
  }

  test("x71 bigram table: partial counts before the shuffle, TakeOrdered cut") {
    val plan = planOf(q("x71_bigram_table"))
    plan.toLowerCase should include("partial_count")
    plan should include("TakeOrderedAndProject")
    (plan should not).include("Join")
  }

  test("x73 scd2 is one keyed window pass — no join, no self-join") {
    val plan = planOf(q("x73_scd2_history"))
    nodeCount(plan, "Window") shouldBe 1
    (plan should not).include("Join")
    (plan should not).include("SinglePartition")
  }

  test("x74 batch sessionization: session groupBy reuses the window's key partitioning") {
    val plan = planOf(q("x74_sessionize_batch"))
    (plan should not).include("Join")
    (plan should not).include("SinglePartition")
    // one exchange for the key window, one for the output sort — the
    // (key, session_idx) aggregate must NOT add a third
    nodeCount(plan, "Exchange") should be <= 2
  }

  test("x75 substring dedup: digest-keyed shuffles with partial distinct, never docs x docs") {
    val plan = planOf(q("x75_substring_dedup"))
    (plan should not).include("CartesianProduct")
    (plan should not).include("NestedLoop")
    plan.toLowerCase should include("partial_count(distinct")
  }

  test("b20 rolling revenue: RANGE frame windows per customer, single window pass") {
    val df = q("b20_window_range_rolling")
    val plan = df.queryExecution.executedPlan.toString
    plan should include("RangeFrame")
    plan should include("hashpartitioning(o_custkey")
    (plan should not).include("SinglePartition")
  }

  test("b21 TPC-H Q5: tiny dims broadcast, date filter pushed to the orders scan") {
    val df = q("b21_tpch_q5")
    val plan = planOf(df)
    nodeCount(plan, "BroadcastHashJoin") should be >= 2 // region, nation at least
    (plan should not).include("NestedLoop")
    // the o_orderdate range reaches the parquet reader as PushedFilters
    plan should include regex "PushedFilters:.*GreaterThanOrEqual\\(o_orderdate"
  }

  test("b22 rank distribution: all three rank functions share ONE window operator") {
    val df = q("b22_rank_distribution")
    val plan = planOf(df)
    // ntile/percent_rank/cume_dist share the window spec — one Window
    // node, one sort, one exchange for the partition key
    nodeCount(plan, "Window") shouldBe 1
  }

  test("x76 bm25: term filter runs map-side before the postings shuffle; df and stats broadcast") {
    val plan = planOf(q("x76_bm25"))
    // the postings (doc, term) aggregate and the df/stats join-backs are
    // broadcast-side — no sort-merge anywhere in the scoring chain
    (plan should not).include("SortMergeJoin")
    nodeCount(plan, "BroadcastHashJoin") should be >= 1
    plan should include("BroadcastNestedLoopJoin") // the 1-row stats cross join
    // the term filter sits under the first Exchange: the generated filter
    // on the exploded token appears as an `IN` over the literal query set
    plan.toLowerCase should include("spark")
  }

  test("x77 pagerank: rank state is checkpointed — the final plan embeds no per-iteration subtrees") {
    val df = q("x77_pagerank")
    val plan = planOf(df)
    // after 3 supersteps the returned plan must read rank state from the
    // checkpoint (a scan of an existing RDD), not replay the iteration
    // joins: exactly the trainCodebook/canonicalize discipline
    plan should include("Scan ExistingRDD")
    // and the events source is long gone from the final plan's lineage
    (plan should not).include("events.parquet")
  }

  test("x88 funnel: stage id-sets are checkpointed — the union replays no dedup subtree") {
    val plan = planOf(q("x88_curation_funnel"))
    // every stage id-set (exact dedup, LSH canonicalization,
    // decontamination, quality gate) is an eager localCheckpoint, so the
    // 6-branch union reads materialized id rows instead of re-executing
    // the dedup chain once per branch: the final plan must contain the
    // checkpoint scans and ZERO LSH/decontamination feature aggregates.
    // (md5 still legitimately appears: hash56 slice/shard assignment is a
    // cheap per-row expression, not the dedup chain.)
    raw"Scan ExistingRDD".r.findAllIn(plan).length should be >= 4
    (plan should not).include("collect_set")
    (plan should not).include("array_min")
  }

  test("x85 time-scoped dedup: one digest-keyed exchange feeds both window frames, no join") {
    val plan = planOf(q("x85_timescoped_dedup"))
    // lag (sliding frame) and the burst running-sum (cumulative frame)
    // are two Window operators over the SAME sort/partitioning — one
    // hash exchange on the digest, plus only the output-order range
    // exchange; nothing is joined back
    nodeCount(plan, "Window") shouldBe 2
    raw"hashpartitioning\(__fp".r.findAllIn(plan).length shouldBe 1
    (plan should not).include("Join")
  }

  test("x86 token budget: corpus collapses per source before any window; level broadcasts back") {
    val plan = planOf(q("x86_token_budget"))
    // the one-row waterfilling level rides a broadcast nested-loop join;
    // nothing corpus-sized is ever sort-merge joined
    plan should include("BroadcastNestedLoopJoin")
    (plan should not).include("SortMergeJoin")
    // token counting aggregates partially map-side before the source shuffle
    plan.toLowerCase should include("partial")
  }

  test("x90 PIT features: the as-of attach is union+window — no join of events to features") {
    val plan = planOf(q("x90_pit_features"))
    plan should include("Union")
    (plan should not).include("SortMergeJoin")
    (plan should not).include("CartesianProduct")
  }

  test("x91 rolling actives: map-side fan-out, no range join, distinct aggregates partially") {
    val plan = planOf(q("x91_rolling_actives"))
    (plan should not).include("CartesianProduct")
    (plan should not).include("NestedLoop")
    plan should include("Generate") // the windowDays explode is map-side
    plan.toLowerCase should include("partial")
  }

  test("x94 length batches: windows run per shard, never one global sort partition") {
    val df = q("x94_length_batches")
    val plan = df.queryExecution.executedPlan.toString
    plan should include("hashpartitioning(shard")
    (plan should not).include("SinglePartition")
  }

  test("x96 collocations: marginals regroup the pair table; top-k is TakeOrdered") {
    val plan = planOf(q("x96_collocations"))
    plan should include("TakeOrderedAndProject")
    (plan should not).include("CartesianProduct")
  }

  test("x97 edit-distance dedup: q-gram equi-join candidates, no nested-loop verify") {
    val plan = planOf(q("x97_editdist_dedup"))
    (plan should not).include("CartesianProduct")
    (plan should not).include("NestedLoop")
    plan should include("levenshtein")
  }

  test("x98 sorted neighborhood: per-block rank windows, neighbor join is an equi-join") {
    val df = q("x98_sorted_neighborhood")
    val plan = df.queryExecution.executedPlan.toString
    plan should include("hashpartitioning(block")
    (plan should not).include("CartesianProduct")
    (plan should not).include("NestedLoop")
  }

  test("x101 hybrid retrieval: dense leg broadcasts the query vector, no unbounded cross join") {
    val plan = planOf(q("x101_hybrid_retrieval"))
    // the only nested-loop is the broadcast of the single query vector /
    // one-row stats; the fusion itself is a union + keyed aggregate
    plan should include("BroadcastNestedLoopJoin")
    (plan should not).include("CartesianProduct")
    plan should include("Union")
  }

  test("x103 split manifest: checksum aggregates partially; no quadratic pair work outside LSH") {
    val plan = planOf(q("x103_split_manifest"))
    (plan should not).include("CartesianProduct")
    plan.toLowerCase should include("partial_bit_xor")
  }

  test("x114 source-overlap estimate path: ONE partial-min collapse pass, no corpus-sized join") {
    import graft.operators.Eval
    val plan = planOf(Eval.sourceOverlap(
      spark.read.parquet(s"$sfDir/documents.parquet"), "source", "text",
      withExact = false))
    // the signature aggregate combines map-side — the corpus collapses to
    // #sources rows before anything pairwise happens
    plan.toLowerCase should include("partial_min")
    (plan should not).include("SortMergeJoin")
    (plan should not).include("CartesianProduct")
    // pairwise compare is a nested-loop over the #sources-row aggregate —
    // bounded — and must be the ONLY nested-loop in the plan
    nodeCount(plan, "BroadcastNestedLoopJoin") shouldBe 1
  }

  test("x116 epoch shuffle: rank windows per (epoch, shard), never a global sort") {
    import graft.operators.Eval
    val df = Eval.epochShuffle(
      spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id",
      epochs = 3, shards = 8)
    val plan = df.queryExecution.executedPlan.toString
    plan should include("hashpartitioning(epoch")
    (plan should not).include("rangepartitioning")
    (plan should not).include("SinglePartition")
  }

  test("x119 BPE merges: per-word windows, vocab-bounded state, merge decision in-plan") {
    import graft.operators.TextAnalysis
    // checkpoint = false keeps the loop declarative so the per-step
    // dataflow is actually IN this plan (the default materializes each
    // step, leaving only the output union visible).
    val df = TextAnalysis.bpeMergeSteps(
      spark.read.parquet(s"$sfDir/documents.parquet"), "text", steps = 2,
      checkpoint = false)
    val plan = df.queryExecution.executedPlan.toString
    // symbol-state windows shard by word — executor-local sorts only
    plan should include("hashpartitioning(w")
    (plan should not).include("CartesianProduct")
    // the only broadcast-nested-loop inputs are the 1-row best-pair
    // tables (the in-plan merge decision); a corpus-sized nested loop
    // would show as a join with a non-singleton build side
    (plan should not).include("SortMergeJoin")
  }

  test("x78 z-order: one range exchange on zkey, morton key is pure codegen") {
    val df = q("x78_zorder_layout")
    val plan = planOf(df)
    plan should include("rangepartitioning(zkey")
    (plan should not).include("SortMergeJoin")
    (plan should not).include("CartesianProduct")
    // no UDF black box — the interleave compiles to shift/and/or
    (plan.toLowerCase should not).include("batchevalpython")
    (plan should not).include("ScalaUDF")
  }

  test("b30 argmax-over-aggregate materializes the revenue view once — no" +
      " second fact scan reaches the final plan") {
    val df = q("b30_tpch_q15")
    val plan = df.queryExecution.executedPlan.toString
    // both the max and the join read the checkpointed revenue RDD; a
    // lineitem scan in THIS plan would mean the view is recomputed
    (plan should not).include("lineitem")
    plan should include("ExistingRDD")
    (plan should not).include("SortMergeJoin")
  }

  test("b31 per-group min join-back broadcasts the part filter and the min" +
      " table — no shuffle joins, no cartesian") {
    val plan = planOf(q("b31_tpch_q2_minquote"))
    nodeCount(plan, "BroadcastHashJoin") should be >= 3
    (plan should not).include("SortMergeJoin")
    (plan should not).include("CartesianProduct")
  }

  test("b32 two-role nation joins broadcast both filtered dims — no" +
      " cartesian, no shuffle join of a 2-row dim") {
    val plan = planOf(q("b32_tpch_q7"))
    nodeCount(plan, "BroadcastHashJoin") should be >= 2
    (plan should not).include("CartesianProduct")
  }

  test("b33 market share is ONE aggregation pass — conditional sum, no" +
      " numerator/denominator self-join") {
    val plan = planOf(q("b33_tpch_q8"))
    // a self-join formulation would show two separate aggregate chains
    // joined on o_year; the conditional-sum plan has exactly one
    // partial+final pair over the fact rows
    nodeCount(plan, "HashAggregate") shouldBe 2
    (plan should not).include("CartesianProduct")
    (plan should not).include("SortMergeJoin")
  }

  test("x04 simhash signature extraction is map-side — the fused native" +
      " expression replaces the doc-keyed lane aggregation") {
    val plan = planOf(q("x04_dedup_simhash"))
    plan should include("graft_simhash")
    (plan should not).include("SortMergeJoin")
    // signatures never shuffle: the only keyed exchanges permitted are
    // the chunk self-join's (and at gated sf the dim side broadcasts,
    // so the measured plan has zero)
    "Arguments: hashpartitioning".r.findAllIn(plan).length should be <= 2
  }

  test("x135 heavy hitters: candidate filter is a broadcast join; only the" +
      " candidate recount shuffles") {
    val plan = planOf(q("x135_heavy_hitters"))
    // pass 2 filters to MG candidates map-side via broadcast — the full
    // distinct-token set must never be the shuffle key population
    nodeCount(plan, "BroadcastHashJoin") should be >= 1
    (plan should not).include("SortMergeJoin")
    // exactly two keyed exchanges, neither keyed by the full token set:
    // the distinct over the (k−1)·P-row checkpointed MG summary, and the
    // candidate-only recount after the broadcast semi filter
    "Arguments: hashpartitioning".r.findAllIn(plan).length shouldBe 2
  }

  test("x173 histogram quantiles: windows run over the bucket table only —" +
      " raw rows hit one bucket-keyed aggregate, never a sort or window") {
    val plan = planOf(q("x173_histogram_artifact_quantiles"))
    // two-phase fold into (shard, bucket) map-side, then bucket-domain
    // work: the raw 15k order rows must never feed a Window or a Sort
    plan should include("HashAggregate")
    plan.toLowerCase should include("partial")
    // both windows (cumulative sum, total) sit ABOVE the bucket
    // aggregate; the single-partition exchange they need carries the
    // ~50-bucket table, so SinglePartition appears but no raw-row sort
    nodeCount(plan, "Window") should be >= 1
    (plan should not).include("SortMergeJoin")
  }

  test("x174 matryoshka rerank: stage-2 joins broadcast the candidate and" +
      " anchor sides — the full-vector corpus is probed, never shuffled") {
    val plan = planOf(q("x174_matryoshka_rerank"))
    // candidates (|Q| x candK) and anchors broadcast into the corpus
    // scan; a SortMergeJoin here would mean the 64-dim corpus was
    // shuffled to rerank 200 candidate rows
    nodeCount(plan, "BroadcastHashJoin") should be >= 2
    (plan should not).include("SortMergeJoin")
  }

  test("x164 IVF probe reads ONLY the nprobe cell dirs — the nprobe cell" +
      " set is a static partition filter on the vectors store") {
    val plan = planOf(q("x164_ivf_index_lifecycle"))
    // the queries' cell union is collected driver-side from the ranked
    // broadcast codebook and pruned at the scan — never applied inside
    // the join after a full corpus read (round-12 verdict #1)
    plan should include regex "PartitionFilters: \\[cell#\\d+L? IN"
    // the probe's nprobe=2 over 10 queries covers at most min(2·10,
    // nlist) distinct cells; pin the IN-list is a bounded literal set
    val inList = "PartitionFilters: \\[cell#\\d+L? IN \\(([^)]*)\\)".r
      .findFirstMatchIn(plan)
    inList should not be None
    inList.get.group(1).split(",").length should be <= 16
  }

  test("x181 filtered ANN: the metadata predicate pushes into the pruned" +
      " vectors scan — filtered BEFORE the probe join, and cell pruning" +
      " still applies") {
    val plan = planOf(q("x181_filtered_ann"))
    // the keep predicate is on a stored column, so it rides the parquet
    // scan (PushedFilters or a Filter directly over the scan), never a
    // post-top-k filter that would under-fill k
    plan should include regex "PartitionFilters: \\[cell#\\d+L? IN"
    plan.toLowerCase should include("pmod")
    // scoring joins stay broadcast — the corpus-side vectors are probed
    // in place, never shuffled to meet 10 query rows
    (plan should not).include("SortMergeJoin")
  }
}
