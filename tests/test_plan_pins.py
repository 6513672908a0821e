"""Physical-plan pins: the perf properties PERFORMANCE.md claims are
asserted here so a refactor cannot silently regress them.

These complement the value-level oracle: two plans can both be correct
while one reads 5× the bytes or shuffles the fact table — at 100 TB
that difference IS the product.
"""

from __future__ import annotations

from binance_etl_spark.plans.registry import REGISTRY, _ensure_loaded

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    _ensure_loaded()
    df = REGISTRY[name].fn(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_pushdown_reaches_parquet(spark):
    plan = _plan(spark, "scan_lineitem")
    assert "PushedFilters: [" in plan and "LessThan(l_quantity" in plan
    # column pruning: ReadSchema must not include unused wide columns
    assert "l_shipdate" not in plan.split("ReadSchema")[1][:400]


def test_dim_joins_are_broadcast(spark):
    plan = _plan(spark, "join_inner_broadcast")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_topk_is_take_ordered_not_global_sort(spark):
    plan = _plan(spark, "sort_topk")
    assert "TakeOrderedAndProject" in plan


def test_agg_has_partial_combine(spark):
    plan = _plan(spark, "agg_pricing_summary")
    assert "partial_sum" in plan or "partial_count" in plan


def test_corr_scalar_subquery_is_decorrelated(spark):
    plan = _plan(spark, "sub_scalar_corr")
    # decorrelation = per-key aggregate joined back, no per-row subplan
    assert "HashAggregate(keys=[l_partkey" in plan
    assert "Join" in plan


def test_dedup_simhash_has_no_all_pairs_join(spark):
    # Banded candidate generation: hamming<=3 pairs must share one of
    # four 4-bit bands, so the pairing is an equi-join — a cross join
    # here would be O(n^2) at corpus scale.
    plan = _plan(spark, "dedup_simhash")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dedup_embedding_cosine_has_no_all_pairs_join(spark):
    plan = _plan(spark, "dedup_embedding_cosine")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sim_ann_lsh_broadcasts_only_query_row(spark):
    # The per-vector bucket is a pure projection; the only broadcast
    # input must be the 1-row query-bucket side, never a full-corpus
    # table. With the bucket inline there is exactly one
    # BroadcastExchange (the qrow join side).
    plan = _plan(spark, "sim_ann_lsh")
    assert plan.count("BroadcastExchange") == 1


def test_fanout_is_noop_on_well_partitioned_input(spark):
    from binance_etl_spark.catalog import fanout

    n = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 10_000, 1, n)
    assert fanout(wide) is wide  # literal no-op, no repartition node
    narrow = spark.range(0, 10_000, 1, 1)
    out = fanout(narrow)
    assert out.rdd.getNumPartitions() == n
    assert "Exchange" in out._jdf.queryExecution().executedPlan().toString()


def test_q2_min_subquery_is_decorrelated(spark):
    plan = _plan(spark, "sql_q2_min_cost")
    # correlated MIN must become a per-partkey aggregate joined back
    assert "HashAggregate(keys=[l_partkey" in plan
    assert "min(l_extendedprice" in plan


def test_q7_broadcasts_both_nation_roles(spark):
    plan = _plan(spark, "sql_q7_volume_shipping")
    assert plan.count("BroadcastHashJoin") >= 2


def test_q18_semi_join_and_topk(spark):
    plan = _plan(spark, "sql_q18_large_orders")
    assert "LeftSemi" in plan
    assert "TakeOrderedAndProject" in plan


def test_q21_exists_pair_decorrelates_to_semi_anti(spark):
    plan = _plan(spark, "sql_q21_waiting_supplier")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_q22_anti_join_no_per_row_subquery(spark):
    plan = _plan(spark, "sql_q22_idle_customers")
    assert "LeftAnti" in plan


def test_q4_exists_is_semi_join(spark):
    plan = _plan(spark, "sql_q4_priority_exists")
    assert "LeftSemi" in plan
    # the returnflag gate is pushed into the lineitem scan, not applied
    # after the semi join
    assert "EqualTo(l_returnflag,R)" in plan


def test_q6_all_filters_pushed_minimal_schema(spark):
    plan = _plan(spark, "sql_q6_forecast_revenue")
    # toString() truncates the filter list; match the stable prefix
    assert "IsNotNull(l_shipdate)" in plan
    assert "GreaterThanOrEqual(l_shipda" in plan
    # 4-column ReadSchema on an 11-column table — the minimal-IO scan
    read = plan.split("ReadSchema")[1][:300]
    assert "l_orderkey" not in read and "l_returnflag" not in read


def test_q13_outer_join_keeps_zero_order_customers(spark):
    plan = _plan(spark, "sql_q13_custdist")
    assert "LeftOuter" in plan or "RightOuter" in plan
    # the ON-clause residual must reach the orders scan
    assert "Not(EqualTo(o_orderpriority,5-LOW))" in plan


def test_q16_not_in_plans_anti_join(spark):
    plan = _plan(spark, "sql_q16_supplier_cnt")
    assert "LeftAnti" in plan


def test_q17_correlated_avg_is_decorrelated(spark):
    # the per-partkey AVG must plan as one aggregate joined back — a
    # per-row re-scan of lineitem would be O(n^2) at fact scale
    plan = _plan(spark, "sql_q17_small_qty_revenue")
    assert "HashAggregate(keys=[l_partkey" in plan


def test_q19_disjunction_implied_filters_reach_scan(spark):
    # the OR-of-ANDs residual spans both join sides, but its
    # single-side implications (quantity bands) must still push down
    plan = _plan(spark, "sql_q19_discounted_revenue")
    assert "LessThanOrEqual(l_quantity" in plan


def test_q20_nested_in_stacks_semi_joins(spark):
    plan = _plan(spark, "sql_q20_promotable_suppliers")
    assert "LeftSemi" in plan
    # prefix LIKE pushes as a range/startswith scan filter
    assert "StringStartsWith(p_name,red)" in plan


def test_chunk_overlap_is_shuffle_free(spark):
    # chunking is a narrow transform (sequence+explode+substr): the
    # only allowed Exchange is fanout()'s deliberate RoundRobin spread
    # of the byte-small local input (a no-op on naturally-partitioned
    # big inputs) — a HASH exchange would mean an accidental shuffle
    plan = _plan(spark, "text_chunk_overlap")
    assert plan.count("Exchange") == plan.count("RoundRobinPartitioning") == 1


def test_quantize_int8_is_shuffle_free(spark):
    plan = _plan(spark, "emb_quantize_int8")
    assert plan.count("Exchange") == plan.count("RoundRobinPartitioning") == 1


def test_ngram_novelty_joins_on_gram_hash(spark):
    # candidate structure mirrors minhash-LSH: equi-join on the gram
    # hash, never an all-pairs product; both aggs partial-combine
    plan = _plan(spark, "text_ngram_novelty")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_min" in plan or "partial_count" in plan


def test_cusum_is_single_shuffle(spark):
    # per-key mean is an unordered window over the SAME partitioning
    # the running sum uses — the whole query must ride one Exchange
    # (a groupBy+join formulation would shuffle the events twice)
    plan = _plan(spark, "win_cusum_drift")
    assert plan.count("Exchange") == 1


def test_transition_matrix_no_duplicate_subtree(spark):
    # row totals are a window over the aggregated type-pair table;
    # an agg+join formulation re-executes the lag window + count agg
    # for the totals side (6 exchanges observed) — pin the 3-exchange
    # shape: window shuffle, pair-count agg, tiny row-total window
    plan = _plan(spark, "win_transition_matrix")
    assert plan.count("Exchange") <= 3


def test_bm25_is_takeordered_with_broadcast_stats(spark):
    # ranking is a k-merge (no global sort); df and corpus stats reach
    # the postings via broadcast only; the only nested-loop join is the
    # deliberate 1-row corpus-stats attach
    plan = _plan(spark, "text_bm25_topk")
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_inverted_index_is_two_phase_partial_agg(spark):
    plan = _plan(spark, "text_inverted_index")
    assert "partial_count" in plan and "partial_sum" in plan
    assert "SortMergeJoin" not in plan


def test_rag_retrieve_broadcasts_topk_not_corpus(spark):
    # the k winners are the build side; the document corpus must never
    # be broadcast or shuffled for the join
    plan = _plan(spark, "rag_retrieve_e2e")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_profile_is_single_scan_expand(spark):
    # one lineitem scan: exact multi-column DISTINCT rides Catalyst's
    # Expand, not one scan per column
    plan = _plan(spark, "profile_columns")
    assert plan.count("FileScan parquet") == 1
    assert "Expand" in plan


def test_pca_power_is_matrix_free(spark):
    # the d-row iterates are eagerly localCheckpoint'ed (CC-style
    # lineage flattening), so the final plan consumes tiny
    # ExistingRDD scans — the corpus-wide aggregation ran exactly
    # once per iteration at build time, and nothing all-pairs or
    # sort-merge survives into the assembled result
    plan = _plan(spark, "emb_pca_power")
    assert "Scan ExistingRDD" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_containment_joins_on_shingle_hash(spark):
    # candidate generation is an equi-join of A's min-shingle against
    # B's exploded shingle stream — no all-pairs product, no hinted
    # broadcast (Catalyst may pick one locally; at scale stats demote
    # it to a shuffle join), and no array-keyed dedup shuffle
    plan = _plan(spark, "dedup_containment")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_nearest_is_single_shuffle(spark):
    # both match directions ride windows over the same user_id
    # partitioning: exactly one hash Exchange (plus fanout is absent
    # here), never a range self-join
    plan = _plan(spark, "join_asof_nearest")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan


def test_encode_ids_broadcasts_vocab(spark):
    # the vocabulary joins the token stream as a broadcast; sequence
    # reassembly is a grouped collect, not a global sort
    plan = _plan(spark, "text_encode_ids")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ewma_is_single_shuffle(spark):
    # all K lag taps + the normalizer ride ONE keyed sorted window
    plan = _plan(spark, "win_ewma")
    assert plan.count("Exchange") == 1


def test_phash_dedup_pairs_via_band_equijoin(spark):
    # candidate pairing is an equi-join on (band_no, band_v) — the
    # MinHash-LSH shape — never an all-pairs product over images
    plan = _plan(spark, "mm_phash_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_merge_intervals_is_single_shuffle(spark):
    # running-max + island-sum + grouped rollup all share the user_id
    # partitioning: one Exchange end-to-end
    plan = _plan(spark, "win_merge_intervals")
    assert plan.count("Exchange hashpartitioning") == 1


def test_seasonal_baseline_broadcasts_slots(spark):
    # the (type, hour) baseline table is slot-sized — it must come back
    # as a broadcast, never a fact-side shuffle join
    plan = _plan(spark, "ts_seasonal_baseline")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_profile_hll_has_no_expand(spark):
    # the 100 TB profile twin: HLL sketches replace exact DISTINCT, so
    # the plan is a plain partial+final aggregate over ONE scan with NO
    # Expand row multiplication (the exact twin pays 6x row fan-out)
    plan = _plan(spark, "profile_columns_hll")
    assert plan.count("FileScan parquet") == 1
    assert "Expand" not in plan


def test_substring_dedup_no_all_pairs(spark):
    # the Lee-et-al substring pass pairs docs ONLY through the shared
    # gram key (an equi-join + aggregate) — an all-pairs product over
    # documents here would be O(corpus^2) at scale
    for name in ("text_substring_dedup", "text_substring_scrub"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_semdedup_pairs_only_within_cluster(spark):
    # SemDeDup's whole point: cosine pairs come from an equi-join on
    # the cluster key, so pair count is sum(cluster^2), never corpus^2
    plan = _plan(spark, "dedup_semdedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_quality_classifier_is_joinless_single_agg(spark):
    # the hashed linear model is pure expression work: one explode,
    # one map-side-combinable aggregate, no join anywhere
    plan = _plan(spark, "text_quality_classifier")
    assert "Join" not in plan
    assert "partial_count" in plan or "partial_sum" in plan


def test_curate_scrub_pipeline_no_all_pairs(spark):
    # the composed gate+scrub plan must keep every stage's equi-join
    # shape — composition must not smuggle in a product join
    plan = _plan(spark, "curate_scrub_pipeline")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bottom_k_sample_is_take_ordered(spark):
    # bottom-k-by-hash must run as per-partition top-k + k-way merge,
    # never a global sort
    plan = _plan(spark, "sample_bottom_k")
    assert "TakeOrderedAndProject" in plan


def test_pq_scan_is_shuffle_free_topk(spark):
    # PQ encode + ADC lookup are pure projections over inlined literal
    # codebooks: the only distribution step allowed is the final
    # TakeOrderedAndProject k-merge — no Exchange, no Join against any
    # codebook table.
    plan = _plan(spark, "sim_ann_pq")
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan
    # one fanout repartition is permitted (small-file parallelism);
    # nothing else may shuffle
    assert plan.count("Exchange") <= 1


def test_cms_sketch_agg_is_partial_combined(spark):
    # the 4x256 sketch must collapse map-side (bounded partial-agg
    # state), and the sketch side of the estimate join must broadcast
    plan = _plan(spark, "text_heavy_hitters_cms")
    assert "partial_count" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_triangles_all_equi_joins(spark):
    # degree-oriented triangle counting must stay equi-keyed: the
    # inequality (key ordering) rides as a post-join filter, never a
    # nested-loop join
    plan = _plan(spark, "graph_triangles")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_er_resolve_blocked_join(spark):
    # ER candidates come from the prefix-block equi-join; the verify
    # (levenshtein) must be a filter on candidates, not a join
    # condition forcing nested loops
    plan = _plan(spark, "er_resolve_e2e")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bpe_round_stats_join_is_broadcast_nested_loop(spark):
    # the 1-row stats crossJoin in _bpe_round must carry a broadcast
    # hint: BroadcastNestedLoopJoin, never a real CartesianProduct
    # (an unhinted 1-row cross leans on AQE, which a conf flip disables)
    from pyspark.sql import functions as F

    from binance_etl_spark.plans.llm_ops10 import _bpe_round

    x = spark.createDataFrame(
        [(1, i + 1, s) for i, s in enumerate("a b a b a".split())],
        "doc_id BIGINT, pos INT, sym STRING",
    )
    _, stats = _bpe_round(x, 1)
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_pit_feature_join_is_windowed_not_range_join(spark):
    # point-in-time join must run as the union+window as-of plan: one
    # shuffle on user_id, never an interval range join (CartesianProduct
    # / BroadcastNestedLoopJoin) that explodes facts x versions
    plan = _plan(spark, "join_pit_features")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan


def test_ivfpq_prunes_via_broadcast_and_takeordered(spark):
    # IVFPQ: the nprobe list ids broadcast to the candidate join (never
    # a shuffle of the corpus against 2 rows), the compressed-domain
    # scoring is pure codegen, and top-k ends in TakeOrderedAndProject
    plan = _plan(spark, "sim_ann_ivfpq")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_shuffle_shards_single_exchange_no_udf(spark):
    """corpus_shuffle_shards: ONE hash exchange (the group-by on
    shard — the single unavoidable global shuffle of training-set
    assembly), everything else map-side; pure codegen, no Python."""
    plan = _plan(spark, "corpus_shuffle_shards")
    # the agg's exchange plus AQE wrappers; no join, no extra shuffle
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_count" in plan or "partial_sum" in plan  # map-side combine


def test_mixture_weights_quota_join_is_broadcast(spark):
    """sample_mixture_weights: the k-row quota table must broadcast
    into the ranked stream — a shuffled join here would move the
    corpus twice at 100 TB."""
    plan = _plan(spark, "sample_mixture_weights")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dsir_weights_join_is_broadcast_topk_take_ordered(spark):
    """sample_dsir_select: the <=1024-row hashed-feature weight table
    must broadcast into the token stream (a shuffled join would move
    the exploded corpus again at 100 TB), the doc score must combine
    map-side, and the top-k must be TakeOrderedAndProject, never a
    global sort."""
    plan = _plan(spark, "sample_dsir_select")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_sum" in plan or "partial_count" in plan


def test_epoch_order_no_global_window_no_python(spark):
    """corpus_epoch_order: both epochs' windows must be SHARD-keyed
    (a global-order window would single-partition the corpus at
    100 TB) and the whole plan stays JVM-side."""
    plan = _plan(spark, "corpus_epoch_order")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # every window partitions by shard — no empty partition spec
    assert "windowspecdefinition(shard" in plan.replace(" ", "").lower() or (
        "partitionBy" not in plan
    )
    assert "SortMergeJoin" not in plan  # adjacency join under AQE/broadcast


def test_assembly_quota_join_broadcast_no_python(spark):
    """assemble_training_run: the k-row quota table broadcasts into
    the ranked stream, and the full mixture->order->pack pipeline is
    pure codegen."""
    plan = _plan(spark, "assemble_training_run")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_funnel_single_exchange_pure_codegen(spark):
    """win_funnel_steps: ONE user-keyed exchange feeds the sorted
    collect + JVM fold; no Python eval, no join anywhere."""
    plan = _plan(spark, "win_funnel_steps")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan


def test_mmr_candidates_take_ordered_single_scan(spark):
    """sim_mmr_topk's DISTRIBUTED stage: candidates come from
    TakeOrderedAndProject over ONE broadcast-query corpus scan (never
    a global sort, never a second scan — the k*k pair matrix and the
    greedy walk are driver-side over the bounded collected rows, with
    a bit-exactness guard on the Python twin of the e-12 cosine)."""
    from binance_etl_spark.plans.retrieval import (
        _cosine_e12_py,
        mmr_candidates,
    )
    from binance_etl_spark.operators.similarity import (
        cosine_from_e12,
        dot_e12,
        sq_norm_e12,
    )
    from pyspark.sql import functions as F

    _ensure_loaded()
    cand = mmr_candidates(spark, SF_DIR)
    cplan = cand._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in cplan
    assert "SortMergeJoin" not in cplan
    # exactly two scans: the corpus pass + the 1-row broadcast query
    # side (filter pushed to parquet) — never a re-scan for pairs
    assert cplan.lower().count("filescan parquet") == 2
    assert "EqualTo(vec_id,0)" in cplan
    assert "BatchEvalPython" not in cplan and "ArrowEvalPython" not in cplan
    # the driver-side cosine twin is bit-identical to the JVM e-12 path
    rows = cand.limit(3).collect()
    pairs = spark.createDataFrame(rows, cand.schema).alias("a").crossJoin(
        spark.createDataFrame(rows, cand.schema)
        .select(F.col("vec_id").alias("j"), F.col("embedding").alias("eb"))
    )
    jvm = {
        (r["vec_id"], r["j"]): r["c"]
        for r in pairs.select(
            "vec_id",
            "j",
            cosine_from_e12(
                dot_e12("embedding", "eb"),
                sq_norm_e12("embedding"),
                sq_norm_e12("eb"),
            ).alias("c"),
        ).collect()
    }
    emb = {r["vec_id"]: r["embedding"] for r in rows}
    for (i, j), v in jvm.items():
        assert _cosine_e12_py(emb[i], emb[j]) == v  # exact, not approx


def test_bootstrap_fanout_map_side_combine(spark):
    """stats_bootstrap_ci: the 64x replica fanout feeds a partial
    (map-side) aggregate BEFORE its exchange — the explode never
    crosses the network raw — and the whole pass is JVM expression
    work."""
    plan = _plan(spark, "stats_bootstrap_ci")
    assert "partial" in plan.lower()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SortMergeJoin" not in plan


def test_attribution_windows_share_one_user_exchange(spark):
    """win_attribution: the next-conversion window (user) and the two
    per-conversion windows (user, nc) all ride ONE user-keyed
    exchange — HashPartitioning(user_id) satisfies the (user_id, nc)
    clustering, so only the tiny channel groupBy adds a second hash
    exchange. Pure JVM window/agg work, no joins."""
    plan = _plan(spark, "win_attribution")
    assert plan.count("Window") == 3
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ols_single_pass_sufficient_statistics(spark):
    """stats_ols_group: one scan, one keyed exchange, map-side
    partial sums — the normal-equations shape; slope/intercept are
    projections over the five integer sums, never a second pass."""
    plan = _plan(spark, "stats_ols_group")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial" in plan.lower()
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_benford_broadcast_literal_join(spark):
    """dq_benford: the 9-digit observed counts join the 9-row literal
    expectation table via broadcast — never a shuffle join — and the
    digit count aggregate is map-side combinable."""
    plan = _plan(spark, "dq_benford")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial" in plan.lower()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_gini_window_and_agg_share_exchange(spark):
    """stats_gini: the ranking window and the per-type aggregate ride
    ONE type-keyed exchange; products are JVM integer expressions."""
    plan = _plan(spark, "stats_gini")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_rfm_heavy_pass_is_user_agg(spark):
    """agg_rfm_segments: the events-scale work is the map-side-
    combinable user aggregate; the NTILE windows sort only the user
    DIMENSION (their single-partition exchanges sit above the user
    agg, never above the raw scan)."""
    plan = _plan(spark, "agg_rfm_segments")
    assert "partial" in plan.lower()
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the user-keyed exchange is the ONLY hash exchange: the segment
    # rollup rides the windows' single partition with no re-shuffle
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.index("Exchange hashpartitioning") > plan.index("Window")


def test_top_paths_single_user_exchange_take_ordered(spark):
    """win_top_paths: gap window + session counter + per-session path
    fold ride ONE user-keyed exchange; the path census adds the only
    other hash exchange; the top-20 is TakeOrderedAndProject."""
    plan = _plan(spark, "win_top_paths")
    assert plan.count("Exchange hashpartitioning") == 2
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_referential_integrity_broadcast_anti_shape(spark):
    """dq_referential_integrity: every FK check probes a broadcast
    parent-KEY projection in one pass (checked + orphans from the
    same left join) — three BroadcastHashJoins, no shuffle joins, no
    driver-side count assembly (single lazy union plan)."""
    plan = _plan(spark, "dq_referential_integrity")
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan
    assert "partial" in plan.lower()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_market_basket_no_cartesian_codegen_only(spark):
    """agg_market_basket: the pair join is keyed on (user, session)
    with an inequality residual — never a cartesian of the item sets —
    and everything is JVM expression work with map-side partials; the
    marginal/total joins are broadcast."""
    plan = _plan(spark, "agg_market_basket")
    assert "CartesianProduct" not in plan
    assert "partial" in plan.lower()
    assert "Broadcast" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_hayashi_yoshida_bucketed_never_cross(spark):
    """ms_hayashi_yoshida: the interval-overlap pairing is an
    equi-join on the hour bucket with the overlap predicate as a
    residual — never a cartesian/BNLJ cross of the two tapes — and
    the product sum partial-combines."""
    plan = _plan(spark, "ms_hayashi_yoshida")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial" in plan.lower()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_hy_lead_lag_bucketed_lag_grid(spark):
    """ms_hy_lead_lag: the only nested-loop join is the 3-row lag
    broadcast; the tick pairing stays a bucket equi-join (the shifted
    B copies carry their lag through it) with the overlap residual —
    never a cross of the tapes."""
    plan = _plan(spark, "ms_hy_lead_lag")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # the 3-row lags
    assert "partial" in plan.lower()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_epps_heavy_pass_is_bucket_agg(spark):
    """ms_epps_effect: the tick-sized work is one (grid, sym, bucket)
    max-struct aggregate with map-side partials; the return windows
    and the Pearson math run on grid-bucket-dimension rows."""
    plan = _plan(spark, "ms_epps_effect")
    assert "CartesianProduct" not in plan
    assert "partial" in plan.lower()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- round-8 waves 4-7 ----------------------------------------------------


def test_tape_stats_single_exchange_family(spark):
    """ms_lee_ready / stats_ljung_box / stats_dickey_fuller /
    ms_acf_grid: every lag/lead/frame rides ONE sym-keyed hash
    exchange (the ACF grid was rewritten from a union-of-aggregates
    that re-ran the exchange per lag — this pin keeps it dead)."""
    for name in (
        "ms_lee_ready",
        "stats_ljung_box",
        "stats_dickey_fuller",
        "ms_acf_grid",
    ):
        plan = _plan(spark, name)
        assert plan.count("Exchange hashpartitioning") == 1, name
        assert "CartesianProduct" not in plan, name


def test_hamming_ann_broadcast_scan_no_cartesian(spark):
    plan = _plan(spark, "emb_hamming_ann")
    # the query side broadcasts; the corpus is never cartesian-joined
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_modularity_and_assortativity_equi_joins_only(spark):
    for name in ("graph_modularity", "graph_assortativity"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        # degree/label lookups broadcast (node-sized, never edge-sized)
        assert "BroadcastExchange" in plan, name


def test_bpe_segment_codegen_no_udf(spark):
    plan = _plan(spark, "text_bpe_segment")
    # pure expression pipeline: no Python eval anywhere, and the
    # doc_id bound reaches the parquet scan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "LessThan(doc_id,30)" in plan


def test_rs_profile_single_sym_exchange(spark):
    """ms_rs_profile: the 3x scale fanout + per-chunk windows + both
    rollups all ride ONE sym-keyed hash exchange (the agg+join-back
    variant re-shuffled the data-sized rows; slope-measured 2.6x at
    10x before the rewrite)."""
    plan = _plan(spark, "ms_rs_profile")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_time_weighted_imbalance_single_exchange(spark):
    """ms_time_weighted_imbalance: interval window + sym rollup share
    one sym-keyed exchange; pure codegen."""
    plan = _plan(spark, "ms_time_weighted_imbalance")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_cross_source_matrix_equi_candidates_broadcast_rollup(spark):
    """dedup_cross_source_matrix: candidate generation is the banded
    equi-join (never all-pairs); the source rollup's two doc->source
    lookups broadcast."""
    plan = _plan(spark, "dedup_cross_source_matrix")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_common_neighbors_hub_cap_screen(spark):
    """graph_common_neighbors: the super-node screen is a broadcast
    ANTI join on the shared-neighbor key BEFORE the wedge self-join
    (one 10^6-degree hub is a 10^12-pair explosion without it), the
    wedge join stays equi, top-k is TakeOrdered."""
    plan = _plan(spark, "graph_common_neighbors")
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_kruskal_wallis_histogram_machine(spark):
    """stats_kruskal_wallis: the only data-sized op is the
    distinct-value histogram (one hash exchange); the rank window and
    the 1-row pivot ride a single-partition tail. No joins at all."""
    plan = _plan(spark, "stats_kruskal_wallis")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_spearman_histogram_joins_no_row_sort(spark):
    """stats_spearman: midranks come from distinct-value histograms
    joined back by (type, value) — never a global row sort; all
    shuffles are type-scoped equi-exchanges."""
    plan = _plan(spark, "stats_spearman")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 5
    assert "EvalPython" not in plan


def test_sax_symbols_series_keyed_only(spark):
    """ts_sax_symbols: every exchange is keyed on the series key
    (event_type...) — PAA, breakpoints and the symbol histogram never
    shuffle wider; breakpoints join back broadcast."""
    import re

    plan = _plan(spark, "ts_sax_symbols")
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "event_type" in m.group(1), m.group(0)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_completeness_matrix_one_pass_no_shuffle(spark):
    """dq_completeness_matrix: one full-width scan into a 1-row
    global aggregate — zero hash exchanges, zero joins."""
    plan = _plan(spark, "dq_completeness_matrix")
    assert plan.count("Exchange hashpartitioning") == 0
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_substring_spans_window_rides_dup_tail(spark):
    """text_substring_spans (round 10): same token-stream machine as
    text_substring_dedup — the gram hist agg and the join-back are
    the only O(total tokens) exchanges — plus exactly the doc-keyed
    window exchanges over the duplicated-position tail. No cartesian,
    no Python eval, no global row sort."""
    plan = _plan(spark, "text_substring_spans")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan
    # gram-hash equi-join + hist agg + the per-doc window/agg chain —
    # bounded exchange count, all hash-keyed
    assert plan.count("Exchange hashpartitioning") <= 5
    assert "Window" in plan
