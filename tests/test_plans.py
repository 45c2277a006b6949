"""Physical-plan regression tests: the PLANS.md properties, asserted.

These lock in the scale-critical plan shapes — pushdown reaching the scan,
column pruning, dims broadcast, no Python in relational hot paths — so a
refactor that silently degrades a plan fails CI, not the cluster.
"""

from __future__ import annotations

import contextlib
import io

from flink_sql_ai_meetingcoach_azure_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = QUERIES[name].fn(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_tpch_q1_pushdown_and_pruning(spark):
    plan = _plan(spark, "tpch_q1")
    assert "LessThanOrEqual(l_shipdate" in plan  # filter reached the scan
    assert "l_comment" not in plan  # untouched wide column pruned
    # map-side partial aggregation before the single exchange
    assert plan.count("Exchange") >= 1
    assert "HashAggregate" in plan


def test_join_revenue_broadcasts_dims(spark):
    plan = _plan(spark, "join_revenue_by_nation")
    # formatted output repeats node names (tree + detail); assert presence,
    # not count
    assert "BroadcastHashJoin" in plan  # customer and nation build sides
    assert "SortMergeJoin" not in plan  # fact side never shuffles pre-agg
    # fact scan reads only the two needed columns
    assert "o_comment" not in plan and "o_orderdate" not in plan


def test_ann_topk_is_map_only_gemm(spark):
    """r13: flat search is one GEMM mapInPandas against the broadcast
    index — the pair space never materializes as JVM rows and the plan
    has no exchange at all (the old form cross-joined every pair and
    window-sorted them per query)."""
    plan = _plan(spark, "ann_topk")
    assert "MapInPandas" in plan
    assert "Exchange" not in plan
    assert "SortMergeJoin" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_relational_queries_stay_jvm_side(spark):
    """No Python UDF stages in any oracle-checked relational query — the
    whole §2 relational surface is built-ins (WholeStageCodegen-able)."""
    # entries with an oracle that legitimately run pandas UDFs: IVF centroid
    # assignment, and the hash-verified model-UDF / fake-decoder chains —
    # there the Python stage (mock embed/generate/decode) IS the thing the
    # oracle value-checks
    python_ok = {"ann_ivf_topk", "chunk_embed_ingest", "rag_retrieval",
                 "rag_pipeline_verified", "rag_pipeline_bulk",
                 "multimodal_features",
                 # r9: trained-tokenizer application is the documented
                 # pandas-UDF seam (rank-greedy merge loop, word cache) —
                 # the oracle value-checks exactly that Python stage;
                 # token_compression rolls up the same encoder output
                 "bpe_encode", "token_compression",
                 # r10: the IVF route-flip probe runs the same centroid
                 # pandas UDF as ann_ivf_topk; the verbatim DDL chain runs
                 # the mock embed/generate UDFs its oracle value-checks;
                 # png_decode_stats IS the real-codec mapInPandas chain the
                 # oracle value-checks (encode -> stdlib-zlib decode)
                 "knn_classify_ivf", "knn_hubness_ivf", "ddl_reference_pipeline",
                 "png_decode_stats", "wav_decode_stats",
                 # r11: the real baseline-JPEG codec chain —
                 # the Python stage IS what the oracle checks
                 "jpeg_decode_stats",
                 # r12: the image-dedup rungs run the real PNG codec +
                 # signature mapInPandas chains their oracles value-check;
                 # the decontamination route-flip probes the IVF index via
                 # the same centroid pandas UDF as knn_classify_ivf
                 "image_neardup", "dhash_recall_eval", "phash_neardup",
                 "semantic_decontaminate_ivf"}
    for name, spec in QUERIES.items():
        if spec.sql is None or name in python_ok:
            continue  # model/multimodal pipelines legitimately use Python
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_filter_route_pushdown(spark):
    plan = _plan(spark, "filter_route")
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)]" in plan


def test_bm25_stays_broadcast_and_pruned(spark):
    """The corpus side must never SortMergeJoin: query terms, df and stats
    all broadcast; postings pruned to query terms before the tf agg."""
    plan = _plan(spark, "bm25_topk")
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan  # uniq_terms/qterms prune joins
    assert "BroadcastNestedLoopJoin" in plan  # 1-row stats cross join


def test_hybrid_rrf_bounded_fusion(spark):
    plan = _plan(spark, "hybrid_rrf")
    assert "SortMergeJoin" not in plan
    assert "Union" in plan  # bounded top-k lists unioned, never joined


def test_quality_filter_is_map_only(spark):
    """The rule pack is pure column expressions — zero exchanges, nothing
    but scan + project (higher-order array lambdas keep the final Project
    out of WholeStageCodegen, but it is still a narrow map)."""
    plan = _plan(spark, "quality_filter")
    assert "Exchange" not in plan
    assert "Join" not in plan and "Sort" not in plan


def test_cluster_assignment_is_map_only_gemm(spark):
    """r13: the centroid assignment is a single GEMM mapInPandas against
    the collected model — no per-(row, centroid) pair blowup in the JVM
    (the old BroadcastNestedLoopJoin) and no assignment-side exchange;
    the only exchange left is the per-cluster sample window."""
    plan = _plan(spark, "cluster_sample")
    assert "MapInPandas" in plan  # GEMM assignment stage
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan


def test_rollup_single_pass(spark):
    """ROLLUP = one Expand + one agg exchange, dims broadcast — not a
    union of per-level aggregations."""
    plan = _plan(spark, "rollup_revenue")
    assert "Expand" in plan
    assert "Union" not in plan
    assert "BroadcastHashJoin" in plan


def test_lm_score_broadcasts_corpus_scalars(spark):
    """The 1-row (total tokens, vocab) aggregate joins back via broadcast —
    never a shuffle keyed on a constant."""
    plan = _plan(spark, "lm_score")
    assert "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_funnel_match_no_window_and_pushed_pattern_filter(spark):
    """The funnel is one grouped aggregate + a codegen'd step-through: no
    window node, no self-joins, and the pattern-type filter reaches the
    parquet scan."""
    plan = _plan(spark, "funnel_match")
    assert "Window" not in plan
    assert "Join" not in plan
    assert "In(event_type" in plan  # isin pushed into PushedFilters


def test_ann_quantized_stays_narrow(spark):
    """Quantized search is a broadcast-variable mapInPandas: the query
    stream never shuffles for the search itself."""
    plan = _plan(spark, "ann_quantized")
    assert "MapInPandas" in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_dup_spans_single_corpus_pass(spark):
    """Span-dedup stats: ONE Generate (the windowed-hash explode), no
    self-join for the dup flag (window over the hash partition), and the
    only joins are the per-doc reattachment."""
    plan = _plan(spark, "dup_spans")
    # the corpus postings subtree is evaluated once, not per consumer
    assert sum(1 for l in plan.splitlines() if l.strip().startswith("(") and "Generate" in l) <= 2
    assert "SortMergeJoin" not in plan
    assert "Window" in plan  # min!=max over the span-hash partition


def test_tiered_sample_no_corpus_window(spark):
    """The CDF pass folds DRIVER-side over the collected score histogram
    (r5.2: a constant-key window was constant-folded to an unpartitioned
    WindowExec and warned) — the plan must contain NO window node at all;
    the tier map comes back as a broadcast join."""
    plan = _plan(spark, "tiered_sample")
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan  # domain-sized tier map joined back
    # the scored input is materialized once (localCheckpoint) because it
    # feeds both the histogram collect and the tier join
    assert "ExistingRDD" in plan


def test_ann_pq_stays_narrow(spark):
    """Flat PQ search: encode + ADC are map-side; no shuffle beyond the
    final orderBy of the display query; no SortMergeJoin anywhere."""
    plan = _plan(spark, "ann_pq")
    assert "SortMergeJoin" not in plan
    assert "MapInPandas" in plan


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """The 100-TB shape for fact⋈(selectively filtered dim) when the dim
    is too big to broadcast: Spark's runtime bloom-filter injection
    builds a filter from the dim side and applies it AT THE FACT SCAN,
    cutting shuffle input to ~the matching keys. Pin that the knobs this
    repo documents actually inject the filter on our TPC-H tables."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the SMJ regime
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # test tables are tiny; drop the size gates so the rule fires the
        # same way it would on a TB-scale fact table
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF}/orders.parquet").filter(
            F.col("o_totalprice") > 400000
        )
        j = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in plan.lower(), plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark):
    """The runtime half of the skew story (salted_join is the static
    half): AQE must detect a hot join key's oversized shuffle partition
    and split it across tasks — `SortMergeJoin(skew=true)` over an
    `AQEShuffleRead skewed`. Thresholds are scaled to the crafted data;
    at production scale the defaults play the same role."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # one key holds ~95% of the rows; payload kept live through the
        # aggregate so pruning can't shrink the hot partition under the
        # detection threshold
        big = spark.range(210_000).selectExpr(
            "CASE WHEN id < 200000 THEN 0 ELSE id % 1000 + 1 END AS k",
            "repeat('x', 64) AS payload",
        )
        small = spark.range(1001).selectExpr("id AS k", "id * 2 AS v")
        j = big.join(small, "k").select(
            F.sum(F.length("payload") + F.col("v")).alias("s")
        )
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:1500]
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_tpch_q5_no_cartesian_and_date_pushdown(spark):
    """The 6-table ladder joins purely on equi-keys (the local-supplier
    predicate rides the supplier join, never a post-filter cartesian)
    and the order-date range reaches the orders scan."""
    plan = _plan(spark, "tpch_q5")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan  # pushed to the scan
    assert "BroadcastHashJoin" in plan  # the dim chain builds broadcast sides


def test_cube_single_pass(spark):
    """CUBE plans one Expand + partial-aggregated pass — no self-union of
    four grouped subqueries."""
    plan = _plan(spark, "cube_revenue")
    assert "Expand" in plan
    assert plan.count("Union") == 0


def test_decayed_score_single_combinable_pass(spark):
    """Time-decay scoring must stay one codegen scan + partial-aggregated
    groupBy — no window, no Python; the only addition is the tiny
    broadcast of per-distinct-day decay factors (exact-integer decay,
    ADVICE r5), never a second shuffle of the events."""
    plan = _plan(spark, "decayed_score")
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "HashAggregate" in plan


def test_tpch_q4_exists_decorrelates_to_equi_semi_join(spark):
    """The EXISTS must plan as ONE equi-keyed left-semi join (the date
    inequality riding as residual condition) — never a nested-loop or
    per-row subquery, and the order-date window must reach the scan."""
    plan = _plan(spark, "tpch_q4")
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_tpch_q10_pushdown_and_topk(spark):
    """returnflag='R' lands on the lineitem scan; nation broadcasts; the
    top-20 plans TakeOrderedAndProject, never a global sort."""
    plan = _plan(spark, "tpch_q10")
    assert "EqualTo(l_returnflag,R)" in plan
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_sessionize_single_partitioned_window(spark):
    """Session assignment is one user-partitioned window — no
    unpartitioned window, no Python."""
    plan = _plan(spark, "sessionize")
    assert "Window" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # lag + running sum share the same (user_id, ts, event_id) sort: the
    # window section appears with a partition spec, never empty
    assert "partitionBy: [user_id" in plan.replace("PartitionBy", "partitionBy") or (
        "user_id" in plan and "Window" in plan
    )


def test_tfidf_idf_join_not_broadcast(spark):
    """The vocabulary-sized idf relation is NOT hinted broadcast — at test
    sf the planner may still pick broadcast from size estimates (fine;
    that is AQE's call to make), so pin the large-vocabulary regime by
    dropping the auto-broadcast threshold: the term join must degrade
    gracefully to a shuffle join, proving no F.broadcast hint forces a
    vocabulary into every executor at 100x."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark, "tfidf_vectors")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    # the single-row corpus count stays a nested-loop broadcast even here
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_tpch_q17_correlated_scalar_decorrelates_to_agg_join(spark):
    """The per-partkey 0.2·avg threshold must plan as ONE combinable
    aggregate joined back on partkey (with the integer threshold as a
    residual join condition) — never a per-row subquery or nested loop;
    the brand filter must reach the part scan."""
    plan = _plan(spark, "tpch_q17")
    assert "EqualTo(p_brand,Brand#23)" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2  # partial+final per-partkey agg
    # the keep/drop threshold rides the partkey equi-join as a residual
    assert "__sum_q" in plan and "__n" in plan


def test_tpch_q20_nested_semis_stay_equi_keyed(spark):
    """Both IN-subquery levels must plan as LEFT SEMI equi-joins (part
    list into the fact slice; dominant-supplier set into supplier), the
    per-part scalar aggregate as a join on partkey with the 2·supp>tot
    residual, and nation must broadcast."""
    plan = _plan(spark, "tpch_q20")
    assert plan.count("LeftSemi") >= 2
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "EqualTo(n_regionkey,2)" in plan


def test_tpch_q21_exists_and_not_exists_decorrelate(spark):
    """The EXISTS must plan as an equi-keyed LEFT SEMI and the NOT EXISTS
    as an equi-keyed LEFT ANTI on orderkey — the supplier inequality and
    the o_orderdate-correlated lateness bound riding as residual
    conditions — never a nested loop; the status filter must reach the
    orders scan."""
    plan = _plan(spark, "tpch_q21")
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "EqualTo(o_orderstatus,F)" in plan


def test_tpch_q2_correlated_min_joins_back_on_equality(spark):
    """The lowest-regional-cost scalar decorrelates to a per-part MIN
    joined back on (partkey, cost equality) — ties preserved, never a
    nested loop; the size filter reaches the part scan and the top-100
    plans TakeOrderedAndProject."""
    plan = _plan(spark, "tpch_q2")
    assert "EqualTo(p_size,15)" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "LeftSemi" in plan  # region suppliers prune the fact slice


def test_tpch_q13_outer_join_keeps_orderless_customers(spark):
    """The priority exclusion must live in the OUTER join (LeftOuter in
    the plan) so excluded orders count as zero rather than dropping
    customers, and both aggregations must be hash aggregates."""
    plan = _plan(spark, "tpch_q13")
    assert "LeftOuter" in plan
    assert plan.count("HashAggregate") >= 4  # partial+final x two levels


def test_tpch_q16_not_in_plans_as_anti_join_with_distinct(spark):
    """The NOT IN supplier exclusion must plan as an equi-keyed LEFT ANTI
    join and the distinct-supplier count as a two-phase aggregate — no
    nested loop, part filters pushed to the scan."""
    plan = _plan(spark, "tpch_q16")
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "Not(EqualTo(p_brand,Brand#45))" in plan


def test_bucketed_join_entry_zero_exchange(spark):
    """The bucketed_join entry's join AND same-key aggregation must plan
    with ZERO Exchange — the bucketed layout supplies the partitioning
    on both sides (broadcast disabled to pin the sort-merge path the
    hint requests)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark, "bucketed_join")
        # the only allowed exchange is the final presentation ORDER BY
        body = plan.split("Sort", 1)[0]
        assert "Exchange" not in body, plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
        spark.sql("DROP TABLE IF EXISTS bkt_customer")


def test_tpch_q8_q9_q11_dims_broadcast_and_filters_pushed(spark):
    """The three remaining round-7 TPC-H shapes: Q8's type filter and date
    window reach their scans with dims broadcast and no nested loop
    beyond the 1-row scalar pattern; Q9's name filter is pushed; Q11's
    global threshold is the 1-row broadcast-scalar cross (the only
    nested-loop join in its plan)."""
    p8 = _plan(spark, "tpch_q8")
    assert "EqualTo(p_type,ECONOMY)" in p8
    assert "GreaterThanOrEqual(o_orderdate" in p8
    assert "CartesianProduct" not in p8
    p9 = _plan(spark, "tpch_q9")
    assert "StringContains(p_name,gear)" in p9 or "p_name" in p9.split("PushedFilters", 1)[1][:400]
    assert "BroadcastHashJoin" in p9 and "CartesianProduct" not in p9
    p11 = _plan(spark, "tpch_q11")
    assert "LeftSemi" in p11  # nation suppliers prune before the shuffle
    # the only nested-loop is the 1-row scalar total broadcast (formatted
    # explain prints each node twice: once in the tree, once in details)
    assert p11.count("BroadcastNestedLoopJoin") <= 2


def test_bitmap_distinct_two_level_agg_no_expand(spark):
    """The bitmap plan must be two hash aggregates over words — never
    Spark's Expand-based distinct rewrite over raw events."""
    plan = _plan(spark, "bitmap_distinct")
    assert "Expand" not in plan
    # formatted explain lists each node twice (tree + details):
    # 3 exchanges = word agg + group agg + final presentation sort
    assert plan.count("Exchange") <= 6
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_cooc_window_is_join_free(spark):
    """Windowed co-occurrence must stay two narrow generators + one
    aggregate — no self-join, no per-doc window."""
    plan = _plan(spark, "cooc_window")
    assert "Join" not in plan  # no join operator of any kind
    assert "Generate" in plan  # the explode stages
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_band_join_broadcasts_tier_table(spark):
    plan = _plan(spark, "band_join")
    assert "BroadcastNestedLoopJoin" in plan  # 6-row band table broadcast
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_budget_select_uses_range_exchange_not_global_window(spark):
    plan = _plan(spark, "budget_select")
    assert "rangepartitioning" in plan.lower()  # the one global-order exchange
    import re as _re

    assert not _re.search(r"Window \[[^\]]*\], \[\]", plan)  # no global window


def test_grouping_sets_single_expand(spark):
    plan = _plan(spark, "grouping_sets_revenue")
    assert plan.count("Expand") == 2  # ONE node (tree + details listing)


def test_no_driver_unhashable_output_columns(spark):
    """No registry entry may emit ARRAY/MAP/STRUCT-typed FINAL columns:
    the driver's canonicalizer sorts raw pandas cells before hashing and
    raises ``TypeError: unhashable type`` on list/dict cells — r10's only
    red row (context_windows, since scalar-encoded via array_join).
    Schema-level so it costs one plan build per entry, no execution."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = []
    for name, spec in QUERIES.items():
        schema = spec.fn(spark, SF).schema
        for f in schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                bad.append((name, f.name, f.dataType.simpleString()))
    assert not bad, f"driver-unhashable output columns: {bad}"


def test_ann_hamming_broadcasts_queries_no_shuffle_joins(spark):
    plan = _plan(spark, "ann_hamming")
    # prefilter: queries broadcast over the streaming signature scan
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan  # rerank joins broadcast too
    assert "CartesianProduct" not in plan


def test_mmr_entries_stay_broadcast_only(spark):
    for name in ("mmr_rerank", "mmr_diversity_eval", "hamming_recall_eval"):
        plan = _plan(spark, name)
        # every join side is queries×M-bounded — nothing may shuffle-join
        assert "SortMergeJoin" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_semantic_decontaminate_is_map_side_gemm(spark):
    """r13: the eval set is the broadcast model inside one GEMM
    mapInPandas; pair rows never exist in the JVM and the per-train
    argmax window is computed map-side (no pair Exchange, no Window —
    the only exchange left is the output sort)."""
    plan = _plan(spark, "semantic_decontaminate")
    assert "MapInPandas" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan
