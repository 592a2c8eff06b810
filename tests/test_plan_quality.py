"""Plan-quality regression tests — the 100 TB design contract, asserted.

Correctness says the operators compute the right rows; these tests pin the
*physical plans* that make them viable at scale: filters pushed into the
parquet scan, read schemas pruned to referenced columns, dimension joins
broadcast (no sort-merge in star-schema headliners), top-k compiled to
TakeOrderedAndProject instead of a global sort. A refactor that silently
loses one of these properties still passes the oracle gate — this file is
what catches it.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from iceberg_v2_to_v3_upgrade_spark.registry import load_all_operators

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def registry():
    return load_all_operators()


def plan(spark, registry, name: str) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        registry[name].fn(spark, SF_SMALL).explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark, registry):
    p = plan(spark, registry, "q6_forecast_revenue")
    assert "PushedFilters" in p
    # the date-range + discount-range predicates land in the scan
    assert "l_shipdate" in p.split("PushedFilters")[1].splitlines()[0]


def test_in_list_pushdown(spark, registry):
    p = plan(spark, registry, "b5_in_list_filter")
    pushed = p.split("PushedFilters")[1].splitlines()[0]
    assert "In(" in pushed or "In (" in pushed


def test_disjunctive_pushdown(spark, registry):
    """q19's OR-of-ANDs must push at least the disjunction skeleton."""
    p = plan(spark, registry, "q19_disjunctive_pushdown")
    pushed = p.split("PushedFilters")[1].splitlines()[0]
    assert "Or(" in pushed


def test_column_pruning(spark, registry):
    """q6 touches 4 lineitem columns; the scan must not read the other 7."""
    p = plan(spark, registry, "q6_forecast_revenue")
    read_schema = p.split("ReadSchema")[1].splitlines()[0]
    assert "l_orderkey" not in read_schema
    assert "l_returnflag" not in read_schema
    assert "l_extendedprice" in read_schema


def test_star_joins_broadcast_no_sort_merge(spark, registry):
    """Explicitly-broadcast dim joins stay broadcast; the star-schema
    headliners must not degrade to sort-merge."""
    for name in ("q3_shipping_priority", "q5_nation_volume",
                 "q7_nation_volume_shipping", "q8_market_share"):
        p = plan(spark, registry, name)
        assert "BroadcastHashJoin" in p, name
        assert "SortMergeJoin" not in p, name


def test_topk_compiles_to_take_ordered(spark, registry):
    """ORDER BY + LIMIT must be per-partition top-k, never a global sort."""
    for name in ("q10_returned_items", "n4e_top_terms",
                 "f2_order_by_limit"):
        p = plan(spark, registry, name)
        assert "TakeOrderedAndProject" in p, name


def test_no_cartesian_products(spark, registry):
    """No headliner may contain an unintended cross join (c9 is the one
    deliberate cross join and is excluded)."""
    for name in ("q1_pricing_summary", "q3_shipping_priority",
                 "q5_nation_volume", "q13_customer_distribution",
                 "q21_suppliers_kept_waiting", "n2b_ngram_jaccard_pairs"):
        p = plan(spark, registry, name)
        assert "CartesianProduct" not in p, name


def test_single_shuffle_for_simple_agg(spark, registry):
    """q1 is scan -> partial agg -> one exchange -> final agg (+ the final
    order-by exchange). More exchanges means partial aggregation broke."""
    import re

    p = plan(spark, registry, "q1_pricing_summary")
    # each node appears twice in formatted output (tree + details) — count
    # distinct node ids
    n_exchanges = len(set(re.findall(r"Exchange \((\d+)\)", p)))
    assert n_exchanges <= 2, f"q1 has {n_exchanges} exchanges"
    assert "partial" in p  # map-side combine present


def test_sampling_is_scan_side(spark, registry):
    """The deterministic-sampling predicate is a pure projection-side
    filter over one scan — no join, no extra exchange beyond the final
    aggregate, and the scan reads only the referenced columns."""
    import re

    p = plan(spark, registry, "n11_stratified_sample")
    assert "Join" not in p
    n_exchanges = len(set(re.findall(r"Exchange \((\d+)\)", p)))
    assert n_exchanges <= 2, f"n11 has {n_exchanges} exchanges"
    read_schema = p.split("ReadSchema")[1].splitlines()[0]
    assert "text" not in read_schema  # samples on doc_id, never reads text


def test_sequence_packing_single_window_shuffle(spark, registry):
    """n13 must pack with ONE window shuffle keyed by the stratum (plus
    the final agg/order exchanges) — a global-sort formulation would
    serialize the corpus through one partition at 100 TB."""
    import re

    p = plan(spark, registry, "n13_sequence_packing")
    assert "Window" in p
    n_exchanges = len(set(re.findall(r"Exchange \((\d+)\)", p)))
    assert n_exchanges <= 3, f"n13 has {n_exchanges} exchanges"
    # the window partitions by lang — hashpartitioning, not a range sort
    # of the whole corpus
    assert "hashpartitioning(lang" in p


def test_chunking_is_shuffle_free(spark, registry):
    """n14 chunking must be a scan -> Generate (posexplode) pipeline with
    no exchange except the deterministic display sort, and must read only
    (doc_id, text) — chunk hashing happens before anything leaves the
    executor."""
    import re

    p = plan(spark, registry, "n14_doc_chunking")
    assert "Generate" in p
    n_exchanges = len(set(re.findall(r"Exchange \((\d+)\)", p)))
    assert n_exchanges <= 1, f"n14 has {n_exchanges} exchanges"
    read_schema = p.split("ReadSchema")[1].splitlines()[0]
    assert "struct<doc_id:bigint,text:string>" in read_schema


def test_range_join_broadcasts_band_table(spark, registry):
    """c10's non-equi interval join must broadcast the 4-row band side
    (BroadcastNestedLoopJoin) — a shuffle or cartesian plan would be
    catastrophic on the fact side at scale."""
    p = plan(spark, registry, "c10_range_join")
    assert "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p


def test_unpivot_is_local_expand(spark, registry):
    """d9's melt compiles to a zero-shuffle Expand after the 3-group agg:
    exactly one agg exchange plus the final sort."""
    import re

    p = plan(spark, registry, "d9_unpivot")
    assert "Expand" in p
    n_exchanges = len(set(re.findall(r"Exchange \((\d+)\)", p)))
    assert n_exchanges <= 2, f"d9 has {n_exchanges} exchanges"


def test_repetition_filter_keyed_shuffles_only(spark, registry):
    """n4g shuffles on (doc_id, bigram) then doc_id — both partial-agg'd
    and key-bounded; no join, no cartesian, at most 3 exchanges
    (two aggs + display sort)."""
    import re

    p = plan(spark, registry, "n4g_repetition_filter")
    assert "Join" not in p
    assert "partial" in p  # map-side combine on the bigram counts
    n_exchanges = len(set(re.findall(r"Exchange \((\d+)\)", p)))
    assert n_exchanges <= 3, f"n4g has {n_exchanges} exchanges"


def test_decontamination_broadcasts_eval_grams(spark, registry):
    """n16's gram join must broadcast the (tiny) eval n-gram set — the
    training side streams through a BroadcastHashJoin with no fact-side
    shuffle before the per-doc aggregate."""
    p = plan(spark, registry, "n16_decontamination")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_unigram_lm_join_is_broadcast(spark, registry):
    """n18's token-scoring join must broadcast the vocab-sized LM — the
    token stream must never shuffle join-side."""
    p = plan(spark, registry, "n18_unigram_logprob_score")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_curriculum_census_single_shuffle(spark, registry):
    """n17 is a projection + one grouped aggregate (+ display sort):
    at most 2 exchanges, with map-side partial aggregation."""
    import re

    p = plan(spark, registry, "n17_curriculum_buckets")
    n_exchanges = len(set(re.findall(r"Exchange \((\d+)\)", p)))
    assert n_exchanges <= 2, f"n17 has {n_exchanges} exchanges"
    assert "partial" in p


def test_quantization_is_map_side_only(spark, registry):
    """n19 quantization is per-row array math — scan -> project with no
    exchange beyond the deterministic display sort, vec_id filter pushed
    into the parquet scan, and only (vec_id, embedding) read."""
    import re

    p = plan(spark, registry, "n19_embedding_quantization")
    n_exchanges = len(set(re.findall(r"Exchange \((\d+)\)", p)))
    assert n_exchanges <= 1, f"n19 has {n_exchanges} exchanges"
    pushed = p.split("PushedFilters")[1].splitlines()[0]
    assert "vec_id" in pushed
    read_schema = p.split("ReadSchema")[1].splitlines()[0]
    assert "vec_id" in read_schema and "embedding" in read_schema


def test_bm25_stats_broadcast_and_topk(spark, registry):
    """n20's one-row global-stats frame must broadcast into the scoring
    pass, the top-15 must compile to TakeOrderedAndProject (no global
    sort), and the scan must read only (doc_id, text)."""
    p = plan(spark, registry, "n20_bm25_relevance")
    assert "TakeOrderedAndProject" in p
    assert "Broadcast" in p
    assert "SortMergeJoin" not in p
    read_schema = p.split("ReadSchema")[1].splitlines()[0]
    assert "struct<doc_id:bigint,text:string>" in read_schema


def test_kl_divergence_broadcasts_vocab_joins(spark, registry):
    """n21's per-source / global / total stats are vocab-sized and must
    re-join via broadcast — the token stream shuffles only for the
    (source, word) grouped count (partial-agg'd)."""
    p = plan(spark, registry, "n21_source_kl_divergence")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "partial" in p


def test_ivf_assignment_broadcasts_centroids(spark, registry):
    """n3d: centroid side is a pushed-down vec_id<8 scan broadcast into a
    nested-loop join; both the per-vector argmin and the per-cell rollup
    aggregate with map-side partial combine."""
    p = plan(spark, registry, "n3d_ivf_cell_assignment")
    assert "BroadcastNestedLoopJoin" in p
    assert "SortMergeJoin" not in p
    pushed = p.split("PushedFilters")[1].splitlines()[0]
    assert "vec_id" in pushed or "LessThan" in pushed
    assert "partial" in p


def test_cross_source_overlap_caches_gram_set(spark, registry):
    """n22's (source, gram) distinct set feeds three plan branches; it
    must come from one cached build (InMemoryTableScan), with per-source
    totals re-entering via broadcast, not sort-merge."""
    p = plan(spark, registry, "n22_cross_source_overlap")
    assert "InMemoryTableScan" in p or "TableCacheQueryStage" in p
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_funnel_single_user_shuffle(spark, registry):
    """n23's three chained stage windows and the per-user rollup must all
    ride ONE hashpartitioning(user_id) exchange (plus the single-row
    global aggregate) — no per-stage re-shuffle, no sort-merge join."""
    import re

    p = plan(spark, registry, "n23_event_funnel")
    assert "hashpartitioning(user_id" in p
    assert "SortMergeJoin" not in p
    n_exchanges = len(set(re.findall(r"Exchange \((\d+)\)", p)))
    assert n_exchanges <= 2, f"n23 has {n_exchanges} exchanges"


def test_cohort_retention_caches_per_user_frame(spark, registry):
    """n24's per-user week-set frame feeds both the cohort census and the
    activity rollup: one cached build (InMemoryTableScan) and broadcast
    re-entry for cohort sizes."""
    p = plan(spark, registry, "n24_cohort_retention")
    assert "InMemoryTableScan" in p or "TableCacheQueryStage" in p
    assert "Broadcast" in p
    assert "SortMergeJoin" not in p


def test_kmeans_update_is_grouped_not_collected(spark, registry):
    """n3e's centroid update must be a (cell, component) grouped average
    with map-side partial aggregation — never a per-cell collect — with
    the centroid side broadcast into the assignment join."""
    p = plan(spark, registry, "n3e_kmeans_update")
    assert "BroadcastNestedLoopJoin" in p
    assert "partial" in p
    assert "collect_list" not in p


def test_table_profile_single_scan(spark, registry):
    """d10 computes all six columns' null/distinct stats in ONE pass:
    exactly one parquet scan, multi-count-distinct planned via Expand."""
    import re

    p = plan(spark, registry, "d10_table_profile")
    scans = set(re.findall(r"\((\d+)\) Scan parquet", p))
    assert len(scans) == 1, scans
    assert "Expand" in p


# --- registry-wide scale guard --------------------------------------------

# Deliberate exceptions, each justified:
#   c9_cross_join          — the declared cross-join operator itself.
_CARTESIAN_OK = {"c9_cross_join"}
# the UDTF API demo is row-based Python BY DESIGN (Spark table functions
# have no Arrow path) and is bounded to a 40-doc slice; every hot-path
# pair generator stays on codegen'd sequence-explode (n28/n58)
_ROW_PYTHON_OK = {"k8_python_udtf_cooccurrence"}
# DML/lifecycle queries mutate tmp warehouses when invoked; their read
# plans are pinned by tests/test_tables.py instead of re-running DDL here.
_SKIP_TAGS = {"dml", "lifecycle"}


def test_every_query_plan_is_scale_clean(spark, registry):
    """Global 100 TB guard over EVERY declared query: the physical plan
    must contain no unintended CartesianProduct and no row-at-a-time
    Python UDF (BatchEvalPython). Arrow-vectorized Python
    (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas) is the
    allowed slow path. A new operator that sneaks in a per-row UDF or an
    accidental cross join fails here even while its oracle matches."""
    bad: list[str] = []
    for name, q in registry.items():
        if _SKIP_TAGS & set(q.tags):
            continue
        p = plan(spark, registry, name)
        if "BatchEvalPython" in p and name not in _ROW_PYTHON_OK:
            bad.append(f"{name}: row-wise Python UDF")
        if "CartesianProduct" in p and name not in _CARTESIAN_OK:
            bad.append(f"{name}: CartesianProduct")
    assert not bad, "\n".join(bad)


def test_bigram_pmi_broadcasts_vocab_and_takes_ordered(spark, registry):
    """n28: both unigram joins broadcast (vocab-sized sides), scalar
    totals ride broadcast nested-loop, top-20 is TakeOrdered — the plan
    that survives a 100 TB corpus."""
    p = plan(spark, registry, "n28_bigram_pmi")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "TakeOrderedAndProject" in p


def test_winnow_pairs_keyed_join_no_cartesian(spark, registry):
    """n31: the candidate step must be an equi-join keyed on the
    fingerprint (banding shape), never an all-pairs product, and the
    doc_a < doc_b ordering must not degrade it to nested-loop."""
    p = plan(spark, registry, "n31_winnow_neardup_pairs")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "[fp" in p or "fp#" in p  # join keyed on the fingerprint


def test_centroid_cohesion_broadcasts_centroids(spark, registry):
    """n44: the (label, pos) centroid frame is |labels| x dim rows — it
    must ride a broadcast back onto the exploded vectors, not a
    sort-merge shuffle of the full explode."""
    p = plan(spark, registry, "n44_label_centroid_cohesion")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_knn_broadcasts_query_sample(spark, registry):
    """n45: the leave-one-out query sample ships once per executor and
    the corpus streams past it exactly once — since round 10 via the
    broadcast-matrix MapInPandas kernel (the old broadcast-JOIN form
    paid three interpreted HOF folds per pair); there must be no
    corpus self-join of any kind before the rank window."""
    p = plan(spark, registry, "n45_knn_label_accuracy")
    assert "MapInPandas" in p
    assert "SortMergeJoin" not in p and "Join" not in p


def test_anomaly_zscore_two_level_aggregation(spark, registry):
    """n41: the raw-event pass is the grouped hourly count (with partial
    aggregation); the z-score window runs over the tiny rollup, so no
    window function ever sees raw events."""
    p = plan(spark, registry, "n41_hourly_anomaly_zscore")
    assert "partial_count" in p or "HashAggregate" in p
    # window runs AFTER the aggregate in the plan tree (higher node id =
    # deeper in formatted explain's preorder: scan is deepest)
    assert p.index("Window") < p.index("HashAggregate")


def test_bucketed_join_has_no_exchange(spark, registry):
    """k4: both join sides are bucketed on the join key, so the physical
    plan must join co-located buckets with NO Exchange between the scans
    and the SortMergeJoin — the shuffle was paid once at ingest."""
    p = plan(spark, registry, "k4_bucketed_join")
    join_section = p.split("SortMergeJoin")[0] if "SortMergeJoin" in p else p
    # the only allowed exchange is the final single-partition sort for
    # the ORDER BY / aggregate ABOVE the join; below the join: none
    scan_to_join = join_section.split("Scan parquet")[0]
    assert "SortMergeJoin" in p
    assert "Exchange hashpartitioning(o_orderkey" not in p
    assert "Exchange hashpartitioning(l_orderkey" not in p


def test_tfidf_broadcasts_df_frame(spark, registry):
    """n46: the vocab-sized document-frequency frame is broadcast; the
    corpus-scale frames never sort-merge."""
    p = plan(spark, registry, "n46_tfidf_topk_terms")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_pagerank_iteration_is_keyed_joins(spark, registry):
    """n47: the unrolled iteration is rank-joined-to-edges + grouped
    inflow — broadcastable rank/node frames, no cartesian blowup."""
    p = plan(spark, registry, "n47_pagerank_transitions")
    assert "CartesianProduct" not in p


def test_partition_pruning_reaches_scan(spark, registry):
    """k5: the event_type predicate must prune partition DIRECTORIES
    (PartitionFilters on the scan), not filter rows post-read."""
    p = plan(spark, registry, "k5_partition_pruning")
    assert "PartitionFilters" in p
    part_filters = p.split("PartitionFilters")[1].splitlines()[0]
    assert "event_type" in part_filters


def test_winnow_pairs_row_formulation_single_scan(spark, registry):
    """n31: the md5 shingle transform must be computed on the row path
    (posexplode + window min), never inside a Generate pre-filter — the
    nested-HOF form re-evaluates the transform O(len) times per document
    (round-2 postmortem: 176 s -> 3.6 s at sf0.1). One parquet scan of
    documents feeds the whole pair pipeline via exchange reuse."""
    import re

    p = plan(spark, registry, "n31_winnow_neardup_pairs")
    assert "ReusedExchange" in p or len(set(re.findall(r"Scan parquet", p))) == 1


def test_shuffle_hash_join_strategy(spark, registry):
    """k7: the hint must produce a ShuffledHashJoin with no Sort below
    the join (skipping both sorts is the point of the strategy)."""
    p = plan(spark, registry, "k7_shuffle_hash_join")
    assert "ShuffledHashJoin" in p
    below_join = p.split("ShuffledHashJoin")[-1]
    # formatted explain lists operator details after the tree; check the
    # tree section instead: no Sort between the scans and the join
    tree = p.split("== Physical Plan ==")[-1].split("(1) Scan")[0]
    join_pos = tree.find("ShuffledHashJoin")
    assert "Sort" not in tree[join_pos:].split("Exchange")[0]


def test_runtime_bloom_filter_join_injection(spark):
    """Scale feature: Spark's runtime bloom-filter join pruning — a bloom
    filter built on the selective (dim) side is pushed into the fact scan,
    cutting shuffle volume before the join. At production scale the default
    thresholds (10 GB application-side scan) trigger this automatically;
    here we drop the threshold to observe the injection on fixture data.
    Pinned so a session-conf refactor can't silently lose the capability."""
    from pyspark.sql import functions as F

    from iceberg_v2_to_v3_upgrade_spark.io import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, SF_SMALL, "lineitem")
        od = load_table(spark, SF_SMALL, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(od, li["l_orderkey"] == od["o_orderkey"])
            .groupBy("o_orderpriority")
            .count()
        )
        plan_str = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan_str, (
            "runtime bloom filter was not injected on the dim side"
        )
        assert "BloomFilterMightContain" in plan_str or "might_contain" in plan_str, (
            "bloom filter probe did not reach the fact side"
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_round2_new_ops_plan_shapes(spark, registry):
    """Plan pins for the round-2 additions: broadcasts where designed,
    no sort-merge on the small sides, TakeOrdered for the top-ks."""
    p = plan(spark, registry, "n69_hard_negative_mining")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p

    p = plan(spark, registry, "n60_substring_decontamination")
    assert "BroadcastNestedLoopJoin" in p  # 3-row probe frame broadcast
    assert "CartesianProduct" not in p

    p = plan(spark, registry, "n58_bpe_merge_candidates")
    assert "TakeOrderedAndProject" in p  # top-20 never global-sorts

    p = plan(spark, registry, "n59_trigram_lm")
    assert "TakeOrderedAndProject" in p

    p = plan(spark, registry, "d14_skyline_pareto")
    assert "CartesianProduct" not in p  # NOT the definitional self-join

    p = plan(spark, registry, "n71_trajectory_similarity")
    assert "BroadcastNestedLoopJoin" in p  # probes broadcast
    assert "CartesianProduct" not in p


def test_aqe_coalesces_small_shuffles(spark, registry):
    """Scale feature pinned: AQE shrinks the 64-partition shuffle of a
    tiny aggregate to a handful of coalesced partitions at runtime — the
    mechanism that makes one global shuffle_partitions setting safe from
    sf0.001 to 100 TB (small stages coalesce, skewed stages split)."""
    from pyspark.sql import functions as F

    from iceberg_v2_to_v3_upgrade_spark.io import load_table

    df = (
        load_table(spark, SF_SMALL, "orders")
        .groupBy("o_orderstatus")
        .count()
    )
    df.collect()  # AQE re-plans during execution; inspect the final plan
    plan_str = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead coalesced" in plan_str


def test_round3_new_ops_plan_shapes(spark, registry):
    """Plan pins for the round-3 additions: the bloom bit table and the
    vocab must broadcast (the corpus side never shuffles for the probe),
    the FK audits broadcast their parent key sets, the phash band join is
    a keyed equi-join (not a cartesian), and the LM joins keep the small
    side broadcast-or-hashed rather than sort-merging the trigram stream."""
    p = plan(spark, registry, "n77_bloom_decontamination")
    assert "BroadcastHashJoin" in p  # bit-position table + eval grams
    assert "CartesianProduct" not in p

    p = plan(spark, registry, "n78_vocab_coverage")
    assert "BroadcastHashJoin" in p  # top-k vocab broadcast
    assert "TakeOrderedAndProject" in p  # vocab top-k never global-sorts

    p = plan(spark, registry, "d17_referential_integrity")
    assert "BroadcastHashJoin" in p  # parent key sets broadcast
    assert "CartesianProduct" not in p

    p = plan(spark, registry, "m9_phash_neardup")
    assert "CartesianProduct" not in p  # banded equi-join, not all-pairs
    assert "BroadcastNestedLoopJoin" not in p

    p = plan(spark, registry, "n75_triangle_count")
    assert "CartesianProduct" not in p  # oriented wedge join stays keyed

    p = plan(spark, registry, "e8_cumulative_distinct")
    # the corpus-wide shuffle is the per-user min; the running sum windows
    # over the tiny daily frame — never a distinct-inside-window
    assert "HashAggregate" in p


def test_round3b_new_ops_plan_shapes(spark, registry):
    """Plan pins for the session additions: the boilerplate join's build
    side is the AGGREGATED doc-frequency table (never a second corpus
    shuffle on the probe side beyond the gram key), chat assembly reuses
    ONE user_id exchange for both the gap window and the session
    counter, and the Gopher gate is two keyed aggregations with no join
    at all."""
    p = plan(spark, registry, "n104_gopher_quality")
    assert "Join" not in p  # pure aggregate pipeline
    assert "HashAggregate" in p

    p = plan(spark, registry, "n105_boilerplate_ngrams")
    assert "CartesianProduct" not in p
    # gram-keyed equi-join between pairs and the aggregated DF table
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p or "BroadcastHashJoin" in p

    p = plan(spark, registry, "n106_chat_turn_assembly")
    # both windows AND the (user, session) assembly aggregate reuse ONE
    # user_id exchange (the group key's prefix satisfies distribution)
    assert p.count("hashpartitioning(user_id") == 1


def test_maxsim_broadcasts_query_tokens(spark, registry):
    """n108 MaxSim: the query-token frame must broadcast (BNLJ over the
    corpus scan — never a shuffled cross product), both aggregates carry
    a map-side partial phase, and the scan reads only
    (vec_id, label, embedding)."""
    p = plan(spark, registry, "n108_maxsim_multivector")
    assert "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p
    assert "partial_max" in p  # map-side partial phase of the MaxSim max
    read_schemas = [
        seg.splitlines()[0] for seg in p.split("ReadSchema")[1:]
    ]
    # the corpus scan prunes vec_id (only the broadcast query-token scan
    # filters on it) and every scan carries the embedding column
    assert any("vec_id" not in rs for rs in read_schemas), read_schemas
    assert all("embedding" in rs for rs in read_schemas), read_schemas


def test_permissive_parse_is_single_scan_agg(spark, registry):
    """h24: one events scan, JVM-side Jackson parse (no Python), one
    exchange for the final (event_type) aggregate plus at most the
    deterministic display sort."""
    import re

    p = plan(spark, registry, "h24_permissive_json_parse")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    n_exchanges = len(set(re.findall(r"Exchange \((\d+)\)", p)))
    assert n_exchanges <= 2, f"h24 has {n_exchanges} exchanges"
    read_schema = p.split("ReadSchema")[1].splitlines()[0]
    assert "props" in read_schema and "event_type" in read_schema
