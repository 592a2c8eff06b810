"""Plan pins for the round-3 batch-D operators: the scale-relevant shapes
(broadcast spine joins, single-window prefix sums, partial aggregation on
the term count, bounded BFS joins) asserted against .explain output."""

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


def test_gap_fill_spine_is_broadcast(spark, registry):
    # the O(hours) spine must broadcast-join the hourly aggregate — a
    # sort-merge here would shuffle the aggregate for no reason
    p = plan(spark, registry, "n81_gap_fill_resample")
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    assert "SortMergeJoin" not in p


def test_zipf_term_count_partial_aggregates(spark, registry):
    # explode -> count must map-side combine (two HashAggregate spans
    # around one exchange), and the events scan reads only `text`
    p = plan(spark, registry, "n85_zipf_slope")
    assert p.count("HashAggregate") >= 2
    read_schema = p.split("ReadSchema")[1].splitlines()[0]
    assert "text" in read_schema and "doc_id" not in read_schema


def test_readability_reads_text_only(spark, registry):
    p = plan(spark, registry, "n86_readability_flesch")
    read_schema = p.split("ReadSchema")[1].splitlines()[0]
    assert "text" in read_schema
    assert "source" not in read_schema and "lang" not in read_schema


def test_changepoint_single_scan(spark, registry):
    # every candidate split comes from ONE daily-aggregate pass (AQE may
    # print the reused exchange's scan twice; anything above that means a
    # genuine re-scan crept in)
    p = plan(spark, registry, "n84_changepoint_split")
    assert p.count("Scan parquet") <= 2


def test_ab_test_pooled_stats_broadcast(spark, registry):
    p = plan(spark, registry, "n82_ab_test_ztest")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_concurrency_sweep_scans_events_once(spark, registry):
    # sessions explode to (start,+1)/(end,-1) pairs in-plan — a
    # self-union formulation would scan the events parquet per branch
    p = plan(spark, registry, "c13_max_concurrent_sessions")
    # one physical scan = tree entry + its detail header
    assert p.count("Scan parquet") == 2
    assert "Union" not in p


def test_bfs_result_is_bounded(spark, registry):
    # 6-hop cap: the returned frame is hop-level (<= 7 rows) and the
    # loop's localCheckpoint cut the lineage — the final plan must not
    # contain the full 6-deep join cascade
    df = registry["n87_bfs_shortest_path"].fn(spark, SF_SMALL)
    p_buf = io.StringIO()
    with redirect_stdout(p_buf):
        df.explain("formatted")
    assert p_buf.getvalue().count("Join") <= 2
    assert df.count() <= 7
