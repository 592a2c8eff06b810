"""Plan pins for the round-9 batch: BM25's query-term/df/stats frames
must broadcast (they are query-vocab-sized by construction — a
sort-merge join against any of them would shuffle the token stream),
and scoring must stay JVM-side; n54's reworked degree expansion must
not reintroduce the all-shared-shingle self-join's Python or nested
loops."""

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


def test_bm25_broadcasts_query_side_and_stays_jvm(spark, registry):
    p = plan(spark, registry, "n116_bm25_topk")
    assert "BroadcastHashJoin" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # the doc-length join is corpus-keyed and MAY sort-merge; the
    # query-term and df joins must not (both are broadcast in code) —
    # bound the total SMJ count instead of forbidding it outright
    assert p.count("SortMergeJoin") <= 1, p


def test_n54_degree_expansion_stays_jvm(spark, registry):
    p = plan(spark, registry, "n54_neardup_degree_histogram")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "CartesianProduct" not in p and "NestedLoopJoin" not in p.replace(
        "BroadcastNestedLoopJoin", ""
    )
