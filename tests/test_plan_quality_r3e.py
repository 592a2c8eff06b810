"""Plan pins for round-3 batch E: dynamic partition pruning must actually
fire on k10's fact scan, and the duplication-coverage pipeline keeps its
two-shuffle shape."""

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


def test_dpp_fires_on_fact_scan(spark, registry):
    # the whole point of k10: the runtime day list reaches the
    # partitioned fact scan as a dynamic pruning expression
    p = plan(spark, registry, "k10_dynamic_partition_pruning")
    assert "dynamicpruningexpression" in p.lower()


def test_chi2_contingency_stays_tiny(spark, registry):
    # margins are windows over the cell frame — no join back to documents
    p = plan(spark, registry, "n88_lang_source_chi2")
    assert "SortMergeJoin" not in p
    read_schema = p.split("ReadSchema")[1].splitlines()[0]
    assert "text" not in read_schema  # counts only; never reads the text


def test_duplication_coverage_no_cartesian(spark, registry):
    p = plan(spark, registry, "n89_duplication_coverage")
    assert "CartesianProduct" not in p
    # gram-keyed aggregation must partial-aggregate before its exchange
    assert p.count("HashAggregate") >= 2


def test_exchange_reuse_at_runtime(spark, registry):
    # AQE materializes the first suppkey exchange and the identical
    # second branch reuses its shuffle files — visible only in the FINAL
    # adaptive plan, so execute first
    df = registry["k11_exchange_reuse"].fn(spark, SF_SMALL)
    df.collect()
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "isFinalPlan=true" in p
    assert "ReusedExchange" in p
