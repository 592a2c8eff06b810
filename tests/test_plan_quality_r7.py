"""Plan pins for the round-7 batch: DSIR's bag models must broadcast
(they are bucket-count-sized by construction — a sort-merge join there
would shuffle the token stream), its scoring must stay JVM-side, and the
masked/filtered principal read must keep its row filter pushed into the
scan rather than evaluated post-collect."""

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


def test_dsir_models_broadcast_and_stay_jvm_side(spark, registry):
    # the log-ratio table is <= 256 rows and the totals are 1 row: both
    # must broadcast; the token stream must never shuffle join-side, and
    # nothing here needs Python
    p = plan(spark, registry, "n115_dsir_importance_resampling")
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_masked_read_pushes_row_filter_to_scan(spark, registry):
    # j7's row filter constrains c_mktsegment/c_acctbal — the predicate
    # must reach the parquet scan (PushedFilters), not run as a
    # post-mask residual only
    p = plan(spark, registry, "j7_masked_read")
    assert "PushedFilters: [" in p
    pushed = [
        line for line in p.splitlines() if "PushedFilters" in line
    ]
    assert any("c_mktsegment" in line or "c_acctbal" in line
               for line in pushed), pushed
