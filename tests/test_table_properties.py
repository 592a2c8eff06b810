"""Property-based tests for the mutable-table module: random DML
sequences executed through ``LocalTable`` must match a trivial in-memory
model — the tables analog of the oracle-parity gate, but exploring the
STATE SPACE (operation interleavings) instead of the query space.

Invariants exercised per sequence:
- scan() == model after every mutation
- rewrite_data_files (compaction) never changes scan results
- format-version upgrade never changes scan results
- rollback restores exactly the model state captured at the snapshot
"""

from __future__ import annotations

import tempfile

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F


def _ids(model: dict[int, float]) -> list[int]:
    return sorted(model)


_op = st.sampled_from(["insert", "delete", "update", "compact", "upgrade"])


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=3, max_size=7), data=st.data())
def test_random_dml_sequences_match_model(spark, ops, data):
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    warehouse = tempfile.mkdtemp(prefix="prop_wh_")
    catalog = LocalCatalog(spark, warehouse)
    t = catalog.create_table(
        "prop_db", "t", "id BIGINT, val DOUBLE", partition_by=[]
    )
    model: dict[int, float] = {}
    next_id = 0

    for op in ops:
        if op == "insert":
            n = data.draw(st.integers(min_value=1, max_value=5))
            rows = [(next_id + i, float(next_id + i) * 1.5) for i in range(n)]
            next_id += n
            t.insert(spark.createDataFrame(rows, "id BIGINT, val DOUBLE"))
            model.update({i: v for i, v in rows})
        elif op == "delete":
            if not model:
                continue
            victim = data.draw(st.sampled_from(_ids(model)))
            t.delete_where(f"id = {victim}")
            model.pop(victim)
        elif op == "update":
            if not model:
                continue
            victim = data.draw(st.sampled_from(_ids(model)))
            t.update_set({"val": "val + 100"}, f"id = {victim}")
            model[victim] = model[victim] + 100
        elif op == "compact":
            t.rewrite_data_files()
        elif op == "upgrade":
            if t.format_version == 2:
                t.set_properties({"format-version": "3"})
        got = {
            (r.id, r.val) for r in t.scan().select("id", "val").collect()
        }
        assert got == set(model.items()), f"divergence after {op!r} in {ops}"


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n_initial=st.integers(min_value=2, max_value=6),
    n_deletes=st.integers(min_value=1, max_value=3),
)
def test_rollback_restores_snapshot_state(spark, n_initial, n_deletes):
    from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

    warehouse = tempfile.mkdtemp(prefix="prop_rb_")
    catalog = LocalCatalog(spark, warehouse)
    t = catalog.create_table("prop_db", "rb", "id BIGINT, val DOUBLE")
    rows = [(i, float(i)) for i in range(n_initial)]
    snap = t.insert(spark.createDataFrame(rows, "id BIGINT, val DOUBLE"))
    for i in range(min(n_deletes, n_initial)):
        t.delete_where(f"id = {i}")
    t.rollback_to_snapshot(snap.id)
    got = {(r.id, r.val) for r in t.scan().collect()}
    assert got == set(rows)
    # the rollback is an auditable commit, not history rewriting
    assert t.current_snapshot().operation == "rollback"
    assert len(t.snapshots()) >= 2 + min(n_deletes, n_initial)
