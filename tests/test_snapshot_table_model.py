"""Property-based model test for the zero-copy snapshot procedure
(round-5 surface): hypothesis drives random two-table programs —
source inserts / keyed equality deletes / positional deletes, a
snapshot_table() call at an arbitrary point, then independent DML and
maintenance on BOTH sides — against a Python model tracking each
side's visible id set. After every operation:

- the source scan must equal the source model (no destination op may
  ever leak back — the zero-copy claim),
- the destination scan must equal the destination model (adopted rows
  delete-able, fresh inserts never masked by adopted tombstones: the
  seq-floor and row-id-watermark carry-over under arbitrary orders),
- destination compaction and expiry must be semantically invisible on
  the destination AND physically harmless to the source (the own-root
  containment guard — the round-5 review repro, generalized).

Source-side expiry is deliberately NOT generated: GC'ing source files
out from under a snapshot table is a documented hazard in Iceberg too
(the snapshot references files it does not own); the guard under test
is the reverse direction.
"""

from __future__ import annotations

import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

_op = st.sampled_from(
    [
        "src_insert",
        "src_del_keys",
        "src_del_where",
        "snapshot",
        "dst_insert",
        "dst_del_keys",
        "dst_del_where",
        "dst_rewrite",
        "dst_expire",
    ]
)
_program = st.lists(
    st.tuples(_op, st.integers(min_value=0, max_value=7)),
    min_size=4,
    max_size=9,
)


@pytest.mark.slow
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(program=_program)
def test_random_two_table_programs_stay_independent(
    spark, tmp_path_factory, program
):
    wh = tmp_path_factory.mktemp("snapmodel_wh")
    catalog = LocalCatalog(spark, str(wh))
    src = catalog.create_table("m", "src", "id int")
    dst = None

    next_id = [0]
    src_visible: set[int] = set()
    dst_visible: set[int] = set()
    snap_count = [0]

    def batch(n=2):
        ids = list(range(next_id[0], next_id[0] + n))
        next_id[0] += n
        return ids

    def pick(visible, k):
        live = sorted(visible)
        return live[k % len(live)] if live else None

    for op, k in program:
        if op == "src_insert":
            ids = batch()
            src.insert_values([(i,) for i in ids])
            src_visible.update(ids)
        elif op == "src_del_keys":
            victim = pick(src_visible, k)
            if victim is None:
                continue
            src.delete_by_keys(
                spark.createDataFrame([(victim,)], "id int"), ["id"]
            )
            src_visible.discard(victim)
        elif op == "src_del_where":
            victim = pick(src_visible, k)
            if victim is None:
                continue
            src.delete_where(f"id = {victim}")
            src_visible.discard(victim)
        elif op == "snapshot":
            # a fresh destination each time — re-snapshotting mid-life
            # exercises adoption of an increasingly layered source
            snap_count[0] += 1
            dst = catalog.snapshot_table(
                "m", "src", "m", f"dst{snap_count[0]}"
            )
            dst_visible = set(src_visible)
        elif dst is None:
            continue  # destination ops before any snapshot: no-op
        elif op == "dst_insert":
            ids = batch()
            dst.insert_values([(i,) for i in ids])
            dst_visible.update(ids)
        elif op == "dst_del_keys":
            victim = pick(dst_visible, k)
            if victim is None:
                continue
            dst.delete_by_keys(
                spark.createDataFrame([(victim,)], "id int"), ["id"]
            )
            dst_visible.discard(victim)
        elif op == "dst_del_where":
            victim = pick(dst_visible, k)
            if victim is None:
                continue
            dst.delete_where(f"id = {victim}")
            dst_visible.discard(victim)
        elif op == "dst_rewrite":
            dst.rewrite_data_files()
        elif op == "dst_expire":
            dst.expire_snapshots(
                older_than=datetime.datetime(2030, 1, 1), retain_last=1
            )

        # ---- invariants after every op ----
        assert {r.id for r in src.scan().collect()} == src_visible, (
            f"source diverged after {op}"
        )
        if dst is not None:
            assert {r.id for r in dst.scan().collect()} == dst_visible, (
                f"snapshot table diverged after {op}"
            )
