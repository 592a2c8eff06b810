"""Property-based model test for the snapshot parent-chain machinery
(round-4 core surgery): hypothesis drives random programs over
insert / rollback / set_current / branch-stage / cherrypick /
fast_forward / expire against a ``LocalTable`` AND a Python model that
tracks (a) the ids visible on main and (b) the EXACT main-ancestry
chain. After every operation:

- ``scan()`` must equal the model's visible set,
- ``ancestry()`` must equal the model chain (rollback truncates to the
  target's chain + the rollback commit; fast_forward adopts the staged
  chain; cherrypick appends one commit; expire drops expired nodes from
  the chain without losing reachability),
- ``history().is_current_ancestor`` must be true exactly on the chain,
- every still-retained checkpoint must time-travel to its recorded
  visible set via VERSION AS OF.

This generalizes the scripted regression tests (rollback/WAP/expire
edges found by review) to arbitrary interleavings.
"""

from __future__ import annotations

import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog

_op = st.sampled_from(
    ["insert", "rollback", "set_current", "stage", "cherrypick",
     "fast_forward", "expire"]
)
_program = st.lists(
    st.tuples(_op, st.integers(min_value=0, max_value=7)),
    min_size=4,
    max_size=9,
)


@pytest.mark.slow
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(program=_program)
def test_random_snapshot_program_matches_ancestry_model(
    spark, tmp_path_factory, program
):
    wh = tmp_path_factory.mktemp("anc_wh")
    catalog = LocalCatalog(spark, str(wh))
    t = catalog.create_table("anc_db", "t", "id int")

    next_id = [0]

    def batch(n=2):
        ids = list(range(next_id[0], next_id[0] + n))
        next_id[0] += n
        return ids

    create_id = t.current_snapshot().id
    # model state
    visible: list[int] = []
    chain: list[int] = [create_id]  # main ancestry, oldest first
    global_ids: list[int] = [create_id]  # commit order (= id order)
    # checkpoints: snap_id -> (visible_at, chain_at)
    checkpoints: dict[int, tuple[list[int], list[int]]] = {
        create_id: ([], list(chain))
    }
    expired: set[int] = set()
    # one active branch at a time
    branch = None  # (base_visible, staged_batches: list[(snap_id, ids)])

    def checkpoint(snap_id):
        checkpoints[snap_id] = (list(visible), list(chain))

    for op, k in program:
        if op == "insert":
            ids = batch()
            s = t.insert_values([(i,) for i in ids])
            visible.extend(ids)
            chain.append(s.id)
            global_ids.append(s.id)
            checkpoint(s.id)
        elif op in ("rollback", "set_current"):
            live = [c for c in checkpoints if c not in expired]
            target = sorted(live)[k % len(live)]
            if op == "rollback":
                s = t.rollback_to_snapshot(target)
            else:
                s = t.set_current_snapshot(target)
            tv, tc = checkpoints[target]
            visible = list(tv)
            chain = [c for c in tc if c not in expired] + [s.id]
            global_ids.append(s.id)
            checkpoint(s.id)
        elif op == "stage":
            if branch is None:
                t.create_branch("wap")
                branch = (list(visible), [])
            ids = batch()
            s = t.insert(
                t.spark.createDataFrame([(i,) for i in ids], t.schema_ddl),
                branch="wap",
            )
            branch[1].append((s.id, ids))
            global_ids.append(s.id)
        elif op == "cherrypick":
            if branch is None or not branch[1]:
                continue
            idx = k % len(branch[1])
            staged_id, ids = branch[1][idx]
            if staged_id in expired or any(
                i in visible for i in ids
            ):
                continue
            s = t.cherrypick_snapshot(staged_id)
            visible.extend(ids)
            chain.append(s.id)
            global_ids.append(s.id)
            checkpoint(s.id)
        elif op == "fast_forward":
            if branch is None or not branch[1]:
                continue
            t.fast_forward("wap")
            head_id, _ = branch[1][-1]
            # state = branch head's full state: base + ALL staged batches
            visible = list(branch[0]) + [
                i for _, ids in branch[1] for i in ids
            ]
            # ancestry = chain as of the fork (recorded at first stage),
            # minus anything since expired, plus the surviving staged
            # commits — the table must derive the same via parent ids
            chain = [c for c in branch_fork_chain if c not in expired] + [
                sid for sid, _ in branch[1] if sid not in expired
            ]
            checkpoint(head_id)
            t.drop_branch("wap")
            branch = None
        elif op == "expire":
            survivors_now = [g for g in global_ids if g not in expired]
            keep = set(survivors_now[-2:])
            keep.add(chain[-1])
            if branch is not None and branch[1]:
                keep.add(branch[1][-1][0])
            newly = [g for g in survivors_now if g not in keep]
            got = t.expire_snapshots(
                older_than=datetime.datetime(2030, 1, 1), retain_last=2
            )
            assert sorted(got) == sorted(newly), (got, newly)
            expired.update(newly)
            chain = [c for c in chain if c not in expired]
        # track the fork chain whenever a branch is (re)created
        if op == "stage" and branch is not None and len(branch[1]) == 1:
            # first stage on this branch: fork base is the chain minus
            # the just-staged commit
            branch_fork_chain = [c for c in chain]

        # ---- invariants after every op ----
        assert sorted(r.id for r in t.scan().collect()) == sorted(visible)
        got_chain = [s.id for s in t.ancestry()]
        assert got_chain == chain, (got_chain, chain, op)
        hist = {
            r.snapshot_id: r.is_current_ancestor
            for r in t.history().collect()
        }
        assert {sid for sid, flag in hist.items() if flag} == set(chain)
        # every retained checkpoint still time-travels to its state
        for sid, (vis, _) in checkpoints.items():
            if sid in expired:
                continue
            assert sorted(
                r.id for r in t.scan(snapshot_id=sid).collect()
            ) == sorted(vis), f"checkpoint {sid} after {op}"
