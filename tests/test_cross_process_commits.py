"""Round-8 item 6: cross-PROCESS commit fuzz.

The commit protocol's primitives (flock, O_EXCL dir reservation,
metadata CAS) are cross-process by construction, but every prior test —
including the hypothesis multiwriter model — interleaved stale handles
inside ONE process. This is the multiprocess twin
(``test_commit_concurrency.py::test_random_multiwriter_program_matches_model``):
two real OS processes, each with its OWN SparkSession/JVM, execute
seeded random insert/delete/refresh programs against one table root
concurrently. Each worker confines deletes to its own key space, so the
expected final rowset is computable per worker without cross-process
ordering knowledge (each worker replays its OWN sequential program into
a live set — within-worker order matters, cross-worker order cannot):

- final visible rows == union over workers of their live sets;
- every materialized ``_row_id`` is unique (the rebase shift worked
  across processes, not just threads);
- the merged ancestry is LINEAR and loses no commit: walking
  parent-ids from the current snapshot visits exactly
  1 (create) + sum of the workers' successful commits.

Reference motive: ``README.md:7`` — two ENGINES (separate processes by
definition) share the table.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from iceberg_v2_to_v3_upgrade_spark.tables import LocalTable

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCHEMA = "id INT, grp STRING, val DOUBLE"

_WORKER = """
import json, random, sys

root, seed, n_ops, worker_id = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
)
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "2")
    .appName(f"xproc-{{worker_id}}")
    .getOrCreate()
)
from iceberg_v2_to_v3_upgrade_spark.tables.table import (
    CommitConflictError,
    LocalTable,
)

SCHEMA = {schema!r}
rng = random.Random(seed)
base = worker_id * 100000
next_local = 0
# the worker's own sequential model: a delete only removes ids whose
# insert committed BEFORE it in THIS program (a delete drawn before the
# id existed is a committed no-op); key spaces are disjoint, so this is
# the whole cross-process expectation for this worker's rows
live = set()
refused = commits = 0
handle = LocalTable(spark, root)
for _ in range(n_ops):
    op = rng.choice(["insert", "insert", "insert", "delete", "refresh"])
    if op == "refresh":
        handle = LocalTable(spark, root)
        continue
    try:
        if op == "insert":
            ids = [base + next_local, base + next_local + 1]
            next_local += 2
            handle.insert(
                spark.createDataFrame(
                    [(i, f"w{{worker_id}}", float(i)) for i in ids], SCHEMA
                )
            )
            live.update(ids)
        else:
            victim = base + rng.randrange(max(2, next_local))
            handle.delete_where(f"id = {{victim}}")
            live.discard(victim)
    except CommitConflictError:
        refused += 1
        handle = LocalTable(spark, root)
    else:
        commits += 1
print(
    "XPROC_RESULT "
    + json.dumps(
        {{
            "live": sorted(live),
            "refused": refused,
            "commits": commits,
        }}
    )
)
spark.stop()
"""


def _run_workers(root: str, tmp_path, n_workers: int, n_ops: int):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=_REPO, schema=_SCHEMA))
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), root, str(41 + w), str(n_ops),
             str(w + 1)],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        )
        for w in range(n_workers)
    ]
    results = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out[-2000:]
        line = next(
            ln for ln in out.splitlines() if ln.startswith("XPROC_RESULT ")
        )
        results.append(json.loads(line.removeprefix("XPROC_RESULT ")))
    return results


@pytest.mark.slow
def test_two_process_commit_race_converges(spark, tmp_path):
    root = str(tmp_path / "t")
    LocalTable.create(spark, root, _SCHEMA)
    results = _run_workers(root, tmp_path, n_workers=2, n_ops=7)

    expected: set[int] = set()
    total_commits = 0
    for r in results:
        assert r["commits"] > 0, results  # both processes made progress
        expected |= set(r["live"])
        total_commits += r["commits"]

    t = LocalTable(spark, root)
    final = sorted(r["id"] for r in t.scan().select("id").collect())
    assert final == sorted(expected), (results, final)

    # row-id uniqueness across processes (the rebase-shift invariant)
    raw = t._scan_raw()
    assert raw.select("_row_id").distinct().count() == raw.count()

    # linear ancestry, no committed snapshot lost: create + every
    # successful worker commit, each visited exactly once
    chain = t.ancestry()
    ids = [s.id for s in chain]
    assert len(ids) == len(set(ids)), ids
    assert ids == sorted(ids), ids  # parent walk is strictly increasing
    assert len(chain) == 1 + total_commits, (len(chain), total_commits)
    assert chain[-1].id == t.current_snapshot().id
