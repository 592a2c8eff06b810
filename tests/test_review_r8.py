"""Regressions for the round-8 self-review findings:

1. the footer-stats row-id watermark must be MONOTONIC — a V3
   carried-row update rewrites rows keeping their old (low) ids, and a
   naive hi+1 would move next_row_id backwards, minting duplicate ids
   on the next insert;
2. copy-on-write UPDATE must keep rows whose predicate evaluates to
   NULL (three-valued logic: NULL is not matched, ~NULL is also not
   true — a bare ~cond filter silently dropped them);
3. the persisted matched frame in merge_into must be released even
   when the commit is REFUSED (CommitConflictError) — contended
   streaming retries would otherwise leak one cached join per
   conflict;
4. the Iceberg export must REFUSE equality-delete manifests whose
   columns no longer resolve in the current schema (field id -1 would
   silently resurrect deleted rows in a real reader).
"""

from __future__ import annotations

import pytest

from iceberg_v2_to_v3_upgrade_spark.tables import LocalTable
from iceberg_v2_to_v3_upgrade_spark.tables.table import CommitConflictError

_SCHEMA = "id BIGINT, c BIGINT, v DOUBLE"


def _mk(spark, tmp_path, name="t", v3=False):
    t = LocalTable.create(spark, str(tmp_path / name), _SCHEMA)
    if v3:
        t.set_properties({"format-version": "3"})
    return t


def _rows(n, null_c_below=0):
    return [
        (i, None if i < null_c_below else i, float(i)) for i in range(n)
    ]


def test_watermark_monotonic_after_carried_update(spark, tmp_path):
    t = _mk(spark, tmp_path, v3=True)
    t.insert(spark.createDataFrame(_rows(50), _SCHEMA))
    before = int(t._meta["next_row_id"])
    # carried-row update touching only a low-id subset: rewritten rows
    # keep OLD ids, so max(_row_id in written dir) < next_row_id
    t.update_set({"v": "v + 1"}, "id < 5")
    assert int(t._meta["next_row_id"]) >= before, "watermark regressed"
    t.insert(spark.createDataFrame(_rows(50), _SCHEMA))
    raw = t._scan_raw()
    assert raw.select("_row_id").distinct().count() == raw.count(), (
        "duplicate _row_ids after carried update + insert"
    )


def test_cow_update_keeps_null_predicate_rows(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.set_properties({"write.update.mode": "copy-on-write"})
    t.insert(spark.createDataFrame(_rows(10, null_c_below=3), _SCHEMA))
    t.update_set({"v": "v * 10"}, "c > 5")
    got = {r["id"]: (r["c"], r["v"]) for r in t.scan().collect()}
    assert len(got) == 10, "NULL-predicate rows were dropped"
    for i in range(3):  # c IS NULL -> untouched, not deleted
        assert got[i] == (None, float(i))
    for i in range(3, 6):  # c <= 5 -> untouched
        assert got[i] == (i, float(i))
    for i in range(6, 10):  # matched -> updated
        assert got[i] == (i, float(i) * 10)


def test_merge_conflict_releases_persisted_join(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.insert(spark.createDataFrame(_rows(10), _SCHEMA))
    stale = LocalTable(spark, t.root)
    # the other writer changes delete state -> stale MERGE must refuse
    t.delete_where("id = 1")
    cached_before = spark.sparkContext._jsc.getPersistentRDDs().size()
    src = spark.createDataFrame(_rows(3), _SCHEMA)
    with pytest.raises(CommitConflictError):
        stale.merge_into(src, ["id"])
    cached_after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert cached_after <= cached_before, (
        "refused MERGE leaked a persisted frame"
    )


def test_query_id_prefixes_unique():
    """bench.py keys its compact JSON line by each query name's first
    underscore token and asserts uniqueness AT THE END of a ~15-minute
    run — catch a colliding new name at test time instead (round-8:
    h1_current_timestamp_insert collided with h1_string_functions and
    aborted the bench after all timings were taken)."""
    from iceberg_v2_to_v3_upgrade_spark.registry import load_all_operators

    names = list(load_all_operators())
    seen: dict[str, str] = {}
    for n in names:
        p = n.split("_")[0]
        assert p not in seen, f"{n} collides with {seen[p]} on prefix {p!r}"
        seen[p] = n


def test_export_refuses_unresolvable_eq_delete_columns(spark, tmp_path):
    from iceberg_v2_to_v3_upgrade_spark.tables.iceberg_export import (
        export_iceberg_metadata,
    )

    t = _mk(spark, tmp_path)
    t.insert(spark.createDataFrame(_rows(10), _SCHEMA))
    t.delete_by_keys(
        spark.createDataFrame([(2,)], "c BIGINT"), ["c"]
    )
    # rename_column itself already REFUSES while eq-deletes reference
    # the column (upstream guard) — so simulate the legacy/corrupt
    # metadata state the export-side guard exists for
    for s in t._meta["snapshots"]:
        for e in s.get("eq_deletes", []):
            e["cols"] = ["ghost"]
    with pytest.raises(ValueError, match="equality-delete columns"):
        export_iceberg_metadata(t, str(tmp_path / "export"))
