"""Round-7 self-review regressions (the concurrency/second-engine batch).

1. ``expire_snapshots`` must publish new metadata BEFORE deleting files,
   and a stale handle's expire must refuse BEFORE anything irreversible
   — previously the dirs were rmtree'd first and the version CAS at the
   final write turned the refusal into corruption (metadata still
   referencing deleted dirs).
2. Equality-delete NULL keys: the engine's null-unsafe ``=`` never
   matches a NULL, so the compiled DuckDB read must not use
   ``IS NOT DISTINCT FROM`` (which would delete NULL-keyed rows).
3. The compiled DuckDB read resolves column renames, schema evolution
   (null-fill + V3 initial defaults) per dir, and REFUSES add_files
   imported dirs loudly (verify falls back to the exported scan).
4. A stale duplicate ``add_files`` of a dir the winner already imported
   refuses instead of double-counting / re-pinning its sequence.
5. ``remove_orphan_files`` grace: an unreferenced dir younger than the
   threshold is an in-flight write, not an orphan.
"""

from __future__ import annotations

import datetime

import pytest

from iceberg_v2_to_v3_upgrade_spark.tables import (
    CommitConflictError,
    LocalTable,
)
from iceberg_v2_to_v3_upgrade_spark.tables.duckdb_reader import (
    DuckDBReadUnsupported,
    duckdb_table_sql,
    read_table_in_duckdb,
)

_SCHEMA = "id BIGINT, cat STRING, val DOUBLE"


def _df(spark, rows, schema=_SCHEMA):
    return spark.createDataFrame(rows, schema)


def _duck_equals_scan(spark, t, cols):
    ours = sorted(
        tuple(r) for r in t.scan().select(*cols).collect()
    )
    pdf = read_table_in_duckdb(t)[list(cols)]
    theirs = sorted(tuple(r) for r in pdf.itertuples(index=False))
    assert theirs == ours


def test_stale_expire_refuses_before_deleting_files(
    spark, tmp_path_factory
):
    root = str(tmp_path_factory.mktemp("expire_cas")) + "/t"
    t = LocalTable.create(spark, root, _SCHEMA)
    t.insert(_df(spark, [(1, "a", 1.0)]))
    t.insert(_df(spark, [(2, "a", 2.0)]))
    stale = LocalTable(spark, t.root)
    # a concurrent commit moves the table under the stale handle
    LocalTable(spark, t.root).insert(_df(spark, [(3, "a", 3.0)]))
    with pytest.raises(CommitConflictError):
        stale.expire_snapshots(
            older_than=datetime.datetime(2030, 1, 1), retain_last=1
        )
    # the refusal left EVERY snapshot readable — nothing was deleted
    fresh = LocalTable(spark, t.root)
    for s in fresh.ancestry():
        fresh.scan(snapshot_id=s.id).count()
    assert sorted(r["id"] for r in fresh.scan().collect()) == [1, 2, 3]
    # a fresh handle's expire still works and the survivors stay intact
    fresh.expire_snapshots(
        older_than=datetime.datetime(2030, 1, 1), retain_last=1
    )
    assert sorted(
        r["id"] for r in LocalTable(spark, t.root).scan().collect()
    ) == [1, 2, 3]


def test_duckdb_read_keeps_null_keyed_rows_on_eq_delete(
    spark, tmp_path_factory
):
    root = str(tmp_path_factory.mktemp("ddb_null")) + "/t"
    t = LocalTable.create(spark, root, _SCHEMA)
    t.insert(_df(spark, [(1, None, 1.0), (2, "b", 2.0), (3, "b", 3.0)]))
    # delete key cat='b' AND a NULL key row: the engine's null-unsafe
    # equality deletes the 'b' rows and keeps the NULL-cat row
    t.delete_by_keys(_df(spark, [(0, "b", 0.0), (0, None, 0.0)]), ["cat"])
    assert sorted(r["id"] for r in t.scan().collect()) == [1]
    _duck_equals_scan(spark, t, ("id", "val"))


def test_duckdb_read_resolves_renames_and_defaults(
    spark, tmp_path_factory
):
    root = str(tmp_path_factory.mktemp("ddb_ren")) + "/t"
    t = LocalTable.create(spark, root, _SCHEMA)
    t.insert(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    t.rename_column("val", "score")
    t.insert(
        _df(spark, [(3, "c", 3.0)], "id BIGINT, cat STRING, score DOUBLE")
    )
    t.set_properties({"format-version": "3"})
    t.add_column("grade", "STRING", default="'unknown'")
    t.insert(
        _df(
            spark,
            [(4, "d", 4.0, "real")],
            "id BIGINT, cat STRING, score DOUBLE, grade STRING",
        )
    )
    _duck_equals_scan(spark, t, ("id", "cat", "score", "grade"))


def test_duckdb_read_refuses_imported_dirs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("ddb_imp")
    ext = str(base / "external")
    spark.createDataFrame(
        [(1, "a", 1.0)], _SCHEMA
    ).write.mode("overwrite").parquet(ext)
    t = LocalTable.create(spark, str(base / "t"), _SCHEMA)
    t.add_files(ext)
    with pytest.raises(DuckDBReadUnsupported):
        duckdb_table_sql(t)
    # the verify probe falls back to the exported scan and still passes
    from iceberg_v2_to_v3_upgrade_spark.tables.verify import (
        verification_passed,
        verify_table_in_duckdb,
    )

    assert verification_passed(verify_table_in_duckdb(t))


def test_duplicate_concurrent_add_files_refuses(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("dup_imp")
    ext = str(base / "external")
    spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], _SCHEMA
    ).write.mode("overwrite").parquet(ext)
    t = LocalTable.create(spark, str(base / "t"), _SCHEMA)
    stale = LocalTable(spark, t.root)
    t.add_files(ext)
    t.delete_by_keys(_df(spark, [(1, "x", 0.0)]), ["id"])
    with pytest.raises((CommitConflictError, Exception)) as exc:
        stale.add_files(ext)
    assert isinstance(exc.value, CommitConflictError) or "import" in str(
        exc.value
    )
    # the eq delete still applies: no resurrected rows, no double-count
    assert sorted(
        r["id"] for r in LocalTable(spark, t.root).scan().collect()
    ) == [2]


def test_orphan_grace_protects_inflight_dirs(spark, tmp_path_factory):
    import os

    root = str(tmp_path_factory.mktemp("orph")) + "/t"
    t = LocalTable.create(spark, root, _SCHEMA)
    t.insert(_df(spark, [(1, "a", 1.0)]))
    # a freshly written unreferenced dir = an in-flight write
    inflight = os.path.join(t.root, "data", "snap-99999")
    os.makedirs(inflight)
    with open(os.path.join(inflight, "part-0.parquet"), "w") as f:
        f.write("pending")
    assert t.remove_orphan_files() == []  # default grace retains it
    assert os.path.exists(inflight)
    removed = t.remove_orphan_files(older_than_seconds=0)
    assert removed == [inflight] and not os.path.exists(inflight)
