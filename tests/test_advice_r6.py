"""Round-6 advisor-finding regressions (ADVICE.md round 5).

1. at_metadata_version read-only is STRUCTURAL (_read_only flag checked
   at the top of _commit/_write_meta/_write_data_dir), not just the
   per-name setattr list — a mutator missing from the list still fails
   before any filesystem effect.
2. metadata-log prune + metadata_log_entries sort versions numerically:
   lexical sort misorders 7-digit names past v999999 and the prune
   would delete the NEWEST file.
3. snapshot_table records the adoption on the source (gc.enabled=false,
   snapshot.adopted-by) and expire_snapshots / remove_orphan_files on
   the source REFUSE while the guard is set — Iceberg's "Cannot expire
   snapshots: GC is disabled" for snapshot-table sources.
4. changelog-view registry read-modify-write is serialized by an
   advisory flock: concurrent registrations never lose writes.
"""

import datetime
import json
import os
import threading

import pytest

from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog
from iceberg_v2_to_v3_upgrade_spark.tables.table import LocalTable, TableError


@pytest.fixture()
def catalog(spark, tmp_path):
    return LocalCatalog(spark, str(tmp_path / "wh"))


def _mk(catalog, name="t"):
    t = catalog.create_table("adv", name, "id int, v string")
    t.insert_values([(1, "a"), (2, "b")])
    return t


# ------------------------------------------------- 1. structural read-only


def test_historical_handle_blocks_unlisted_mutator_paths(catalog):
    t = _mk(catalog)
    t.insert_values([(3, "c")])
    ver = int(t._meta["last_metadata_version"])
    pinned = t.at_metadata_version(ver - 1)
    assert pinned._read_only is True
    # listed mutators refuse at entry
    with pytest.raises(TableError, match="read-only"):
        pinned.insert_values([(9, "z")])
    # an UNLISTED path hitting the commit/write layer directly must also
    # refuse BEFORE any filesystem effect — this is the structural guard
    with pytest.raises(TableError, match="read-only"):
        pinned._commit("append", [], [])
    with pytest.raises(TableError, match="read-only"):
        pinned._write_meta()
    df = catalog.spark.createDataFrame([(9, "z")], "id int, v string")
    with pytest.raises(TableError, match="read-only"):
        pinned._write_data_dir(df, os.path.join(pinned.root, "data", "bogus"))
    assert not os.path.exists(os.path.join(pinned.root, "data", "bogus"))
    # the live handle is unaffected
    t.insert_values([(4, "d")])
    assert sorted(r.id for r in t.scan().collect()) == [1, 2, 3, 4]


# ------------------------------------------------- 2. numeric version sort


def test_metadata_log_prune_sorts_numerically_past_999999(catalog):
    t = _mk(catalog, "bigver")
    t.set_properties({"write.metadata.previous-versions-max": "2"})
    # jump the version counter to the 6->7 digit boundary
    t._meta["last_metadata_version"] = 999998
    t._write_meta()  # v999999
    t.insert_values([(3, "c")])  # v1000000
    t.insert_values([(4, "d")])  # v1000001
    log_dir = os.path.join(t.root, "metadata")
    kept = sorted(
        int(f[1:].split(".")[0])
        for f in os.listdir(log_dir)
        if f.endswith(".metadata.json")
    )
    # keep+1 = 3 files survive, and they are the numerically NEWEST —
    # a lexical prune would have deleted v1000000/v1000001 instead
    assert kept == [999999, 1000000, 1000001]
    rows = t.metadata_log_entries().collect()
    versions = [r.metadata_version for r in rows]
    assert versions == sorted(versions) == kept


# ------------------------------------------------- 3. source gc guard


def test_snapshot_source_expiry_refused_until_gc_reenabled(catalog):
    src = _mk(catalog, "gcsrc")
    src.insert_values([(3, "c")])
    dst = catalog.snapshot_table("adv", "gcsrc", "adv", "gcdst")
    # linkage recorded on the source (reload: the property write went to
    # table metadata on disk; pre-snapshot handles hold their own _meta)
    src = catalog.load_table("adv", "gcsrc")
    assert src.properties["gc.enabled"] == "false"
    assert src.properties["snapshot.adopted-by"] == "adv.gcdst"
    # source-side GC procedures refuse while the guard is set
    with pytest.raises(TableError, match="gc.enabled"):
        src.expire_snapshots(older_than=datetime.datetime(2030, 1, 1))
    with pytest.raises(TableError, match="gc.enabled"):
        src.remove_orphan_files()
    # dry_run stays available for inspection
    src.remove_orphan_files(dry_run=True)
    # the snapshot table itself is NOT gc-locked (guard applies to the
    # adoption provider only) and must not inherit the marker props
    assert "gc.enabled" not in dst.properties
    assert "snapshot.adopted-by" not in dst.properties
    dst.expire_snapshots(older_than=datetime.datetime(2030, 1, 1))
    assert sorted(r.id for r in src.scan().collect()) == [1, 2, 3]
    # operator re-enables after verifying dependents: expiry works again
    src.set_properties({"gc.enabled": "true"})
    src.insert_values([(4, "d")])
    src.expire_snapshots(older_than=datetime.datetime(2030, 1, 1))
    assert sorted(r.id for r in src.scan().collect()) == [1, 2, 3, 4]


def test_stale_handle_commit_cannot_erase_gc_guard(catalog):
    """Round-6 review: snapshot_table records the guard through a FRESH
    handle; a caller-held stale handle's next commit dumps its own _meta
    wholesale and would silently erase gc.enabled — _write_meta now
    re-adopts guard keys present on disk but absent in memory."""
    src = _mk(catalog, "stale")  # held across the snapshot call
    catalog.snapshot_table("adv", "stale", "adv", "staledst")
    # the stale handle commits: its in-memory _meta predates the guard
    src.insert_values([(3, "c")])
    reloaded = catalog.load_table("adv", "stale")
    assert reloaded.properties.get("gc.enabled") == "false", (
        "stale-handle commit erased the gc guard"
    )
    assert reloaded.properties.get("snapshot.adopted-by") == "adv.staledst"
    with pytest.raises(TableError, match="gc.enabled"):
        reloaded.expire_snapshots(older_than=datetime.datetime(2030, 1, 1))
    # an EXPLICIT re-enable still wins over the carry-forward
    reloaded.set_properties({"gc.enabled": "true"})
    assert (
        catalog.load_table("adv", "stale").properties["gc.enabled"] == "true"
    )


def test_drop_table_refused_on_adopted_source(catalog):
    """Round-6 review: DROP deletes the source root wholesale (PURGE
    semantics) — the most destructive path onto adopted files; it must
    refuse under the gc guard exactly like expire/orphan-GC, and work
    again after an explicit re-enable."""
    _mk(catalog, "dropsrc")
    dst = catalog.snapshot_table("adv", "dropsrc", "adv", "dropdst")
    with pytest.raises(TableError, match="cannot drop"):
        catalog.drop_table("adv", "dropsrc")
    # snapshot table still reads its adopted files
    assert sorted(r.id for r in dst.scan().collect()) == [1, 2]
    # dropping the SNAPSHOT table is fine (its guard-free by design)
    assert catalog.drop_table("adv", "dropdst")
    src = catalog.load_table("adv", "dropsrc")
    src.set_properties({"gc.enabled": "true"})
    assert catalog.drop_table("adv", "dropsrc")


def test_second_snapshot_appends_to_adopted_by(catalog):
    _mk(catalog, "multi")
    catalog.snapshot_table("adv", "multi", "adv", "d1")
    catalog.snapshot_table("adv", "multi", "adv", "d2")
    src = catalog.load_table("adv", "multi")
    assert src.properties["snapshot.adopted-by"] == "adv.d1,adv.d2"
    # neither snapshot inherited the guard from the (already-marked) src
    assert "gc.enabled" not in catalog.load_table("adv", "d2").properties


# ------------------------------------------------- 4. registry flock


def test_concurrent_changelog_registrations_never_lose_writes(catalog):
    n, per = 4, 25
    errs = []

    def worker(i):
        try:
            cat = LocalCatalog(catalog.spark, catalog.warehouse)
            for j in range(per):
                cat.register_changelog_view(f"v_{i}_{j}", "adv", f"t{i}")
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    views = LocalCatalog(catalog.spark, catalog.warehouse).changelog_views
    assert len(views) == n * per, (
        f"lost {n * per - len(views)} registrations to a racy "
        "read-modify-write"
    )
    # unregister under the same lock drops exactly the targeted rows
    LocalCatalog(catalog.spark, catalog.warehouse).unregister_changelog_views(
        db="adv", table="t0"
    )
    views = LocalCatalog(catalog.spark, catalog.warehouse).changelog_views
    assert len(views) == (n - 1) * per
