"""V3-specific table behaviors: deletion-vector consolidation and row
lineage (carried row ids through MoR UPDATE with seq-scoped tombstones).
"""

from __future__ import annotations

import pytest

from iceberg_v2_to_v3_upgrade_spark.tables.catalog import LocalCatalog
from iceberg_v2_to_v3_upgrade_spark.tables.table import TableError


@pytest.fixture
def catalog(spark, tmp_path):
    return LocalCatalog(spark, str(tmp_path / "wh"))


def _fresh(catalog, name="t"):
    t = catalog.create_table(
        "v3db", name, "id BIGINT, grp STRING, amount DOUBLE"
    )
    rows = [(i, "a" if i % 2 == 0 else "b", float(i)) for i in range(20)]
    t.insert(
        catalog.spark.createDataFrame(rows, "id BIGINT, grp STRING, amount DOUBLE")
    )
    return t


def test_consolidate_merges_delete_files_scan_unchanged(catalog):
    t = _fresh(catalog)
    t.delete_where("id IN (1, 3)")
    t.delete_where("id IN (5, 7)")
    t.delete_where("id = 9")
    before = sorted(r.id for r in t.scan().collect())
    assert len(t.current_snapshot().delete_dirs) == 3
    t.consolidate_deletes()
    assert len(t.current_snapshot().delete_dirs) == 1
    after = sorted(r.id for r in t.scan().collect())
    assert after == before == [0, 2, 4, 6, 8] + list(range(10, 20))


def test_consolidate_noop_with_single_delete_file(catalog):
    t = _fresh(catalog)
    t.delete_where("id = 1")
    snap = t.current_snapshot()
    assert t.consolidate_deletes().id == snap.id  # no new commit


def test_v2_update_reassigns_row_ids(catalog):
    # lineage scan is V3-only, so observe the internal raw scan on V2
    t = _fresh(catalog)
    before = {r.id: r._row_id for r in t._scan_raw().collect()}
    t.update_set({"amount": "amount + 1.0"}, "grp = 'a'")
    after = {r.id: r._row_id for r in t._scan_raw().collect()}
    changed = [k for k in before if after[k] != before[k]]
    # V2: every updated row gets a FRESH id (rewrite lineage)
    assert sorted(changed) == [i for i in range(20) if i % 2 == 0]


def test_v3_update_carries_row_ids(catalog):
    t = _fresh(catalog)
    t.set_properties({"format-version": "3"})
    before = {r.id: r._row_id for r in t.scan(with_row_lineage=True).collect()}
    t.update_set({"amount": "amount + 1.0"}, "grp = 'a'")
    after = {r.id: (r._row_id, r.amount) for r in t.scan(with_row_lineage=True).collect()}
    assert len(after) == 20
    for k, rid in before.items():
        assert after[k][0] == rid, f"row {k} lost its id across UPDATE"
    # and the update actually applied
    assert after[0][1] == 1.0 and after[1][1] == 1.0 * 1  # id 1 grp b: amount 1.0 unchanged
    assert after[2][1] == 3.0


def test_v3_second_update_and_delete_of_carried_row(catalog):
    t = _fresh(catalog)
    t.set_properties({"format-version": "3"})
    t.update_set({"amount": "amount + 1.0"}, "id = 4")
    t.update_set({"amount": "amount + 1.0"}, "id = 4")  # carried id again
    rows = {r.id: r.amount for r in t.scan().collect()}
    assert rows[4] == 6.0 and len(rows) == 20
    t.delete_where("id = 4")
    ids = sorted(r.id for r in t.scan().collect())
    assert 4 not in ids and len(ids) == 19


def test_consolidate_refuses_after_carried_ids(catalog):
    t = _fresh(catalog)
    t.set_properties({"format-version": "3"})
    t.delete_where("id = 1")
    t.delete_where("id = 3")
    t.update_set({"amount": "amount + 1.0"}, "id = 4")
    with pytest.raises(TableError):
        t.consolidate_deletes()


def test_v3_lineage_survives_compaction(catalog):
    t = _fresh(catalog)
    t.set_properties({"format-version": "3"})
    t.update_set({"amount": "amount + 1.0"}, "grp = 'a'")
    before = {r.id: r._row_id for r in t.scan(with_row_lineage=True).collect()}
    t.rewrite_data_files()
    after = {r.id: r._row_id for r in t.scan(with_row_lineage=True).collect()}
    assert after == before
