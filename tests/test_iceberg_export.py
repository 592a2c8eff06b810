"""Spec-shaped Iceberg metadata export (tables/iceberg_export.py).

A consumer that knows only the PUBLIC Iceberg v2 metadata field layout —
not this engine — must be able to: read the metadata file, find the
current snapshot, follow its manifest-list, inventory data and delete
files, and reconstruct the merged table state. The last step is executed
for real with DuckDB reading ONLY paths discovered from the export.
"""

from __future__ import annotations

import json
import os

import duckdb
import pyarrow.parquet as pq

from iceberg_v2_to_v3_upgrade_spark.tables import LocalTable
from iceberg_v2_to_v3_upgrade_spark.tables.iceberg_export import (
    export_iceberg_metadata,
)

_SCHEMA = "id BIGINT, cat STRING, val DOUBLE"

_REQUIRED_V2 = [
    "format-version", "table-uuid", "location", "last-sequence-number",
    "last-updated-ms", "last-column-id", "current-schema-id", "schemas",
    "default-spec-id", "partition-specs", "last-partition-id",
    "default-sort-order-id", "sort-orders", "properties",
    "current-snapshot-id", "snapshots", "snapshot-log", "refs",
]


def _build(spark, tmp_path):
    t = LocalTable.create(
        spark, str(tmp_path / "t"), _SCHEMA, partition_by=["cat"]
    )
    t.insert(
        spark.createDataFrame(
            [(i, "ab"[i % 2], float(i)) for i in range(12)], _SCHEMA
        )
    )
    t.delete_where("id IN (2, 5)")
    t.create_tag("pre_update")
    t.update_set({"val": "val * 2"}, "cat = 'b'")
    return t


def test_export_carries_all_required_v2_fields(spark, tmp_path):
    t = _build(spark, tmp_path)
    path = export_iceberg_metadata(t, str(tmp_path / "export"))
    meta = json.load(open(path))
    for field in _REQUIRED_V2:
        assert field in meta, f"missing spec field {field}"
    assert meta["format-version"] == 2
    # schema field ids are unique and last-column-id is the max
    fields = meta["schemas"][0]["fields"]
    ids = [f["id"] for f in fields]
    assert len(set(ids)) == len(ids)
    assert meta["last-column-id"] >= max(ids)
    assert [f["name"] for f in fields] == ["id", "cat", "val"]
    # partition spec: identity transform on cat, field-id >= 1000
    spec = meta["partition-specs"][meta["default-spec-id"]]
    assert spec["fields"][0]["transform"] == "identity"
    assert spec["fields"][0]["field-id"] >= 1000
    assert spec["fields"][0]["source-id"] == 2  # cat
    # refs: main branch + the tag
    assert meta["refs"]["main"]["snapshot-id"] == meta["current-snapshot-id"]
    assert meta["refs"]["pre_update"]["type"] == "tag"
    # snapshot-log covers exactly the current ancestry
    log_ids = [e["snapshot-id"] for e in meta["snapshot-log"]]
    assert log_ids == [s.id for s in t.ancestry()]


def test_external_consumer_rebuilds_state_from_export_alone(
    spark, tmp_path
):
    """DuckDB reconstructs the merged table using ONLY the export: walk
    metadata -> current snapshot -> Avro manifest-list -> Avro manifests
    -> file inventory, then data files anti-join positional delete files
    on _row_id."""
    from iceberg_v2_to_v3_upgrade_spark.tables.avro_io import read_avro

    t = _build(spark, tmp_path)
    meta = json.load(
        open(export_iceberg_metadata(t, str(tmp_path / "export")))
    )
    current = next(
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    assert current["manifest-list"].endswith(".avro")
    _, _, manifests = read_avro(current["manifest-list"])
    data_files, delete_files = [], []
    for m in manifests:
        # manifest_length is the spec meaning: the manifest FILE's size
        assert m["manifest_length"] == os.path.getsize(m["manifest_path"])
        _, _, entries = read_avro(m["manifest_path"])
        paths = [e["data_file"]["file_path"] for e in entries]
        # record_count matches the parquet footers it inventories
        for e in entries:
            assert e["data_file"]["record_count"] == pq.ParquetFile(
                e["data_file"]["file_path"]
            ).metadata.num_rows
        (data_files if m["content"] == 0 else delete_files).extend(paths)
    assert data_files and delete_files
    con = duckdb.connect()
    dlist = ", ".join(f"'{f}'" for f in data_files)
    xlist = ", ".join(f"'{f}'" for f in delete_files)
    got = con.execute(
        f"SELECT id, val FROM read_parquet([{dlist}], "
        f"hive_partitioning=1, union_by_name=1) "
        f"WHERE _row_id NOT IN (SELECT _row_id FROM read_parquet([{xlist}])) "
        f"ORDER BY id"
    ).fetchall()
    want = [
        (r["id"], r["val"])
        for r in t.scan().select("id", "val").orderBy("id").collect()
    ]
    assert got == want


def test_export_maps_nested_and_decimal_types(spark, tmp_path):
    t = LocalTable.create(
        spark,
        str(tmp_path / "nested"),
        "id BIGINT, emb ARRAY<DOUBLE>, amt DECIMAL(10,2), "
        "attrs MAP<STRING, STRING>",
    )
    t.insert(
        spark.createDataFrame(
            [], "id BIGINT, emb ARRAY<DOUBLE>, amt DECIMAL(10,2), "
            "attrs MAP<STRING, STRING>"
        )
    )
    meta = json.load(
        open(export_iceberg_metadata(t, str(tmp_path / "export2")))
    )
    by_name = {f["name"]: f for f in meta["schemas"][0]["fields"]}
    assert by_name["emb"]["type"]["type"] == "list"
    assert by_name["emb"]["type"]["element"] == "double"
    assert by_name["amt"]["type"] == "decimal(10, 2)"
    assert by_name["attrs"]["type"]["type"] == "map"
    # nested ids don't collide with top-level ids
    ids = {f["id"] for f in meta["schemas"][0]["fields"]}
    nested = {
        by_name["emb"]["type"]["element-id"],
        by_name["attrs"]["type"]["key-id"],
        by_name["attrs"]["type"]["value-id"],
    }
    assert not (ids & nested)
    assert meta["last-column-id"] >= max(ids | nested)
