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


def test_partition_tuples_and_summaries(spark, tmp_path):
    """Round-9: manifest entries carry typed r102 partition tuples
    (identity string, bucket int, day date-int) parsed from the hive
    layout, under the spec each dir was written under; the manifest
    list carries r508 field summaries with single-value bounds."""
    import datetime
    import struct

    from iceberg_v2_to_v3_upgrade_spark.tables.avro_io import read_avro

    t = LocalTable.create(
        spark,
        str(tmp_path / "t"),
        "id BIGINT, cat STRING, ts TIMESTAMP",
        partition_by=["cat", "bucket(4, id)", "days(ts)"],
    )
    rows = [
        (i, "ab"[i % 2], datetime.datetime(2024, 1, 1 + i % 3))
        for i in range(20)
    ]
    t.insert(
        spark.createDataFrame(rows, "id BIGINT, cat STRING, ts TIMESTAMP")
    )
    meta = json.load(
        open(export_iceberg_metadata(t, str(tmp_path / "export")))
    )
    spec = meta["partition-specs"][meta["default-spec-id"]]
    by_name = {f["name"]: f for f in spec["fields"]}
    assert by_name["cat"]["transform"] == "identity"
    # NOT the spec's bucket[4]: engine buckets are xxhash64, and a
    # murmur3-assuming reader pruning on "bucket[4]" would drop files
    # that contain matching rows. Unknown transform = no mis-pruning.
    assert by_name["id_bucket"]["transform"] == "xxhash64-bucket[4]"
    assert by_name["ts_day"]["transform"] == "day"
    current = next(
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _, _, manifests = read_avro(current["manifest-list"])
    data = [m for m in manifests if m["content"] == 0]
    assert data
    epoch = datetime.date(1970, 1, 1)
    want_days = {
        (datetime.date(2024, 1, 1 + k) - epoch).days for k in range(3)
    }
    seen = set()
    for m in data:
        assert m["partition_spec_id"] == meta["default-spec-id"]
        _, mmeta, entries = read_avro(m["manifest_path"])
        assert json.loads(mmeta["partition-spec"]) == spec
        for e in entries:
            p = e["data_file"]["partition"]
            assert p["cat"] in ("a", "b")
            assert 0 <= p["id_bucket"] < 4
            assert p["ts_day"] in want_days
            # tuple agrees with the file's own hive path
            assert f"cat={p['cat']}" in e["data_file"]["file_path"]
            seen.add((p["cat"], p["id_bucket"], p["ts_day"]))
        # r508 summaries: bounds per field in spec order, spec
        # single-value binary (string utf-8, int 4-byte LE)
        s_cat, s_bucket, s_day = m["partitions"]
        assert s_cat["lower_bound"] in (b"a", b"b")
        lo_b = struct.unpack("<i", s_bucket["lower_bound"])[0]
        hi_b = struct.unpack("<i", s_bucket["upper_bound"])[0]
        assert 0 <= lo_b <= hi_b < 4
        lo_d = struct.unpack("<i", s_day["lower_bound"])[0]
        assert lo_d == min(want_days)
        assert not s_cat["contains_null"]
    assert len(seen) > 1, "partitioned insert produced one tuple"


def test_partition_tuples_follow_spec_evolution(spark, tmp_path):
    """Dirs written before a partition-spec change keep their ORIGINAL
    spec in the export: per-manifest partition_spec_id, embedded spec
    JSON, and tuple fields all match the dir's own layout."""
    from iceberg_v2_to_v3_upgrade_spark.tables.avro_io import read_avro

    t = LocalTable.create(
        spark, str(tmp_path / "t"), _SCHEMA, partition_by=["cat"]
    )
    t.insert(
        spark.createDataFrame(
            [(i, "ab"[i % 2], float(i)) for i in range(8)], _SCHEMA
        )
    )
    t.evolve_partition_spec(["bucket(2, id)"])
    t.insert(
        spark.createDataFrame(
            [(i, "c", float(i)) for i in range(8, 12)], _SCHEMA
        )
    )
    meta = json.load(
        open(export_iceberg_metadata(t, str(tmp_path / "export")))
    )
    current = next(
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _, _, manifests = read_avro(current["manifest-list"])
    specs = {s["spec-id"]: s for s in meta["partition-specs"]}
    seen_specs = set()
    for m in manifests:
        if m["content"] != 0:
            continue
        sid = m["partition_spec_id"]
        seen_specs.add(sid)
        _, mmeta, entries = read_avro(m["manifest_path"])
        assert int(mmeta["partition-spec-id"]) == sid
        names = {f["name"] for f in specs[sid]["fields"]}
        for e in entries:
            assert set(e["data_file"]["partition"]) == names
            assert all(
                v is not None
                for v in e["data_file"]["partition"].values()
            )
    assert seen_specs == {0, 1}, seen_specs
