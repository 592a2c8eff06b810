"""Round-9 fixes for the four round-8 ADVICE findings.

1. avro_io._Cursor rejects negative decoded lengths / block counts
   instead of silently slicing wrong bytes (advice: avro_io.py:225).
2. puffin_io.read_puffin bounds-checks blob offset/length against the
   blob region (advice: puffin_io.py:222).
3. iceberg_export records unresolvable equality-delete columns in the
   historical manifest's key-value metadata so an external reader can
   DETECT the gap (advice: iceberg_export.py:371) —
   test_dropped_eq_column_historical_gap_recorded below.
4. lifecycle10 i44 reads expired snapshot ids from the router's
   structured ``StatementResult.data`` instead of parsing the
   human-readable message (advice: lifecycle10.py:113).
"""

from __future__ import annotations

import datetime
import json
import struct

import pytest

from iceberg_v2_to_v3_upgrade_spark.tables.avro_io import (
    _MAGIC,
    _Cursor,
    read_avro,
    write_avro,
)
from iceberg_v2_to_v3_upgrade_spark.tables.puffin_io import (
    read_puffin,
    write_puffin,
)

_SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [{"name": "x", "type": "long"}],
}


def test_cursor_rejects_negative_length():
    # varint 0x01 zigzag-decodes to -1: a corrupt length prefix
    cur = _Cursor(b"\x01\xff\xff")
    with pytest.raises(ValueError, match="negative"):
        cur.read_bytes()
    # and pos must not have been rewound past the varint
    assert cur.pos == 1


def test_read_avro_rejects_negative_block_count(tmp_path):
    p = str(tmp_path / "ok.avro")
    write_avro(p, _SCHEMA, [{"x": 1}])
    data = bytearray(open(p, "rb").read())
    # locate the data block: header = magic + meta map + sync(16).
    # The block starts right after the 16-byte sync; its first byte is
    # the record-count varint (1 -> 0x02). Corrupt it to -1 (0x01).
    schema, meta, _ = read_avro(p)
    # find the sync marker (last 16 bytes are the trailing sync copy)
    sync = bytes(data[-16:])
    first_sync_at = bytes(data).index(sync)
    block_at = first_sync_at + 16
    assert data[block_at] == 0x02  # count=1 zigzag
    data[block_at] = 0x01  # count=-1 zigzag
    bad = str(tmp_path / "bad.avro")
    open(bad, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="negative Avro block"):
        read_avro(bad)


def test_read_puffin_rejects_out_of_range_blob(tmp_path):
    p = str(tmp_path / "ok.puffin")
    write_puffin(
        p,
        [(b"payload", {"type": "deletion-vector-v1", "fields": []})],
    )
    meta, blobs = read_puffin(p)  # sanity: valid file reads fine
    assert blobs[0][1] == b"payload"
    raw = open(p, "rb").read()
    (size,) = struct.unpack_from("<I", raw, len(raw) - 12)
    payload_start = len(raw) - 12 - size
    footer = json.loads(raw[payload_start : payload_start + size])
    # patch the blob length past the blob region, keep footer size equal
    # by shrinking a same-width field is fiddly — instead rebuild the
    # footer with a corrupt offset and rewrite the trailing structure
    footer["blobs"][0]["offset"] = 10**9
    new_footer = json.dumps(footer).encode()
    body = raw[: payload_start - 4]
    out = (
        body
        + _PUFFIN_MAGIC
        + new_footer
        + struct.pack("<I", len(new_footer))
        + struct.pack("<I", 0)
        + _PUFFIN_MAGIC
    )
    bad = str(tmp_path / "bad.puffin")
    open(bad, "wb").write(out)
    with pytest.raises(ValueError, match="out of range"):
        read_puffin(bad)


_PUFFIN_MAGIC = b"PFA1"


def test_expire_returns_structured_ids(spark, tmp_path):
    from iceberg_v2_to_v3_upgrade_spark.sql_router import EngineSQL
    from iceberg_v2_to_v3_upgrade_spark.tables import LocalCatalog

    cat = LocalCatalog(spark, str(tmp_path / "wh"))
    t = cat.create_table("db", "t", "id BIGINT")
    t.insert(spark.createDataFrame([(1,)], "id BIGINT"))
    t.insert(spark.createDataFrame([(2,)], "id BIGINT"))
    old_ids = [s.id for s in t.snapshots()][:-1]
    res = EngineSQL(cat).execute_one(
        "CALL system.expire_snapshots(table => 'db.t', "
        "older_than => TIMESTAMP '2030-01-01 00:00:00', retain_last => 1)"
    )
    assert res.kind == "expire_snapshots"
    assert sorted(res.data) == sorted(old_ids)


def test_dropped_eq_column_historical_gap_recorded(spark, tmp_path):
    """A HISTORICAL snapshot whose equality-delete columns are no longer
    resolvable exports with the gap recorded in the manifest's key-value
    metadata (consumers can detect it), while the current snapshot —
    whose deletes are fully resolvable — exports normally."""
    from iceberg_v2_to_v3_upgrade_spark.tables import LocalTable
    from iceberg_v2_to_v3_upgrade_spark.tables.iceberg_export import (
        export_iceberg_metadata,
    )

    t = LocalTable.create(
        spark, str(tmp_path / "t"), "id BIGINT, c BIGINT, v DOUBLE"
    )
    t.insert(
        spark.createDataFrame(
            [(i, i, float(i)) for i in range(10)],
            "id BIGINT, c BIGINT, v DOUBLE",
        )
    )
    t.delete_by_keys(spark.createDataFrame([(2,)], "c BIGINT"), ["c"])
    eq_snap = t.current_snapshot().id
    # compaction applies the eq-delete; the CURRENT snapshot carries none
    t.rewrite_data_files(rewrite_all=True, delete_file_threshold=1)
    assert not t.current_snapshot().eq_deletes
    # simulate the legacy state: the historical eq-delete references a
    # column that no longer resolves
    for s in t._meta["snapshots"]:
        for e in s.get("eq_deletes", []):
            e["cols"] = ["ghost"]
    out = str(tmp_path / "export")
    export_iceberg_metadata(t, out)  # must NOT raise

    from iceberg_v2_to_v3_upgrade_spark.tables.avro_io import read_avro

    gaps = []
    for mf in __import__("glob").glob(f"{out}/**/manifest-*.avro", recursive=True):
        _, meta, entries = read_avro(mf)
        if "unresolved-equality-columns" in meta:
            gaps.append((mf, json.loads(meta["unresolved-equality-columns"])))
            assert all(e["data_file"]["content"] == 2 for e in entries)
            assert all(e["data_file"]["equality_ids"] is None for e in entries)
            assert str(eq_snap) in mf
    assert gaps and gaps[0][1] == ["ghost"]
