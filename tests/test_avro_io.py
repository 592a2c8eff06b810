"""Round-8 item 2: Avro wire-format manifests for the Iceberg export.

The round-trip check uses an INDEPENDENT minimal Avro reader defined in
THIS file from the public Avro 1.11 spec — it shares no code with
``tables/avro_io.py`` — so a writer bug cannot be masked by a
symmetrically-buggy package reader. It then walks a real export's
manifest-list -> manifest chain with that reader and compares against
the table's own inventory.
"""

from __future__ import annotations

import io
import json
import struct

import pytest

from iceberg_v2_to_v3_upgrade_spark.tables import LocalTable
from iceberg_v2_to_v3_upgrade_spark.tables.avro_io import (
    read_avro,
    write_avro,
)
from iceberg_v2_to_v3_upgrade_spark.tables.iceberg_export import (
    export_iceberg_metadata,
)

# ------------------------- independent reader (spec-derived, no reuse)


def _ivarint(f) -> int:
    shift = acc = 0
    while True:
        (b,) = f.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # zigzag decode


def _ibytes(f) -> bytes:
    return f.read(_ivarint(f))


def _idecode(f, sch):
    if isinstance(sch, list):
        return _idecode(f, sch[_ivarint(f)])
    t = sch["type"] if isinstance(sch, dict) else sch
    if t == "record":
        return {fl["name"]: _idecode(f, fl["type"]) for fl in sch["fields"]}
    if t == "array":
        out = []
        while True:
            n = _ivarint(f)
            if n == 0:
                return out
            if n < 0:
                _ivarint(f)
                n = -n
            out += [_idecode(f, sch["items"]) for _ in range(n)]
    if t == "map":
        out = {}
        while True:
            n = _ivarint(f)
            if n == 0:
                return out
            if n < 0:
                _ivarint(f)
                n = -n
            for _ in range(n):
                k = _ibytes(f).decode()  # key MUST decode before value
                out[k] = _idecode(f, sch["values"])
    if t == "null":
        return None
    if t == "boolean":
        return f.read(1) == b"\x01"
    if t in ("int", "long"):
        return _ivarint(f)
    if t == "float":
        return struct.unpack("<f", f.read(4))[0]
    if t == "double":
        return struct.unpack("<d", f.read(8))[0]
    if t == "bytes":
        return _ibytes(f)
    if t == "string":
        return _ibytes(f).decode()
    raise AssertionError(f"independent reader: unexpected schema {sch}")


def independent_read(path: str):
    """Object-container read per the Avro spec: magic, metadata map,
    sync, blocks of (count, size, payload, sync)."""
    f = open(path, "rb")
    assert f.read(4) == b"Obj\x01", "bad magic"
    meta = {}
    while True:
        n = _ivarint(f)
        if n == 0:
            break
        if n < 0:
            _ivarint(f)
            n = -n
        for _ in range(n):
            k = _ibytes(f).decode()
            meta[k] = _ibytes(f)
    assert meta["avro.codec"] == b"null"
    sync = f.read(16)
    schema = json.loads(meta["avro.schema"])
    records = []
    while True:
        head = f.read(1)
        if not head:
            break
        f.seek(-1, 1)
        count = _ivarint(f)
        size = _ivarint(f)
        block = io.BytesIO(f.read(size))
        assert f.read(16) == sync, "sync mismatch"
        for _ in range(count):
            records.append(_idecode(block, schema))
        assert not block.read(1), "undrained block"
    f.close()
    return schema, meta, records


# ----------------------------------------------------------- the tests

_EDGE_SCHEMA = {
    "type": "record",
    "name": "edge",
    "fields": [
        {"name": "i", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "b", "type": "boolean"},
        {"name": "d", "type": "double"},
        {"name": "u", "type": ["null", "long"], "default": None},
        {"name": "a", "type": {"type": "array", "items": "int"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
        {"name": "y", "type": "bytes"},
    ],
}

_EDGE_ROWS = [
    {
        "i": 0,
        "s": "",
        "b": False,
        "d": 0.0,
        "u": None,
        "a": [],
        "m": {},
        "y": b"",
    },
    {
        "i": -1,
        "s": "naïve — ünïcode",
        "b": True,
        "d": -2.5,
        "u": -(2**62),
        "a": [-3, 0, 7],
        "m": {"k1": "v1", "k2": ""},
        "y": b"\x00\xff\x10",
    },
    {
        "i": 2**63 - 1,
        "s": "x" * 300,
        "b": True,
        "d": 1e300,
        "u": 2**62,
        "a": list(range(40)),
        "m": {},
        "y": bytes(range(20)),
    },
]


def test_roundtrip_through_independent_reader(tmp_path):
    p = str(tmp_path / "edge.avro")
    write_avro(p, _EDGE_SCHEMA, _EDGE_ROWS)
    schema, meta, got = independent_read(p)
    assert schema == _EDGE_SCHEMA
    assert got == _EDGE_ROWS
    # the package reader agrees too
    _, _, got2 = read_avro(p)
    assert got2 == _EDGE_ROWS


def test_empty_file_and_union_branch_errors(tmp_path):
    p = str(tmp_path / "empty.avro")
    write_avro(p, _EDGE_SCHEMA, [])
    _, _, got = independent_read(p)
    assert got == []
    with pytest.raises(ValueError, match="union branch"):
        write_avro(
            str(tmp_path / "bad.avro"),
            {"type": "record", "name": "r",
             "fields": [{"name": "u", "type": ["null", "long"]}]},
            [{"u": "not-a-long"}],
        )


def test_export_manifest_chain_reads_independently(spark, tmp_path):
    t = LocalTable.create(
        spark, str(tmp_path / "t"), "id BIGINT, v DOUBLE"
    )
    t.insert(
        spark.createDataFrame([(i, float(i)) for i in range(10)],
                              "id BIGINT, v DOUBLE")
    )
    t.delete_where("id >= 8")
    meta = json.load(
        open(export_iceberg_metadata(t, str(tmp_path / "export")))
    )
    current = next(
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _, lmeta, manifests = independent_read(current["manifest-list"])
    assert lmeta["format-version"] == b"2"
    assert {m["content"] for m in manifests} == {0, 1}
    # spec field ids are annotated in the embedded schema
    sch, _, _ = independent_read(current["manifest-list"])
    by_name = {f["name"]: f for f in sch["fields"]}
    assert by_name["manifest_path"]["field-id"] == 500
    assert by_name["content"]["field-id"] == 517
    seen_files = []
    statuses = set()
    for m in manifests:
        msch, mmeta, entries = independent_read(m["manifest_path"])
        assert mmeta["content"] in (b"data", b"deletes")
        assert json.loads(mmeta["schema"])["type"] == "struct"
        for e in entries:
            # ADDED (1) for dirs this snapshot added, EXISTING (0) for
            # inherited dirs — both attributed to their ORIGINAL adder
            assert e["status"] in (0, 1)
            statuses.add(e["status"])
            assert e["snapshot_id"] == m["added_snapshot_id"]
            assert e["data_file"]["file_format"] == "PARQUET"
            seen_files.append(e["data_file"]["file_path"])
    # the fixture has history (insert -> delete), so the CURRENT
    # snapshot's list must carry both attributions
    assert statuses == {0, 1}, statuses
    # the chain inventories exactly the table's current dirs
    snap = t.current_snapshot()
    import glob
    import os

    want = sorted(
        f
        for d in (*snap.data_dirs, *snap.delete_dirs)
        for f in glob.glob(os.path.join(d, "**", "*.parquet"),
                           recursive=True)
    )
    assert sorted(seen_files) == want


# ----------------- reader-schema resolution (round-10 verdict item 4)


def test_reader_schema_reorder_drop_default(tmp_path):
    """The standard consumer shape: fields reordered, a writer field
    projected away, an added field filled from its default."""
    p = str(tmp_path / "evolve.avro")
    write_avro(p, _EDGE_SCHEMA, _EDGE_ROWS)
    reader = {
        "type": "record",
        "name": "edge",
        "fields": [
            {"name": "s", "type": "string"},
            {"name": "u", "type": ["null", "long"], "default": None},
            {"name": "i", "type": "long"},
            {"name": "added", "type": "string", "default": "dflt"},
        ],
    }
    schema, _, got = read_avro(p, reader_schema=reader)
    assert schema == reader
    assert got == [
        {"s": r["s"], "u": r["u"], "i": r["i"], "added": "dflt"}
        for r in _EDGE_ROWS
    ]
    # reader field order governs result layout
    assert [list(r) for r in got] == [["s", "u", "i", "added"]] * len(got)


def test_reader_schema_promotions(tmp_path):
    p = str(tmp_path / "promo.avro")
    writer = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "n", "type": "int"},
            {"name": "f", "type": "float"},
            {"name": "s", "type": "string"},
            {"name": "arr", "type": {"type": "array", "items": "int"}},
        ],
    }
    write_avro(p, writer, [{"n": 7, "f": 1.5, "s": "hé", "arr": [1, 2]}])
    reader = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "n", "type": "long"},
            {"name": "f", "type": "double"},
            {"name": "s", "type": "bytes"},
            {"name": "arr", "type": {"type": "array", "items": "double"}},
        ],
    }
    _, _, got = read_avro(p, reader_schema=reader)
    assert got == [
        {"n": 7, "f": 1.5, "s": "hé".encode(), "arr": [1.0, 2.0]}
    ]
    assert all(isinstance(v, float) for v in got[0]["arr"])


def test_reader_schema_union_resolution(tmp_path):
    """Writer union branch resolves against the reader union's first
    COMPATIBLE branch (incl. promotion inside the union)."""
    p = str(tmp_path / "uni.avro")
    writer = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "u", "type": ["null", "int"]}],
    }
    write_avro(p, writer, [{"u": None}, {"u": 41}])
    reader = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "u", "type": ["null", "long"],
                    "default": None}],
    }
    _, _, got = read_avro(p, reader_schema=reader)
    assert got == [{"u": None}, {"u": 41}]


def test_reader_schema_missing_default_errors(tmp_path):
    p = str(tmp_path / "nodefault.avro")
    write_avro(
        p,
        {"type": "record", "name": "r",
         "fields": [{"name": "a", "type": "long"}]},
        [{"a": 1}],
    )
    reader = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "long"},  # no default -> must raise
        ],
    }
    with pytest.raises(ValueError, match="no default"):
        read_avro(p, reader_schema=reader)


def test_reader_schema_incompatible_primitive_errors(tmp_path):
    p = str(tmp_path / "incompat.avro")
    write_avro(
        p,
        {"type": "record", "name": "r",
         "fields": [{"name": "a", "type": "double"}]},
        [{"a": 1.0}],
    )
    reader = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "a", "type": "long"}],  # double -/-> long
    }
    with pytest.raises(ValueError, match="resolve|matches"):
        read_avro(p, reader_schema=reader)


def test_reader_schema_on_real_manifest_list(spark, tmp_path):
    """The verdict's literal consumer: an export's manifest-list read
    under a reordered reader schema with a defaulted extra field —
    every manifest path must still come out, in file order."""
    t = LocalTable.create(spark, str(tmp_path / "t"), "id BIGINT")
    t.insert(spark.createDataFrame([(i,) for i in range(10)], "id BIGINT"))
    t.delete_where("id = 3")
    meta = json.load(
        open(export_iceberg_metadata(t, str(tmp_path / "export")))
    )
    current = next(
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    wschema, _, manifests = read_avro(current["manifest-list"])
    reader = dict(wschema)
    reader["fields"] = list(reversed(wschema["fields"])) + [
        {"name": "note", "type": "string", "default": "x"}
    ]
    _, _, evolved = read_avro(current["manifest-list"], reader_schema=reader)
    assert [e["manifest_path"] for e in evolved] == [
        m["manifest_path"] for m in manifests
    ]
    assert all(e["note"] == "x" for e in evolved)
