"""Round-8 stretch: Puffin + Roaring deletion vectors (tables/puffin_io.py).

Same discipline as tests/test_avro_io.py: the round-trip check uses an
INDEPENDENT decoder written in THIS file from the public specs (Puffin
spec, RoaringFormatSpec, Iceberg v3 deletion-vector layout) — no code
shared with the package reader — so symmetric writer/reader bugs can't
mask each other. Then the full DV export arc is exercised including the
V3 carried-row case.
"""

from __future__ import annotations

import json
import struct
import zlib

import pytest

from iceberg_v2_to_v3_upgrade_spark.tables import LocalTable
from iceberg_v2_to_v3_upgrade_spark.tables.puffin_io import (
    deserialize_deletion_vector,
    serialize_deletion_vector,
    serialize_roaring64,
    write_puffin,
)

# ------------------------- independent decoder (spec-derived, no reuse)


def _iroaring32_walk(buf: bytes) -> tuple[list[int], int]:
    """Spec-derived decode of one 32-bit roaring bitmap at offset 0;
    returns (values, end). Handles cookie 12346 (no runs) and 12347
    (run containers allowed, count in high bits, run-flag bitset,
    offsets only at >= 4 containers)."""
    (cookie,) = struct.unpack_from("<I", buf, 0)
    if (cookie & 0xFFFF) == 12347:
        n = (cookie >> 16) + 1
        pos = 4
        nb = (n + 7) // 8
        flags = buf[pos : pos + nb]
        pos += nb
        run = [bool(flags[i >> 3] >> (i & 7) & 1) for i in range(n)]
        keys_cards = [
            struct.unpack_from("<HH", buf, pos + 4 * i) for i in range(n)
        ]
        pos += 4 * n
        if n >= 4:
            pos += 4 * n  # offsets present; sequential walk suffices
    else:
        assert cookie == 12346, cookie
        n = struct.unpack_from("<I", buf, 4)[0]
        run = [False] * n
        keys_cards = [
            struct.unpack_from("<HH", buf, 8 + 4 * i) for i in range(n)
        ]
        pos = 8 + 8 * n
    out = []
    for i, (key, cm1) in enumerate(keys_cards):
        card = cm1 + 1
        if run[i]:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                s, lm1 = struct.unpack_from("<HH", buf, pos)
                pos += 4
                out += [(key << 16) | v for v in range(s, s + lm1 + 1)]
        elif card <= 4096:
            out += [
                (key << 16) | v
                for v in struct.unpack_from(f"<{card}H", buf, pos)
            ]
            pos += 2 * card
        else:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            out += [
                (key << 16) | (wi << 6) | bit
                for wi, w in enumerate(words)
                for bit in range(64)
                if w >> bit & 1
            ]
    return out, pos


def _iroaring32(buf: bytes) -> list[int]:
    return _iroaring32_walk(buf)[0]


def _iroaring32_len(buf: bytes) -> int:
    return _iroaring32_walk(buf)[1]


def _idv(blob: bytes) -> list[int]:
    (length,) = struct.unpack_from(">I", blob, 0)
    body = blob[4 : 4 + length]
    assert body[:4] == b"\xd1\xd3\x3d\xd3"
    (crc,) = struct.unpack_from(">I", blob, 4 + length)
    assert zlib.crc32(body) & 0xFFFFFFFF == crc
    vec = body[4:]
    (n_maps,) = struct.unpack_from("<Q", vec, 0)
    pos, out = 8, []
    for _ in range(n_maps):
        (high,) = struct.unpack_from("<I", vec, pos)
        pos += 4
        sub = vec[pos:]
        ln = _iroaring32_len(sub)
        out += [(high << 32) | v for v in _iroaring32(sub[:ln])]
        pos += ln
    return out


def _ipuffin(path: str):
    data = open(path, "rb").read()
    assert data[:4] == b"PFA1" and data[-4:] == b"PFA1"
    (size,) = struct.unpack_from("<I", data, len(data) - 12)
    (flags,) = struct.unpack_from("<I", data, len(data) - 8)
    assert flags == 0
    start = len(data) - 12 - size
    assert data[start - 4 : start] == b"PFA1"
    meta = json.loads(data[start : start + size])
    return meta, [
        (b, data[b["offset"] : b["offset"] + b["length"]])
        for b in meta["blobs"]
    ]


# ----------------------------------------------------------- the tests


@pytest.mark.parametrize(
    "values",
    [
        [],
        [0],
        [4095, 4096, 65535, 65536],
        list(range(5000)),  # forces a bitmap container (card > 4096)
        list(range(4096)),  # exactly at the array/bitmap boundary
        [2**32 - 1, 2**32, 2**40 + 123],  # multiple 64-bit high keys
        [7, 7, 7],  # dedup
    ],
)
def test_dv_roundtrip_through_independent_decoder(values):
    blob = serialize_deletion_vector(values)
    want = sorted(set(values))
    assert _idv(blob) == want
    assert sorted(deserialize_deletion_vector(blob)) == want


def test_dv_crc_detects_corruption():
    blob = bytearray(serialize_deletion_vector([1, 2, 3]))
    blob[10] ^= 0xFF
    with pytest.raises(ValueError, match="CRC|magic"):
        deserialize_deletion_vector(bytes(blob))


def test_puffin_container_independent_read(tmp_path):
    p = str(tmp_path / "t.puffin")
    dv = serialize_deletion_vector([5, 9])
    write_puffin(
        p,
        [
            (b"raw-bytes", {"type": "other-blob", "properties": {}}),
            (
                dv,
                {
                    "type": "deletion-vector-v1",
                    "properties": {"referenced-data-file": "/x.parquet",
                                   "cardinality": "2"},
                },
            ),
        ],
        file_properties={"created-by": "test"},
    )
    meta, blobs = _ipuffin(p)
    assert meta["properties"]["created-by"] == "test"
    assert blobs[0][1] == b"raw-bytes"
    bm, payload = blobs[1]
    assert bm["type"] == "deletion-vector-v1"
    assert _idv(payload) == [5, 9]


def test_export_deletion_vectors_carried_row_case(spark, tmp_path):
    """The V3 sharp edge: an UPDATE re-appends the row with its ORIGINAL
    _row_id in a NEW file; the DV must mark the OLD file's position
    while the new copy stays undeleted."""
    import glob
    import os

    import duckdb

    from iceberg_v2_to_v3_upgrade_spark.tables.iceberg_export import (
        export_deletion_vectors,
    )

    t = LocalTable.create(
        spark, str(tmp_path / "t"), "id BIGINT, v DOUBLE"
    )
    t.insert(
        spark.createDataFrame(
            [(i, float(i)) for i in range(20)], "id BIGINT, v DOUBLE"
        )
    )
    t.set_properties({"format-version": "3"})
    t.delete_where("id IN (3, 4)")
    t.update_set({"v": "v * 100"}, "id = 7")  # carried-row rewrite

    out = export_deletion_vectors(t, str(tmp_path / "dv"))
    meta, blobs = _ipuffin(out)
    pairs = []
    for bm, payload in blobs:
        f = bm["properties"]["referenced-data-file"]
        pairs += [(f, p) for p in _idv(payload)]
    # DuckDB reconstructs the final state from raw files minus DV
    files = sorted(
        f
        for d in t.current_snapshot().data_dirs
        for f in glob.glob(os.path.join(d, "**", "*.parquet"),
                           recursive=True)
    )
    con = duckdb.connect()
    import pandas as pd

    con.register("dv", pd.DataFrame(pairs, columns=["fname", "pos"]))
    flist = ", ".join(f"'{f}'" for f in files)
    got = con.execute(
        f"""SELECT id, v
            FROM read_parquet([{flist}], filename=1, file_row_number=1) r
            WHERE NOT EXISTS (SELECT 1 FROM dv
                WHERE dv.fname = r.filename
                  AND dv.pos = r.file_row_number)
            ORDER BY id"""
    ).fetchall()
    con.close()
    want = [
        (r["id"], r["v"])
        for r in t.scan().orderBy("id").collect()
    ]
    assert got == want
    # V2 tables refuse
    t2 = LocalTable.create(spark, str(tmp_path / "t2"), "id BIGINT")
    t2.insert(spark.createDataFrame([(1,)], "id BIGINT"))
    with pytest.raises(ValueError, match="V3 feature"):
        export_deletion_vectors(t2, str(tmp_path / "dv2"))


def test_export_deletion_vectors_imported_dir(spark, tmp_path):
    """add_files dirs carry no physical _row_id column — the engine
    synthesizes first_row_id + file row index at read time, and DV
    positions for them must come from rid - first_row_id, not a column
    read (round-8 second-review finding: the column read crashed)."""
    from iceberg_v2_to_v3_upgrade_spark.tables.iceberg_export import (
        export_deletion_vectors,
    )

    ext = str(tmp_path / "external")
    spark.createDataFrame(
        [(i, float(i)) for i in range(12)], "id BIGINT, v DOUBLE"
    ).coalesce(1).write.parquet(ext)
    t = LocalTable.create(spark, str(tmp_path / "t"), "id BIGINT, v DOUBLE")
    t.add_files(ext)
    t.set_properties({"format-version": "3"})
    t.delete_where("id IN (2, 5, 11)")

    out = export_deletion_vectors(t, str(tmp_path / "dv"))
    meta, blobs = _ipuffin(out)
    got = {}
    for bm, payload in blobs:
        got[bm["properties"]["referenced-data-file"]] = _idv(payload)
    # one imported file; the deleted positions are the row indexes of
    # ids 2, 5, 11 in insertion order
    assert len(got) == 1
    assert next(iter(got.values())) == [2, 5, 11]
    # and no deletes -> no scans, empty container (the short-circuit)
    t2 = LocalTable.create(spark, str(tmp_path / "clean"), "id BIGINT")
    t2.insert(spark.createDataFrame([(1,)], "id BIGINT"))
    t2.set_properties({"format-version": "3"})
    out2 = export_deletion_vectors(t2, str(tmp_path / "dv_clean"))
    _, blobs2 = _ipuffin(out2)
    assert blobs2 == []


def test_historical_snapshots_export_dvs(spark, tmp_path):
    """Round-9: every snapshot with positional-delete state references
    Puffin DVs from its OWN manifest list in a V3 export (was
    current-snapshot-only in round 8 — time travel fell back to the
    parquet delete form)."""
    import json

    from iceberg_v2_to_v3_upgrade_spark.tables.avro_io import read_avro
    from iceberg_v2_to_v3_upgrade_spark.tables.iceberg_export import (
        export_iceberg_metadata,
    )

    t = LocalTable.create(spark, str(tmp_path / "t"), "id BIGINT, v DOUBLE")
    t.insert(
        spark.createDataFrame(
            [(i, float(i)) for i in range(30)], "id BIGINT, v DOUBLE"
        )
    )
    t.set_properties({"format-version": "3"})
    t.delete_where("id % 3 = 0")   # snapshot A
    t.delete_where("id % 5 = 0")   # snapshot B (current)
    meta = json.load(
        open(export_iceberg_metadata(t, str(tmp_path / "export")))
    )
    delete_snaps = [s.id for s in t.snapshots() if s.operation == "delete"]
    assert len(delete_snaps) == 2
    for sid in delete_snaps:
        snap = next(
            s for s in meta["snapshots"] if s["snapshot-id"] == sid
        )
        _, _, manifests = read_avro(snap["manifest-list"])
        delete_ms = [m for m in manifests if m["content"] == 1]
        assert delete_ms, f"snapshot {sid} lists no delete manifest"
        for m in delete_ms:
            _, _, entries = read_avro(m["manifest_path"])
            assert entries and all(
                e["data_file"]["file_format"] == "PUFFIN" for e in entries
            ), f"snapshot {sid} still exports parquet position deletes"
    # the two snapshots' DV cardinalities differ (A: only %3 deleted)
    def _card(sid):
        snap = next(
            s for s in meta["snapshots"] if s["snapshot-id"] == sid
        )
        _, _, manifests = read_avro(snap["manifest-list"])
        tot = 0
        for m in manifests:
            if m["content"] != 1:
                continue
            _, _, entries = read_avro(m["manifest_path"])
            tot += sum(e["data_file"]["record_count"] for e in entries)
        return tot

    a, b = sorted(delete_snaps)
    assert _card(a) == 10          # ids 0,3,...,27
    assert _card(b) == 10 + 4      # plus 5,10(dup? no),...
