"""Real-codec tier (multimodal/binary.py): the BMP/WAV/PPM header parsers
must decode structurally valid files exactly and degrade to NULL dims on
garbage — never raise (bad assets are data at crawl scale, not exceptions).
"""

from __future__ import annotations

import struct

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.multimodal.binary import (
    _parse_bmp,
    _parse_ppm,
    _parse_wav,
    build_real_assets,
    decode_binary_real,
)

from tests.conftest import SF_SMALL


def _bmp(width: int, height: int, bpp: int = 24) -> bytes:
    body = b"\x00" * (height * ((width * bpp // 8 + 3) // 4 * 4))
    return (
        b"BM"
        + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, bpp, 0, len(body), 0, 0, 0, 0)
        + body
    )


def _wav(n_samples: int, channels: int = 2, bits: int = 16) -> bytes:
    body = b"\x00" * (n_samples * channels * bits // 8)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(body))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, channels, 44100, 44100 * channels * bits // 8, channels * bits // 8, bits)
        + b"data"
        + struct.pack("<I", len(body))
        + body
    )


def test_bmp_parser_exact_dims():
    assert _parse_bmp(_bmp(640, 480)) == (640, 480, 3)
    assert _parse_bmp(_bmp(7, 3, bpp=32)) == (7, 3, 4)
    # top-down BMPs store negative height; dimensions are still positive
    top_down = bytearray(_bmp(8, 2))
    struct.pack_into("<i", top_down, 22, -2)
    assert _parse_bmp(bytes(top_down)) == (8, 2, 3)


def test_wav_parser_exact_dims():
    assert _parse_wav(_wav(1000, channels=2, bits=16)) == (1000, 1, 2)
    assert _parse_wav(_wav(7, channels=1, bits=8)) == (7, 1, 1)


def test_ppm_parser():
    assert _parse_ppm(b"P6\n12 34\n255\n" + b"\x00" * (12 * 34 * 3)) == (12, 34, 3)


def test_parsers_reject_garbage():
    for junk in (b"", b"BM", b"RIFFxxxx", b"P6", b"\x89PNG\r\n\x1a\n" + b"\x00" * 64):
        assert _parse_bmp(junk) is None
        assert _parse_wav(junk) is None
        assert _parse_ppm(junk) is None


def test_decode_real_end_to_end(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(50)
    decoded = decode_binary_real(build_real_assets(docs)).collect()
    assert len(decoded) == 50
    for r in decoded:
        if r.doc_id % 2 == 0:  # BMP
            assert (r.width, r.channels) == (16, 3) and r.height >= 1
        else:  # WAV
            assert (r.height, r.channels) == (1, 1) and r.width >= 1


def test_decode_real_nulls_on_unknown_format(spark):
    df = spark.createDataFrame(
        [(1, "s", b"\x89PNG not really"), (2, "s", _bmp(4, 4))],
        "doc_id long, source string, payload binary",
    )
    rows = {r.doc_id: r for r in decode_binary_real(df).collect()}
    assert rows[1].width is None and rows[1].channels is None
    assert (rows[2].width, rows[2].height, rows[2].channels) == (4, 4, 3)
