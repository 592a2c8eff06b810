"""[EXT] Multimodal binary-column plumbing (SURVEY.md north-star).

Images/audio/video are opaque ``binary`` payload columns with a typed
metadata struct alongside. The Spark-side plumbing — schema, Arrow-batched
mapInPandas decode, partition-preserving feature extraction — is real and
tested. Two codec tiers:

- ``decode_binary_real``: REAL header parsing for BMP / WAV / PPM (pure
  stdlib; these formats need no external codec), exercised end-to-end by
  ``m5_real_codec_decode`` over structurally valid files built by
  ``build_real_assets``. Compressed formats (JPEG/PNG/FLAC) would slot in
  here behind the same dispatch once PIL/libsndfile exist in the image.
- ``decode_binary``: the deterministic arithmetic STUB kept for the m1
  pipeline (stable dims from byte length — useful as a fixture).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare

#: Output schema of the decode step (one row per asset).
DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("source", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
    ]
)


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct to each doc.

    In production the payload is the raw image/audio bytes read from object
    storage; here it's the utf-8 encoded text (deterministic, same plumbing).
    """
    return docs.select(
        "doc_id",
        "source",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("fake/txt").alias("content_type"),
            F.octet_length(F.encode("text", "UTF-8")).alias("n_bytes"),
        ).alias("meta"),
    )


def decode_binary(assets: DataFrame) -> DataFrame:
    """Arrow-batched decode via mapInPandas.

    Each pandas batch holds ~10k rows of (doc_id, source, payload); the
    decode is embarrassingly parallel and partition-preserving (no shuffle).
    STUB: dimensions are a deterministic function of the byte length —
    replace the body marked below with a real codec in production.
    """

    def _decode_stub(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            n = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "source": pdf["source"],
                    "n_bytes": n.astype("int64"),
                    # --- STUB decode: deterministic fake dimensions ------
                    "width": (n % 256).astype("int32"),
                    "height": ((n // 256) % 256 + 1).astype("int32"),
                    "channels": (n % 3 + 1).astype("int32"),
                    # ------------------------------------------------------
                }
            )

    # spread the CPU-bound Python decode across all cores: the landing
    # files may be few/large (single row group == single task otherwise)
    n = assets.sparkSession.sparkContext.defaultParallelism
    return (
        assets.select("doc_id", "source", "payload")
        .repartition(n)
        .mapInPandas(_decode_stub, DECODE_SCHEMA)
    )


def _parse_bmp(payload: bytes) -> tuple[int, int, int] | None:
    """Parse a real BMP (BITMAPINFOHEADER): width/height/channels from the
    40-byte DIB header. Pure stdlib — BMP is the uncompressed-image
    interchange format a codec-less container can still fully decode."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    width, height = struct.unpack_from("<ii", payload, 18)
    bits_per_px = struct.unpack_from("<H", payload, 28)[0]
    return width, abs(height), max(1, bits_per_px // 8)


def _parse_wav(payload: bytes) -> tuple[int, int, int] | None:
    """Parse a real RIFF/WAVE file: (n_samples, 1, n_channels) from the
    fmt and data chunks — the audio analog of image dimensions."""
    import struct

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, channels, bits = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"fmt ":
            channels = struct.unpack_from("<H", payload, pos + 10)[0]
            bits = struct.unpack_from("<H", payload, pos + 22)[0]
        elif cid == b"data" and channels:
            n_samples = size // max(1, channels * bits // 8)
            return n_samples, 1, channels
        pos += 8 + size + (size & 1)
    return None


def _parse_ppm(payload: bytes) -> tuple[int, int, int] | None:
    """Parse a real binary PPM (P6): ASCII header 'P6 <w> <h> <maxval>'.
    '#' comments run to end-of-line and may contain digits, so strip them
    whole-line rather than token-wise."""
    import re

    if not payload.startswith(b"P6"):
        return None
    header = re.sub(rb"#[^\n]*", b"", payload[2:64])
    fields: list[int] = []
    for token in header.split():
        if token.isdigit():
            fields.append(int(token))
        if len(fields) == 3:
            return fields[0], fields[1], 3
    return None


def decode_binary_real(assets: DataFrame) -> DataFrame:
    """Real codec path: dispatch on magic bytes and parse actual BMP /
    WAV / PPM containers (pure stdlib — these formats need no external
    codec). Unknown formats yield NULL dimensions rather than failing the
    batch, the behavior a 100 TB crawl decode needs (bad assets are data,
    not exceptions). Same Arrow batch shape and (no-)shuffle profile as
    the stub path.

    The UDF references this module's parser functions, so executors that
    can't import the package (driver launched outside the repo root) need
    them shipped by value — see the register_pickle_by_value call at the
    bottom of this module."""

    def _decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            widths, heights, chans = [], [], []
            for payload in pdf["payload"]:
                dims = (
                    _parse_bmp(payload)
                    or _parse_wav(payload)
                    or _parse_ppm(payload)
                )
                w, h, c = dims if dims else (None, None, None)
                widths.append(w)
                heights.append(h)
                chans.append(c)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "source": pdf["source"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "width": pd.Series(widths, dtype="Int32"),
                    "height": pd.Series(heights, dtype="Int32"),
                    "channels": pd.Series(chans, dtype="Int32"),
                }
            )

    n = assets.sparkSession.sparkContext.defaultParallelism
    return (
        assets.select("doc_id", "source", "payload")
        .repartition(n)
        .mapInPandas(_decode, DECODE_SCHEMA)
    )


ASSET_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("source", StringType()),
        StructField("payload", BinaryType()),
    ]
)


def build_real_assets(docs: DataFrame) -> DataFrame:
    """Encode each document's bytes into a REAL container format —
    24-bit BMP for even doc_ids, 16-bit mono WAV for odd — deterministic
    stand-ins for crawled image/audio assets. The files are structurally
    valid (parseable by any stock viewer/codec), which is what lets
    ``decode_binary_real`` exercise true header parsing end-to-end."""

    def _build(batches: Iterator) -> Iterator:
        import struct

        import pandas as pd

        def bmp(data: bytes) -> bytes:
            width = 16  # 16 px * 3 B = 48 B/row, already 4-byte aligned
            height = max(1, -(-len(data) // 48))
            body = data.ljust(height * 48, b"\x00")
            header = b"BM" + struct.pack(
                "<IHHI", 54 + len(body), 0, 0, 54
            ) + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 0, 0, 0, 0)
            return header + body

        def wav(data: bytes) -> bytes:
            body = data if len(data) % 2 == 0 else data + b"\x00"
            return (
                b"RIFF"
                + struct.pack("<I", 36 + len(body))
                + b"WAVEfmt "
                + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
                + b"data"
                + struct.pack("<I", len(body))
                + body
            )

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "source": pdf["source"],
                    "payload": [
                        bmp(p) if doc_id % 2 == 0 else wav(p)
                        for doc_id, p in zip(pdf["doc_id"], pdf["payload"])
                    ],
                }
            )

    n = docs.sparkSession.sparkContext.defaultParallelism
    return (
        with_binary_payload(docs)
        .select("doc_id", "source", "payload")
        .repartition(n)
        .mapInPandas(_build, ASSET_SCHEMA)
    )


@declare(
    "m5_real_codec_decode",
    oracle="""
        WITH b AS (
            SELECT doc_id, source, octet_length(encode(text)) AS n
            FROM documents),
        d AS (
            SELECT source,
                   CASE WHEN doc_id % 2 = 0 THEN 16
                        ELSE CAST(ceil(n / 2.0) AS INTEGER) END AS width,
                   CASE WHEN doc_id % 2 = 0
                        THEN CAST(greatest(1, ceil(n / 48.0)) AS INTEGER)
                        ELSE 1 END AS height,
                   CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS channels,
                   CASE WHEN doc_id % 2 = 0
                        THEN 54 + greatest(1, CAST(ceil(n / 48.0) AS BIGINT)) * 48
                        ELSE 44 + 2 * CAST(ceil(n / 2.0) AS BIGINT) END AS n_bytes
            FROM b)
        SELECT source,
               count(*) AS n_assets,
               CAST(sum(CASE WHEN channels = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_images,
               CAST(sum(CASE WHEN channels = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_audio,
               CAST(sum(width * height * channels) AS BIGINT) AS total_pixels,
               CAST(sum(n_bytes) AS BIGINT) AS total_bytes
        FROM d GROUP BY source ORDER BY source
    """,
    tags=("ext", "multimodal", "codec", "pandas-udf"),
)
def m5_real_codec_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL codec round-trip: documents -> structurally valid BMP/WAV
    containers -> ``decode_binary_real`` header parse -> per-source asset
    stats. The oracle recomputes every dimension from octet lengths, so a
    single mis-parsed header field (stride padding, chunk alignment,
    sample width) breaks the hash — this is the proof the codec path
    parses real formats, not the stub arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_binary_real(build_real_assets(docs))
    return (
        decoded.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum((F.col("channels") == 3).cast("long")).alias("n_images"),
            F.sum((F.col("channels") == 1).cast("long")).alias("n_audio"),
            F.sum(
                F.col("width").cast("long")
                * F.col("height")
                * F.col("channels")
            ).alias("total_pixels"),
            F.sum("n_bytes").alias("total_bytes"),
        )
        .orderBy("source")
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", LongType()),
    ]
)


def sample_frames(
    assets: DataFrame, frame_size: int = 64, every: int = 4
) -> DataFrame:
    """Frame-sampling plumbing for video/audio-like payloads: slice the
    binary into fixed-size frames and keep every ``every``-th one — a
    1->N row-exploding mapInPandas (the batch shape real frame samplers
    need: one input row fans out to a variable number of output rows).
    STUB: a real sampler would decode container timestamps; the slicing,
    schema, and fan-out are the production dataflow.
    """

    def _sample(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, sizes = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                total = len(payload)
                n_frames = (total + frame_size - 1) // frame_size
                for i in range(0, n_frames, every):
                    frame = payload[i * frame_size : (i + 1) * frame_size]
                    ids.append(doc_id)
                    idxs.append(i)
                    sizes.append(len(frame))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_bytes": pd.Series(sizes, dtype="int64"),
                }
            )

    n = assets.sparkSession.sparkContext.defaultParallelism
    return (
        assets.select("doc_id", "payload")
        .repartition(n)
        .mapInPandas(_sample, FRAME_SCHEMA)
    )


@declare(
    "m2_frame_sample",
    oracle="""
        WITH b AS (
            SELECT doc_id, octet_length(encode(text)) AS total
            FROM documents),
        f AS (
            SELECT doc_id, i AS frame_idx,
                   least(64, total - 64 * i) AS frame_bytes
            FROM b, unnest(generate_series(0, (total + 63) // 64 - 1, 4))
                    AS t(i))
        SELECT doc_id, frame_idx, frame_bytes
        FROM f ORDER BY doc_id, frame_idx
    """,
    tags=("ext", "multimodal", "pandas-udf"),
)
def m2_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling end-to-end: binary payload -> every-4th 64-byte
    frame with its true sliced length. The oracle reproduces the slicing
    arithmetic on octet lengths, so the row fan-out AND the actual byte
    slicing are hash-checked."""
    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames(with_binary_payload(docs))
    return frames.orderBy("doc_id", "frame_idx")


@declare(
    "m1_binary_decode_stats",
    oracle="""
        WITH b AS (
            SELECT doc_id, source, octet_length(encode(text)) AS n_bytes
            FROM documents)
        SELECT source,
               count(*) AS n_assets,
               CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
               round(avg(n_bytes % 256), 4) AS avg_width,
               max(CAST((n_bytes // 256) % 256 + 1 AS INTEGER)) AS max_height
        FROM b GROUP BY source ORDER BY source
    """,
    tags=("ext", "multimodal", "pandas-udf"),
)
def m1_binary_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline: attach binary payloads -> Arrow
    mapInPandas decode -> grouped feature stats. The oracle reproduces the
    stub's arithmetic on octet lengths, so the whole pipeline (including the
    Python batch boundary) is hash-checked."""
    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_binary(with_binary_payload(docs))
    return (
        decoded.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg(F.col("n_bytes") % 256), 4).alias("avg_width"),
            F.max(((F.col("n_bytes") / 256).cast("long") % 256 + 1).cast("int")).alias(
                "max_height"
            ),
        )
        .orderBy("source")
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("source", StringType()),
        StructField("orig_bytes", LongType()),
        StructField("thumb_bytes", LongType()),
    ]
)


def resize_binary(assets: DataFrame, target_bytes: int = 4096) -> DataFrame:
    """Resize/thumbnail plumbing: binary in -> smaller binary out, one row
    per asset, partition-preserving (the shape of an image-resize stage).
    STUB: "resizing" truncates the real payload to ``target_bytes``; a
    production codec decodes, resamples, and re-encodes — same batch
    shape, schema, and (no-)shuffle profile.
    """

    def _resize(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            thumbs = pdf["payload"].map(lambda b: b[:target_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "source": pdf["source"],
                    "orig_bytes": pdf["payload"].map(len).astype("int64"),
                    "thumb_bytes": thumbs.map(len).astype("int64"),
                }
            )

    n = assets.sparkSession.sparkContext.defaultParallelism
    return (
        assets.select("doc_id", "source", "payload")
        .repartition(n)
        .mapInPandas(_resize, RESIZE_SCHEMA)
    )


@declare(
    "m3_resize_stats",
    oracle="""
        WITH b AS (
            SELECT doc_id, source, octet_length(encode(text)) AS n
            FROM documents)
        SELECT source,
               count(*) AS n_assets,
               CAST(sum(least(n, 4096)) AS BIGINT) AS total_thumb_bytes,
               CAST(sum(CASE WHEN n > 4096 THEN 1 ELSE 0 END) AS BIGINT) AS n_shrunk
        FROM b GROUP BY source ORDER BY source
    """,
    tags=("ext", "multimodal", "pandas-udf"),
)
def m3_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail pipeline: payload -> 4 KiB-capped resize -> per-source
    accounting. The oracle reproduces the truncation arithmetic on octet
    lengths, so the Python resize stage is hash-checked end-to-end."""
    docs = load_table(spark, sf_dir, "documents")
    resized = resize_binary(with_binary_payload(docs))
    return (
        resized.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum("thumb_bytes").alias("total_thumb_bytes"),
            F.sum(
                (F.col("orig_bytes") > F.col("thumb_bytes")).cast("long")
            ).alias("n_shrunk"),
        )
        .orderBy("source")
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("source", StringType()),
        StructField("bucket", IntegerType()),
        StructField("n_in_bucket", LongType()),
    ]
)


def extract_byte_histogram(assets: DataFrame, n_buckets: int = 8) -> DataFrame:
    """Feature-extraction plumbing: binary in -> fixed-dimension vector
    out (emitted as (bucket, count) pairs). The stub feature is a real
    computation over the payload BYTES — an ``n_buckets``-bin byte-value
    histogram via numpy — standing in for an embedding model forward
    pass; batch shape (Arrow in, vectorized kernel, fan-out rows) is the
    production dataflow.
    """

    def _extract(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        width = 256 // n_buckets
        for pdf in batches:
            ids, srcs, buckets, counts = [], [], [], []
            for doc_id, source, payload in zip(
                pdf["doc_id"], pdf["source"], pdf["payload"]
            ):
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr // width, minlength=n_buckets)
                for b in range(n_buckets):
                    if hist[b]:
                        ids.append(doc_id)
                        srcs.append(source)
                        buckets.append(b)
                        counts.append(int(hist[b]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "source": pd.Series(srcs, dtype="object"),
                    "bucket": pd.Series(buckets, dtype="int32"),
                    "n_in_bucket": pd.Series(counts, dtype="int64"),
                }
            )

    n = assets.sparkSession.sparkContext.defaultParallelism
    return (
        assets.select("doc_id", "source", "payload")
        .repartition(n)
        .mapInPandas(_extract, FEATURE_SCHEMA)
    )


@declare(
    "m4_feature_extract",
    oracle="""
        WITH chars AS (
            SELECT source, unnest(string_split(text, '')) AS ch
            FROM documents)
        SELECT source,
               CAST(ascii(ch) // 32 AS INTEGER) AS bucket,
               count(*) AS n_in_bucket
        FROM chars
        GROUP BY source, bucket ORDER BY source, bucket
    """,
    tags=("ext", "multimodal", "pandas-udf"),
)
def m4_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction end-to-end: payload bytes -> 8-bin byte
    histogram per asset (the embedding-model stand-in) -> per-source
    feature totals. The oracle recomputes the histogram from character
    codepoints (== bytes for this ASCII fixture), hash-checking the
    numpy kernel and the fan-out."""
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_byte_histogram(with_binary_payload(docs))
    return (
        feats.groupBy("source", "bucket")
        .agg(F.sum("n_in_bucket").alias("n_in_bucket"))
        .orderBy("source", "bucket")
    )


# Ship this module's functions BY VALUE inside UDF closures: executors in a
# session whose Python workers don't have the repo on sys.path (the driver
# harness adds it driver-side only) would otherwise die with
# ModuleNotFoundError when a closure references module-level helpers like
# _parse_bmp. Every other UDF in the repo is closure-self-contained; the
# parser trio is shared with unit tests, so it lives at module level and
# gets this explicit registration instead.
try:  # pyspark bundles cloudpickle >= 2.0 (has register_pickle_by_value)
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # pragma: no cover — older cloudpickle: importable path only
    pass


@declare(
    "m7_audio_energy_windows",
    oracle="""
        WITH a AS (SELECT doc_id, text, length(text) AS n
                   FROM documents WHERE doc_id % 2 = 1),
        s AS (SELECT doc_id, text, n, n // 2 + n % 2 AS ns FROM a),
        w AS (SELECT doc_id, text, n, ns // 64 AS nw FROM s WHERE ns >= 64),
        samp AS (
            SELECT doc_id, (i // 64)::INT AS win,
                   CASE WHEN 2 * i + 2 <= n
                        THEN ascii(substr(text, (2 * i + 1)::INT, 1))
                             + 256 * ascii(substr(text, (2 * i + 2)::INT, 1))
                        ELSE ascii(substr(text, (2 * i + 1)::INT, 1))
                   END AS sample
            FROM w, unnest(range(nw * 64)) AS t(i))
        SELECT doc_id, win,
               round(sqrt(avg(sample::DOUBLE * sample)), 4) AS rms
        FROM samp GROUP BY doc_id, win ORDER BY doc_id, win
    """,
    tags=("ext", "multimodal", "audio", "pandas-udf"),
)
def m7_audio_energy_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction over REAL WAV containers: the odd-doc
    assets (16-bit mono PCM built by build_real_assets) are parsed past
    the 44-byte RIFF header, their samples windowed into 64-sample frames,
    and per-frame RMS energy computed — the framing step of any audio
    featurizer (VAD, loudness normalization, spectrogram prep).

    Arrow-batched mapInPandas; per-row work is bounded by payload size and
    partition-parallel (no shuffle until the final orderBy). The frame sum
    is an explicit sequential fold so the float association order matches
    the oracle, which independently reconstructs the PCM samples from the
    source text's character codes (the payload IS the utf-8 text, and the
    corpus is verified ASCII) — a mis-parsed header offset or sample width
    shifts every byte pair and breaks the hash."""
    docs = load_table(spark, sf_dir, "documents")
    audio = build_real_assets(docs).filter(F.col("doc_id") % 2 == 1)

    def _energy(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out_doc, out_win, out_rms = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples = np.frombuffer(bytes(payload)[44:], dtype="<i2")
                for wi in range(len(samples) // 64):
                    seg = samples[wi * 64 : (wi + 1) * 64]
                    total = 0.0
                    for v in seg:  # sequential fold == oracle's sum order
                        fv = float(v)
                        total += fv * fv
                    out_doc.append(doc_id)
                    out_win.append(wi)
                    out_rms.append(round((total / 64.0) ** 0.5, 4))
            yield pd.DataFrame(
                {"doc_id": out_doc, "win": out_win, "rms": out_rms}
            )

    return (
        audio.mapInPandas(_energy, "doc_id long, win int, rms double")
        .orderBy("doc_id", "win")
    )
