"""[EXT] Multimodal binary-column plumbing (SURVEY.md north-star).

Images/audio/video are opaque ``binary`` payload columns with a typed
metadata struct alongside. The Spark-side plumbing here — schema,
Arrow-batched mapInPandas decode, partition-preserving feature extraction —
is real and tested; the *codec* step is a clearly marked deterministic STUB
because no image/audio libraries exist in this container (swap
``_decode_stub`` for a PIL/libsndfile call in production; the dataflow,
batch shape, and schema do not change).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
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


def decode_binary_real(assets: DataFrame) -> DataFrame:
    """Real codec path — requires PIL/soundfile, absent in this container."""
    raise NotImplementedError(
        "image/audio codecs are not installed; use decode_binary (stub) — "
        "the Spark plumbing is identical"
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
               sum(n_bytes) AS total_bytes,
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
               sum(least(n, 4096)) AS total_thumb_bytes,
               sum(CASE WHEN n > 4096 THEN 1 ELSE 0 END) AS n_shrunk
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
