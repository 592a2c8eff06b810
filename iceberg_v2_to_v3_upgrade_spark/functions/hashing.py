"""Hash-family helpers for dedup / sketching (MinHash, SimHash, shingles).

Built on ``xxhash64`` (JVM-side, codegen-friendly). Hash values are
engine-specific, so operators built on these are declared rows-only (no
DuckDB oracle) — except where the hash is only a *pruning* step and the
final answer is verified with exact math.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def normalize_text(col: Column) -> Column:
    """Canonical text form for fingerprinting: lowercase, collapsed
    whitespace, trimmed. Matches the DuckDB oracle formulation
    ``lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))``."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column as array<string>.

    Pure higher-order functions: split -> transform over a 0..len-n index
    sequence -> slice+join. No UDF, no explode until the caller wants one.

    (Measured at sf0.1: pre-materializing the split() in its own
    projection to dodge per-index re-evaluation is NOT a win here — the
    transform/concat dominate, and the extra Project costs more than the
    repeated split saves, especially when the array feeds an explode.
    The actual lever for multi-use consumers is persisting the shingled
    table — see n2b_ngram_jaccard_pairs.)
    """
    words = F.split(col, " ")
    count = F.greatest(F.size(words) - (n - 1), F.lit(0))
    # count=0 (text under n words) must yield an EMPTY array: a plain
    # sequence(0, -1) runs BACKWARD ([0, -1]) and slice(start=0) then
    # throws at runtime — the short-doc crash class found in n89/n92
    return F.array_distinct(
        F.when(
            count > 0,
            F.transform(
                F.sequence(F.lit(0), count - 1),
                lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )


def minhash_signatures(
    df: DataFrame, id_col: str, shingles: Column, num_hashes: int = 64
) -> DataFrame:
    """MinHash signatures: for seed s in 0..num_hashes-1, min over shingles
    of xxhash64(shingle, s). Returns (id_col, sig array<bigint>).

    Formulated as explode -> grouped min so each shingle is hashed exactly
    once per seed (a column-expression formulation nests the shingle
    expression inside every one of the 64 transforms and Catalyst
    re-evaluates it 64x — measured 15x slower). The grouped min is
    map-side-partial, so the shuffle carries one 64-long row per document.
    """
    exploded = df.select(F.col(id_col), F.explode(shingles).alias("_sh"))
    mins = exploded.groupBy(id_col).agg(
        *[
            F.min(F.xxhash64("_sh", F.lit(seed))).alias(f"_h{seed}")
            for seed in range(num_hashes)
        ]
    )
    return mins.select(
        F.col(id_col),
        F.array(*[F.col(f"_h{s}") for s in range(num_hashes)]).alias("sig"),
    )


def lsh_bands(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Banded LSH keys: hash each band of the signature to one bigint.
    Returns array<struct<band:int, key:bigint>> ready to explode and
    bucket-join on (band, key)."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[
                        F.element_at(signature, b * rows_per_band + r + 1)
                        for r in range(rows_per_band)
                    ]
                ).alias("key"),
            )
            for b in range(bands)
        ]
    )


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document.

    Explodes tokens once, computes xxhash64 per token, then for each bit
    position sums +1/-1 and takes the sign — a single grouped aggregate with
    64 sum expressions (one shuffle keyed by document id).
    """
    tokens = df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    bit_sums = tokens.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"b{b}")
            for b in range(64)
        ]
    )
    sim = F.lit(0).cast("bigint")
    for b in range(64):
        sim = sim + F.when(
            F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("bigint"), b)
        ).otherwise(F.lit(0).cast("bigint"))
    return bit_sums.select(F.col(id_col), sim.alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures via bit_count(xor)."""
    return F.bit_count(a.bitwiseXOR(b))
