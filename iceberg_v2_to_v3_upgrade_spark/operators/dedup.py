"""[EXT] Deduplication operators over the ``documents`` table (SURVEY.md §2.N1/N2).

Five dedup families, in increasing fuzziness:
- exact (group-by on the raw value),
- content-fingerprint (md5 over normalized text — cross-engine stable),
- exact n-gram Jaccard pairs (shared-shingle pruned, exact math → oracle),
- MinHash + banded LSH (the 100 TB scale path; hash-based → rows-only),
- SimHash hamming pairs (rows-only).

Scale posture: the only all-pairs-shaped step anywhere is *after* pruning —
candidates come from equi-joins on shingle/band/bucket keys, so the shuffle
is keyed and bounded by true collision counts, never |docs|².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window
from pyspark.storagelevel import StorageLevel

from iceberg_v2_to_v3_upgrade_spark.functions.hashing import (
    lsh_bands,
    minhash_signatures,
    normalize_text,
    simhash64,
    word_shingles,
)
from iceberg_v2_to_v3_upgrade_spark.io import load_table
from iceberg_v2_to_v3_upgrade_spark.registry import declare


@declare(
    "n1_exact_dedup",
    oracle="""
        SELECT lang, count(*) AS n_docs, count(DISTINCT text) AS n_unique,
               count(*) - count(DISTINCT text) AS n_dups
        FROM documents GROUP BY lang ORDER BY lang
    """,
    tags=("ext", "dedup"),
)
def n1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup accounting: duplicates by full-text equality, per lang.

    The remove-step is ``dropDuplicates(['text'])``; declared as the
    equivalent deterministic aggregate so the oracle can hash-match it.
    """
    return (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("text").alias("n_unique"),
            (F.count(F.lit(1)) - F.countDistinct("text")).alias("n_dups"),
        )
        .orderBy("lang")
    )


@declare(
    "n2_fingerprint_dedup",
    oracle="""
        WITH fp AS (
            SELECT doc_id,
                   md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
            FROM documents)
        SELECT fingerprint, min(doc_id) AS keeper_id, count(*) AS n_copies
        FROM fp GROUP BY fingerprint
        HAVING count(*) > 1
        ORDER BY keeper_id
    """,
    tags=("ext", "dedup", "fingerprint"),
)
def n2_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-fingerprint dedup: md5 over whitespace/case-normalized text.

    md5 is identical across Spark and DuckDB, so the fingerprints themselves
    are hash-matched — this is the document-fingerprinting operator AND its
    cross-engine proof in one. At scale: one narrow projection + one grouped
    count on a high-entropy key (no skew by construction).
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id", F.md5(normalize_text(F.col("text"))).alias("fingerprint")
        )
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keeper_id"), F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") > 1)
        .orderBy("keeper_id")
    )


_NGRAM_JACCARD_ORACLE = """
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
        SELECT DISTINCT doc_id,
               array_to_string(list_slice(w, i + 1, i + 3), ' ') AS shingle
        FROM d, unnest(range(greatest(len(w) - 2, 0))) AS t(i)),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT p.doc_a, p.doc_b,
           round(p.common * 1.0 / (x.n + y.n - p.common), 3) AS jaccard
    FROM pairs p
    JOIN sz x ON x.doc_id = p.doc_a
    JOIN sz y ON y.doc_id = p.doc_b
    WHERE p.common * 1.0 / (x.n + y.n - p.common) >= 0.8
    ORDER BY doc_a, doc_b
"""


@declare("n2b_ngram_jaccard_pairs", oracle=_NGRAM_JACCARD_ORACLE, tags=("ext", "dedup", "jaccard"))
def n2b_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-duplicate pairs by word-3-gram Jaccard >= 0.8, via
    prefix filtering (SSJoin/PPJoin family).

    Theorem: J(A,B) >= tau implies A and B share a token within their
    first |X| - ceil(tau*|X|) + 1 tokens under any fixed global token
    order. Ordering rarest-first makes those prefix buckets tiny, so the
    candidate equi-join touches ~(1-tau) of the shingle volume with
    near-empty buckets — exactness preserved (the oracle is the naive
    all-shared-shingles formulation), candidates verified with one
    array_intersect over the full shingle sets.

    Adds the length filter too: |B| >= tau*|A| (else J < tau regardless).

    The shingled table feeds four plan branches (df-counts, prefix, and
    both verification sides); Spark shares no subplans within a query and
    exchange reuse doesn't fire here, so without a persist the shingling
    executes 6x (measured). Persisting it is the idiomatic fix (at
    cluster scale: MEMORY_AND_DISK recomputes on executor loss) and
    halves the query's runtime.
    """
    # _exact_jaccard_pairs widens the narrow fixture scan itself
    # (gated) — repartitioning here too stacked a second exchange
    return _exact_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), tau=0.8
    )


#: Persisted intermediates from the PREVIOUS _exact_jaccard_pairs call.
#: The returned frame is lazy, so this function cannot unpersist its own
#: caches (the caller materializes later); instead each new invocation
#: evicts the previous one's, bounding accumulation to a single call's
#: worth across min-of-2 bench passes and long soak sessions (round-9
#: ADVICE — the same session-leak class as the r9 file-sink fix).
_JACCARD_CACHES: list[DataFrame] = []

#: Broadcast variables from the PREVIOUS broadcast-verify call — same
#: eviction convention as _JACCARD_CACHES (the returned frame is lazy, so
#: a call cannot reclaim its own broadcast; the next call evicts it).
#: Bounds executor/driver block accumulation across min-of-2 bench passes
#: and soak sessions (round-10 VERDICT item 6). unpersist(False), NOT
#: destroy(): an in-session A/B measured destroy() stalling the next
#: query by 2-4 s (blocking cleanup churn), while async unpersist is
#: free and still drops the blocks; a destroyed broadcast also could
#: never be lazily re-read if a stale frame were re-executed, whereas
#: an unpersisted one is transparently re-broadcast.
_JACCARD_BROADCASTS: list = []


def _ensure_wide(df: DataFrame) -> DataFrame:
    """Round-robin rebalance ONLY when the scan is narrower than the
    session parallelism. The single-row-group fixture files scan as ONE
    partition (``minPartitionNum`` cannot split one row group), which
    single-threads every downstream map stage — that narrow case, and
    only that case, warrants the exchange. An unconditional
    ``repartition()`` would insert a full shuffle of the corpus even when
    the scan is already wide (at 100 TB: always) — round-10's real
    regression on n2b/n2c/n2d and a scale bug (VERDICT r10 item 2).
    ``df.rdd.getNumPartitions()`` costs one physical planning pass, no
    job."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par)


def _tau_fraction(tau: float) -> tuple[int, int]:
    """A rational num/den <= tau for the integer positional filter.

    limit_denominator rounds to the NEAREST rational and can land up to
    ~5e-7 ABOVE the float tau (e.g. tau=2/3 as a float sits just below
    the rational 2/3); an above-tau rational would make the integer
    bound stricter than the final float-Jaccard filter and could drop
    true pairs. Overshoots step down to an exact millionth-floor — a
    slightly-smaller rational only loosens the prefilter, so
    completeness is preserved either way (round-9 ADVICE, low)."""
    from fractions import Fraction

    exact = Fraction(tau)
    frac = exact.limit_denominator(1_000)
    if frac > exact:
        frac = Fraction(int(exact * 1_000_000), 1_000_000)
    return frac.numerator, frac.denominator


def _exact_jaccard_pairs(docs: DataFrame, tau: float = 0.8) -> DataFrame:
    """Prefix-filtered exact Jaccard pairs over an arbitrary docs frame
    (shared by n2b, n54, n92 and the n2c/n2d in-query recall audits).

    Candidate generation stacks three EXACT filters (each with a
    no-false-negative argument, so the verified output is identical to
    the naive all-shared-shingle join — the property the hash gate
    depends on):

    - prefix filter: a pair with Jaccard >= tau must share one of each
      doc's (n - ceil(tau*n) + 1) rarest shingles (SSJoin/prefix-filter
      completeness, public literature);
    - length filter: tau*|A| <= |B| <= |A|/tau;
    - positional filter (PPJoin, round-9): with shingles globally
      ordered by (df, shingle), a shared shingle at positions (ra, rb)
      bounds the overlap by o <= 1 + min(na-ra, nb-rb); Jaccard >= tau
      needs o*(den+num) >= num*(na+nb) (tau = num/den, integer
      arithmetic — no float edge). Filtering MATCH ROWS by the bound
      is exact: a true pair's EARLIEST shared shingle (which the prefix
      filter provably contains) has no shared shingle before it in
      either doc, so the bound holds there and the pair survives.
      Measured round-9 (distinct-text corpus): tau=0.8 candidates
      43.5k -> 12.8k at sf0.1 / 4.31M -> 1.24M at x10 (true pairs
      241 / 246 840); tau=0.5 309k -> 125k / 30.8M -> 12.0M. Pair
      counts verified unchanged at both taus and both scales.
    """
    num, den = _tau_fraction(tau)
    while _JACCARD_CACHES:
        _JACCARD_CACHES.pop().unpersist()
    while _JACCARD_BROADCASTS:
        _JACCARD_BROADCASTS.pop().unpersist(False)
    # widen the narrow fixture scan (gated — see _ensure_wide) so the
    # shingling and the persisted frame's downstream map passes use
    # every core; already-wide inputs pass through with no exchange
    shingled = (
        _ensure_wide(docs)
        .select(
            "doc_id", word_shingles(F.col("text"), 3).alias("shingles")
        )
        .withColumn("n", F.size("shingles"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sh = shingled.select(
        "doc_id", "n", F.explode("shingles").alias("shingle")
    )
    # persisted: the injectivity guard below collects over this frame
    # EAGERLY and the prefix join consumes it again inside the real
    # query action — without the cache that is two corpus-shaped token
    # aggregations where one suffices (round-9 second-review finding)
    df_counts = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _JACCARD_CACHES.extend([shingled, df_counts])
    rarity = Window.partitionBy("doc_id").orderBy("df", "shingle")
    prefix = (
        sh.join(df_counts, "shingle")
        .withColumn("rank", F.row_number().over(rarity))
        .filter(F.col("rank") <= F.col("n") - F.ceil(F.lit(tau) * F.col("n")) + 1)
        .select("doc_id", "n", "shingle", "rank", "df")
    )
    a = prefix.alias("a")
    b = prefix.alias("b")
    ubound = F.lit(1) + F.least(
        F.col("a.n") - F.col("a.rank"), F.col("b.n") - F.col("b.rank")
    )
    # Row-level positional cut in the join prunes shuffle volume; the
    # per-pair aggregate below then applies the bound at the EARLIEST
    # shared shingle (min global (df, shingle) order) — the tightest
    # single-token bound that is still exact (the true pair's earliest
    # shared token always passes, and min_by selects exactly it).
    candidates = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # length filter: tau*|A| <= |B| <= |A|/tau
            & (F.col("b.n") >= F.lit(tau) * F.col("a.n"))
            & (F.col("a.n") >= F.lit(tau) * F.col("b.n"))
            # positional filter (row-level; see docstring)
            & (
                ubound * F.lit(den + num)
                >= F.lit(num) * (F.col("a.n") + F.col("b.n"))
            ),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ubound.alias("ub"),
            (F.col("a.n") + F.col("b.n")).alias("nsum"),
            F.struct(
                F.col("a.df").alias("df"),
                F.col("a.shingle").alias("shingle"),
            ).alias("ord"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.min_by("ub", "ord").alias("ub0"),
            F.first("nsum").alias("nsum"),
        )
        .filter(
            F.col("ub0") * F.lit(den + num) >= F.lit(num) * F.col("nsum")
        )
        .select("doc_a", "doc_b")
    )
    # Verification ships 8-byte hashed shingles instead of strings —
    # the candidate-pair join attaches BOTH docs' full sets to every
    # candidate row, and at x10 that shuffle (12M pairs x 2 x ~200
    # ~25-byte shingles) dominated n92's wall clock. Exactness is
    # GUARDED, not assumed: xxhash64 must be injective on this corpus's
    # vocabulary, asserted with one vocab-sized aggregate (collision
    # probability ~|V|^2/2^64; a hit raises instead of silently merging
    # two shingles and corrupting a Jaccard).
    vocab = df_counts.agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.countDistinct(F.xxhash64("shingle")).alias("n_hashes"),
        F.sum("df").alias("n_entries"),
    ).collect()[0]
    if vocab["n_shingles"] != vocab["n_hashes"]:
        raise ValueError(
            "xxhash64 collision in the shingle vocabulary "
            f"({vocab['n_shingles']} shingles, {vocab['n_hashes']} "
            "hashes); exact verification cannot use hashed sets here"
        )
    hashed = shingled.select(
        "doc_id",
        "n",
        F.transform("shingles", lambda s: F.xxhash64(s)).alias("hs"),
    )
    # Round-10: when the hashed corpus fits the n2e-style broadcast
    # guard (8 bytes x total (doc, shingle) entries), verify against a
    # BROADCAST dict instead of attaching both sets to every candidate
    # row — the set-attach join shuffles ~2 x |set| x 8 B per pair
    # (~400 MB at tau=0.5, sf0.1) where the broadcast ships the corpus
    # once per executor. |A ∩ B| is an exact integer either way and the
    # division is the same IEEE op; rounding stays JVM-side F.round.
    if int(vocab["n_entries"] or 0) * 8 <= _NEARDUP_BROADCAST_MAX_ROWS * 64:
        sets = {
            int(r["doc_id"]): (frozenset(r["hs"]), int(r["n"]))
            for r in hashed.collect()
        }
        bc = docs.sparkSession.sparkContext.broadcast(sets)
        _JACCARD_BROADCASTS.append(bc)

        def verify(batches):
            import pandas as pd

            m = bc.value
            for pdf in batches:
                if not len(pdf):
                    continue
                jac_raw = []
                for da, db in zip(pdf["doc_a"], pdf["doc_b"]):
                    sa, na = m[int(da)]
                    sb, nb = m[int(db)]
                    c = len(sa & sb)
                    jac_raw.append(c / (na + nb - c))
                out = pd.DataFrame(
                    {
                        "doc_a": pdf["doc_a"],
                        "doc_b": pdf["doc_b"],
                        "jaccard_raw": jac_raw,
                    }
                )
                yield out

        return (
            candidates.mapInPandas(
                verify, "doc_a long, doc_b long, jaccard_raw double"
            )
            .filter(F.col("jaccard_raw") >= tau)
            .select(
                "doc_a", "doc_b", F.round("jaccard_raw", 3).alias("jaccard")
            )
            .orderBy("doc_a", "doc_b")
        )
    sx = hashed.select(
        F.col("doc_id").alias("doc_a"),
        F.col("hs").alias("set_a"),
        F.col("n").alias("na"),
    )
    sy = hashed.select(
        F.col("doc_id").alias("doc_b"),
        F.col("hs").alias("set_b"),
        F.col("n").alias("nb"),
    )
    common = F.size(F.array_intersect("set_a", "set_b"))
    jac = common / (F.col("na") + F.col("nb") - common)
    return (
        candidates.join(sx, "doc_a")
        .join(sy, "doc_b")
        .withColumn("jaccard_raw", jac)
        .filter(F.col("jaccard_raw") >= tau)
        .select("doc_a", "doc_b", F.round("jaccard_raw", 3).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


#: Memoized recall audits (one per (kind, sf_dir) per process) so repeated
#: invocations — bench steady-state passes, repeated driver calls — don't
#: re-pay the exact-pair computation.
_NEARDUP_AUDITS: dict[tuple[str, str], float] = {}
_AUDIT_MAX_DOCS = 20_000


def _audit_neardup_recall(
    spark: SparkSession,
    sf_dir: str,
    got: DataFrame,
    kind: str,
    min_recall: float,
) -> None:
    """In-query recall self-check for the hash-based (rows-only) near-dup
    operators: the emitted pair set must recall >= ``min_recall`` of the
    exact Jaccard>=0.8 pairs (n2b's formulation) on the same corpus —
    hash-sampled down above _AUDIT_MAX_DOCS so the audit stays bounded at
    any scale. Raises if recall degrades, so the driver's rows-only row
    still proves the operator works (VERDICT.md round-1 item 6).
    """
    key = (kind, sf_dir)
    if key in _NEARDUP_AUDITS:
        return
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    if n > _AUDIT_MAX_DOCS:
        stride = n // _AUDIT_MAX_DOCS + 1
        docs = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(stride)) == 0)
        sampled_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    else:
        sampled_ids = None  # full corpus
    exact = {
        (r.doc_a, r.doc_b)
        for r in _exact_jaccard_pairs(docs).collect()
    }
    if not exact:
        _NEARDUP_AUDITS[key] = 1.0
        return
    got_pairs = {
        (r.doc_a, r.doc_b)
        for r in got.select("doc_a", "doc_b").collect()
        if sampled_ids is None
        or (r.doc_a in sampled_ids and r.doc_b in sampled_ids)
    }
    recall = len(exact & got_pairs) / len(exact)
    if recall < min_recall:
        raise AssertionError(
            f"{kind} recall {recall:.2f} < {min_recall} vs exact pairs at {sf_dir}"
        )
    _NEARDUP_AUDITS[key] = recall


@declare("n2c_minhash_lsh_neardup", oracle=None, tags=("ext", "dedup", "minhash", "lsh"))
def n2c_minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH near-dup pairs — the scale path.

    shingle -> 64-hash MinHash signature -> 16 bands x 4 rows -> explode
    band keys -> self-join on (band, key) -> dedup candidate pairs ->
    verify with exact signature agreement >= 0.8 (estimated Jaccard).

    Hash-based, so declared rows-only; correctness is cross-audited against
    n2b in tests (every n2b pair must be recalled here at these parameters).
    At scale the band join is the only shuffle and its key space is
    |docs| * bands — linear, never quadratic.
    """
    docs = _ensure_wide(load_table(spark, sf_dir, "documents"))
    sig = minhash_signatures(
        docs, "doc_id", word_shingles(F.col("text"), 3), num_hashes=64
    )
    banded = sig.select(
        "doc_id", "sig", F.explode(lsh_bands(F.col("sig"), 16, 4)).alias("bk")
    ).select("doc_id", "sig", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est_jaccard = (
        F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                lambda eq: eq,
            )
        )
        / F.lit(64.0)
    )
    result = (
        candidates.withColumn("est_jaccard", F.round(est_jaccard, 3))
        .filter(F.col("est_jaccard") >= 0.8)
        .select("doc_a", "doc_b", "est_jaccard")
        .orderBy("doc_a", "doc_b")
    )
    _audit_neardup_recall(spark, sf_dir, result, "minhash_lsh", min_recall=0.9)
    return result


_COSINE_NEARDUP_ORACLE = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(b.v, b.v))), 4) AS cos_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v)
          / (sqrt(list_dot_product(a.v, a.v))
             * sqrt(list_dot_product(b.v, b.v))) >= 0.45
    ORDER BY vec_a, vec_b
"""


#: Corpus sizes at or below this use broadcast-GEMM (one numpy matrix per
#: executor, ~500k x 64 dims x 8B = 256 MB); above it, the block-pair grid
#: runs instead — no driver collect on any path for a large corpus.
_NEARDUP_BROADCAST_MAX_ROWS = 500_000
_NEARDUP_THRESHOLD = 0.45
#: connected-components driver fast-path guard (see _star_components)
_CC_DRIVER_MAX_EDGES = 500_000


@declare(
    "n2e_embedding_cosine_neardup",
    oracle=_COSINE_NEARDUP_ORACLE,
    tags=("ext", "dedup", "embeddings"),
)
def n2e_embedding_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine >= 0.45), exact.

    Pairwise similarity is dense linear algebra, which row-at-a-time SQL
    expressions cannot express efficiently (a pure-DataFrame formulation —
    broadcast nested-loop join + per-pair dot — measured ~4us/pair: the
    wide expression falls out of whole-stage codegen). Two exact physical
    strategies, chosen by corpus size (both produce identical pairs, so the
    one oracle covers either path):

    - small corpus: broadcast-GEMM — corpus as one numpy matrix on every
      executor, row-blocks streamed through Arrow mapInPandas, one BLAS
      matmul per block, zero shuffle;
    - large corpus: block-pair grid — vectors hashed into B blocks, each
      vector replicated to the B grid cells it participates in, per-cell
      GEMM via applyInPandas. No broadcast, no driver collect; memory per
      task is 2|corpus|/B rows. The O(n^2) FLOPs are inherent to an exact
      threshold scan — the grid distributes them evenly.
    """
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    if emb.count() <= _NEARDUP_BROADCAST_MAX_ROWS:
        return _cosine_neardup_broadcast_gemm(spark, emb)
    return _cosine_neardup_block_grid(spark, emb)


def _cosine_neardup_broadcast_gemm(
    spark: SparkSession, emb: DataFrame, threshold: float = _NEARDUP_THRESHOLD
) -> DataFrame:
    """Exact pairs via broadcast corpus x streamed row-blocks (small corpus)."""
    from collections.abc import Iterator

    import numpy as np

    rows = emb.collect()  # broadcast side only (guarded by the row-count
    # check in n2e_embedding_cosine_neardup), not an unbounded data-path collect
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    while _JACCARD_BROADCASTS:  # evict the previous call's broadcasts
        _JACCARD_BROADCASTS.pop().unpersist(False)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    _JACCARD_BROADCASTS.extend([b_ids, b_mat])

    def block_gemm(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            a_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            a = np.array(list(pdf["embedding"]), dtype=np.float64)
            a /= np.linalg.norm(a, axis=1, keepdims=True)
            sims = a @ b_mat.value.T  # BLAS dgemm: the entire pairwise step
            ai, bj = np.nonzero(
                (sims >= threshold) & (a_ids[:, None] < b_ids.value[None, :])
            )
            yield pd.DataFrame(
                {
                    "vec_a": a_ids[ai],
                    "vec_b": b_ids.value[bj],
                    "cos_sim": np.round(sims[ai, bj], 4),
                }
            )

    return (
        _ensure_wide(emb)
        .mapInPandas(block_gemm, "vec_a long, vec_b long, cos_sim double")
        .orderBy("vec_a", "vec_b")
    )


def _cosine_neardup_block_grid(
    spark: SparkSession,
    emb: DataFrame,
    n_blocks: int = 32,
    threshold: float = _NEARDUP_THRESHOLD,
) -> DataFrame:
    """Exact pairs via a B x B block-pair grid (large corpus; no broadcast).

    Each vector lands in block ``xxhash64(vec_id) % B`` and is shipped to
    every grid cell (i, j), i <= j, that its block participates in — B
    copies per vector, so shuffle volume is B * |corpus| while per-task
    memory is 2|corpus|/B rows. Cell (i, j) GEMMs block i against block j
    and emits each qualifying pair exactly once (same-block pairs only in
    the diagonal cell; cross-block pairs only in their unique off-diagonal
    cell), so no dedup pass is needed afterwards.
    """

    blocked = emb.withColumn(
        "blk", F.pmod(F.xxhash64("vec_id"), F.lit(n_blocks)).cast("int")
    )
    # grid cell id for (i, j), i <= j: i * B + j
    cells = F.array(
        *[
            F.least(F.col("blk"), F.lit(j)) * n_blocks
            + F.greatest(F.col("blk"), F.lit(j))
            for j in range(n_blocks)
        ]
    )
    # cells are distinct per vector by construction (for block b, j sweeps
    # out B distinct (min,max) pairs), so no dedup shuffle is needed
    exploded = blocked.select(
        "vec_id", "embedding", "blk", F.explode(cells).alias("cell")
    )

    def cell_gemm(key: tuple, pdf) -> object:
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {
                "vec_a": pd.Series(dtype="int64"),
                "vec_b": pd.Series(dtype="int64"),
                "cos_sim": pd.Series(dtype="float64"),
            }
        )
        if not len(pdf):
            return empty
        cell = int(key[0])
        i, j = divmod(cell, n_blocks)
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        blks = pdf["blk"].to_numpy(dtype=np.int64)
        mat = np.array(list(pdf["embedding"]), dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        left = blks == i
        right = blks == j
        if not left.any() or not right.any():
            return empty
        l_ids, r_ids = ids[left], ids[right]
        sims = mat[left] @ mat[right].T
        mask = sims >= threshold
        if i == j:
            # same-block: each unordered pair appears twice; keep one
            mask &= l_ids[:, None] < r_ids[None, :]
        li, rj = np.nonzero(mask)
        a, b = l_ids[li], r_ids[rj]
        return pd.DataFrame(
            {
                "vec_a": np.minimum(a, b),
                "vec_b": np.maximum(a, b),
                "cos_sim": np.round(sims[li, rj], 4),
            }
        )

    return (
        exploded.groupBy("cell")
        .applyInPandas(cell_gemm, "vec_a long, vec_b long, cos_sim double")
        .orderBy("vec_a", "vec_b")
    )


@declare("n2d_simhash_neardup", oracle=None, tags=("ext", "dedup", "simhash"))
def n2d_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 64-bit signatures, hamming distance <= 6.

    Candidates via 4x16-bit band equality (pigeonhole: distance <= 6 pairs
    are guaranteed to collide on some band only for distance <= 3; wider
    recall comes from the 4 chances) then exact bit_count verify.
    Rows-only (hash-based).
    """
    docs = load_table(spark, sf_dir, "documents")
    sig = simhash64(docs, "doc_id", "text")
    banded = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("simhash"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.key")
    a = banded.alias("a")
    b = banded.alias("b")
    result = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= 6)
        .orderBy("doc_a", "doc_b")
    )
    _audit_neardup_recall(spark, sf_dir, result, "simhash", min_recall=0.85)
    return result


_CLUSTER_ORACLE = """
    WITH RECURSIVE d AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
        SELECT DISTINCT doc_id,
               array_to_string(list_slice(w, i + 1, i + 3), ' ') AS shingle
        FROM d, unnest(range(greatest(len(w) - 2, 0))) AS t(i)),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    cand AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
    np AS (
        SELECT p.doc_a, p.doc_b
        FROM cand p
        JOIN sz x ON x.doc_id = p.doc_a
        JOIN sz y ON y.doc_id = p.doc_b
        WHERE p.common * 1.0 / (x.n + y.n - p.common) >= 0.8),
    edges AS (
        SELECT doc_a AS s, doc_b AS t FROM np
        UNION ALL SELECT doc_b, doc_a FROM np),
    reach(doc, r) AS (
        SELECT DISTINCT s AS doc, s AS r FROM edges
        UNION
        SELECT e.s, reach.r FROM edges e JOIN reach ON reach.doc = e.t)
    SELECT doc AS doc_id, min(r) AS cluster_id
    FROM reach GROUP BY doc ORDER BY doc_id
"""


@declare(
    "n2f_dedup_clusters",
    oracle=_CLUSTER_ORACLE,
    tags=("ext", "dedup", "clustering", "iterative"),
)
def n2f_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the near-dup pair graph — the step that
    turns pairwise matches into dedup DECISIONS (cluster id = min doc_id
    of the component; everything else in the cluster is droppable).

    Alternating large-star / small-star contraction (round 10 — was
    diameter-bounded min-label propagation): O(log² n) rounds on ANY
    component shape, so an adversarial million-link chain costs ~a
    dozen keyed shuffles instead of a million. Convergence is a
    (count, hash-sum) checksum of the canonical edge set — no
    driver-side edge data. The DuckDB recursive-CTE oracle happily
    materializes the transitive closure at test scale — exactly the
    formulation that cannot scale, which is why the engine side
    contracts instead.
    """
    pairs = n2b_ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    return _star_components(pairs).select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    ).orderBy("doc_id")


def _star_components(
    pairs: DataFrame, stats: dict | None = None
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) over an undirected pair list (cols = (a, b) in any
    names). Returns (id, label) with label = the component's min id.

    Round complexity is O(log² n) on ANY graph — the bound min-label
    propagation lacks (its rounds = component diameter, so one
    adversarial 10⁶-link chain in a 100 TB pair graph means 10⁶
    shuffles; here it is ~a dozen alternations). Round-10 verdict
    item 6.

    - large-star(u): m = min(Γ(u) ∪ {u}); every neighbor v > u re-hangs
      onto m. Shrinks tall trees geometrically.
    - small-star(hi): over edges oriented (hi > lo), m = min(lo);
      every lo plus hi itself hangs onto m. Flattens local stars.
    - Convergence: the canonical (lo, hi) edge set is stable. Checked
      with a (count, bit_xor(xxhash64)) checksum — one aggregate scan
      per round, no join and no driver-side edge data; a false positive
      needs a 64-bit hash-xor collision between consecutive edge sets.

    At convergence each component is a star centered at its min node,
    so labels read directly off the edge list; nodes that never appear
    as a satellite are their own root (singleton or center).
    """
    a, b = pairs.columns[:2]
    # one persisted evaluation of the (possibly expensive) upstream
    # pair computation feeds BOTH derived frames — without this, nodes
    # and edges would each re-run e.g. n2b's prefix-filtered Jaccard
    # join (review finding)
    pairs = pairs.select(
        F.col(a).alias("x"), F.col(b).alias("y")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # Size-gated driver fast path (round-10; the n2e broadcast-GEMM
    # pattern): a near-dup pair graph is OUTPUT-bounded, and when the
    # canonical edge set fits the same 500k-row guard n2e uses, a
    # driver union-find replaces ~6-12 contraction rounds x several
    # keyed shuffles each with one collect + one createDataFrame.
    # Labels are identical (min id per component, exact integer math).
    # ``stats`` is the instrumentation hook and forces the distributed
    # path (the round-bound tests measure contraction rounds).
    if stats is None:
        # canonical edges WITH self-loops kept (lo == hi rows): the size
        # guard then bounds the whole collect — the previous separate
        # self-loop collect ran outside the guard (round-10 ADVICE) and
        # cost an extra job
        small = (
            pairs.select(
                F.least("x", "y").alias("lo"),
                F.greatest("x", "y").alias("hi"),
            )
            .distinct()
        )
        edge_rows = small.limit(_CC_DRIVER_MAX_EDGES + 1).collect()
        if len(edge_rows) <= _CC_DRIVER_MAX_EDGES:
            parent: dict[int, int] = {}

            def find(u: int) -> int:
                r = u
                while parent.get(r, r) != r:
                    r = parent[r]
                while parent.get(u, u) != u:  # path compression
                    parent[u], u = r, parent[u]
                return r

            for e in edge_rows:
                if e["lo"] == e["hi"]:
                    continue  # self-loop: node only
                ra, rb = find(e["lo"]), find(e["hi"])
                if ra != rb:  # min id becomes the root
                    if rb < ra:
                        ra, rb = rb, ra
                    parent[rb] = ra
            node_rows = sorted(
                {e["lo"] for e in edge_rows}
                | {e["hi"] for e in edge_rows}
            )
            out = pairs.sparkSession.createDataFrame(
                [(n, find(n)) for n in node_rows], "id long, label long"
            )
            pairs.unpersist()
            return out
    nodes = (
        pairs.select(F.col("x").alias("id"))
        .union(pairs.select(F.col("y").alias("id")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    edges = (
        pairs.filter(F.col("x") != F.col("y"))
        .select(
            F.least("x", "y").alias("lo"), F.greatest("x", "y").alias("hi")
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    def _checksum(e: DataFrame) -> tuple:
        # bit_xor is order-independent and cannot overflow (vs sum,
        # which trips ANSI arithmetic on 64-bit hash sums); edge rows
        # are distinct, so xor cancellation cannot occur
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(lo, hi))").alias("h"),
        ).first()
        return (row["n"], row["h"])

    first_edges = edges
    ls = None
    try:
        prev = _checksum(edges)
        rounds = 0
        if prev[0] > 0:
            for _ in range(64):  # >> the O(log² n) bound at any real scale
                rounds += 1
                sym = edges.union(
                    edges.select(
                        F.col("hi").alias("lo"), F.col("lo").alias("hi")
                    )
                ).toDF("u", "v")
                lmin = (
                    sym.groupBy("u")
                    .agg(F.min("v").alias("mn"))
                    .select("u", F.least("mn", F.col("u")).alias("m"))
                )
                # m ≤ u < v, so (m, v) is already canonical and loop-free
                ls = (
                    sym.join(lmin, "u")
                    .filter(F.col("v") > F.col("u"))
                    .select(F.col("m").alias("lo"), F.col("v").alias("hi"))
                    .distinct()
                    .persist(StorageLevel.MEMORY_AND_DISK)
                )
                smin = ls.groupBy("hi").agg(F.min("lo").alias("m"))
                # localCheckpoint (not bare persist): the symmetric-union
                # + two joins would otherwise double the logical plan
                # every round — exponential analysis cost by round ~15.
                # Truncating lineage per round keeps the plan O(1) and
                # the data distributed; this is the standard
                # iterative-graph pattern (GraphFrames does the same).
                new_edges = (
                    ls.join(smin, "hi")
                    .select("m", F.col("lo").alias("v"))
                    .filter(F.col("v") != F.col("m"))
                    .union(smin.select("m", F.col("hi").alias("v")))
                    .select(
                        F.least("m", "v").alias("lo"),
                        F.greatest("m", "v").alias("hi"),
                    )
                    .distinct()
                    .localCheckpoint(eager=True)
                )
                cur = _checksum(new_edges)
                ls.unpersist()
                edges = new_edges
                if cur == prev:
                    break
                prev = cur
            else:
                raise RuntimeError(
                    "star contraction did not converge in 64 rounds"
                )
        if stats is not None:
            stats["rounds"] = rounds
        sat = edges.groupBy(F.col("hi").alias("id")).agg(
            F.min("lo").alias("label")
        )
        out = nodes.join(sat, "id", "left").select(
            "id", F.coalesce("label", F.col("id")).alias("label")
        )
        # truncate lineage (stays distributed — no driver collect) so
        # the CacheManager entries below can be dropped before return
        # without forcing a recompute (the round-9 advice leak class)
        out = out.localCheckpoint(eager=True)
    finally:
        # explicit unpersist covers the CacheManager-backed frames
        # (pairs / nodes / the round-1 edge set / any ls left by a
        # failure); per-round localCheckpoint snapshots live as
        # RDD-level blocks OUTSIDE the CacheManager — those are
        # reclaimed by the ContextCleaner once this frame's references
        # drop, which is why each round re-binds `edges` instead of
        # keeping a history
        pairs.unpersist()
        nodes.unpersist()
        first_edges.unpersist()
        if ls is not None:
            ls.unpersist()
    return out


# --- md5-based SimHash: the engine-portable (oracle-checked) variant ------
# n2d's xxhash64 is JVM-only, so it can only be rows-only checked. This
# variant derives the token hash from md5 (identical hex in every engine)
# as two 32-bit halves, so the ENTIRE pipeline — signature, banding,
# hamming verify — is reproducible in DuckDB and the pairs hash-match.

_SH_SUMS = ", ".join(
    f"sum(CASE WHEN (hi >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS hb{b}, "
    f"sum(CASE WHEN (lo >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS lb{b}"
    for b in range(32)
)
_SH_SIG_HI = " + ".join(
    f"CASE WHEN hb{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(32)
)
_SH_SIG_LO = " + ".join(
    f"CASE WHEN lb{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(32)
)
_SH_HAMMING = (
    "bit_count(xor(a.sig_hi, b.sig_hi)) + bit_count(xor(a.sig_lo, b.sig_lo))"
)


@declare(
    "n2g_simhash_md5_neardup",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id,
                   unnest(string_split(
                       lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))),
                       ' ')) AS tok
            FROM documents),
        h AS (
            SELECT doc_id,
                   ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hi,
                   ('0x' || substr(md5(tok), 9, 8))::BIGINT AS lo
            FROM tok),
        s AS (SELECT doc_id, {_SH_SUMS} FROM h GROUP BY doc_id),
        sig AS (
            SELECT doc_id,
                   ({_SH_SIG_HI})::BIGINT AS sig_hi,
                   ({_SH_SIG_LO})::BIGINT AS sig_lo
            FROM s),
        banded AS (
            SELECT doc_id, sig_hi, sig_lo,
                   unnest([sig_hi & 65535,
                           65536 + ((sig_hi >> 16) & 65535),
                           131072 + (sig_lo & 65535),
                           196608 + ((sig_lo >> 16) & 65535)]) AS bkey
            FROM sig)
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               {_SH_HAMMING} AS hamming
        FROM banded a JOIN banded b
          ON a.bkey = b.bkey AND a.doc_id < b.doc_id
        WHERE {_SH_HAMMING} <= 6
        ORDER BY doc_a, doc_b
    """,
    tags=("ext", "dedup", "simhash"),
)
def n2g_simhash_md5_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with an engine-portable hash: per-token md5
    split into two 32-bit halves, 2x32-bit signature via sign-of-bit-sums,
    4x16-bit banded candidate join, exact hamming <= 6 verify — same LSH
    shape as n2d, but every stage is bit-identical in DuckDB, making this
    the auditable twin of the xxhash64 throughput path.

    Scale: one token explode + one 64-expression grouped aggregate (single
    doc_id shuffle), then a candidate join keyed on 16-bit bands — band
    keys cap bucket skew at 4/65536 of the corpus per band value, and
    signatures stay in [0, 2^32) so all bit math is sign-safe in both
    engines."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id",
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("tok"),
    )
    md5 = F.md5("tok")
    halves = tokens.select(
        "doc_id",
        F.conv(F.substring(md5, 1, 8), 16, 10).cast("bigint").alias("hi"),
        F.conv(F.substring(md5, 9, 8), 16, 10).cast("bigint").alias("lo"),
    )
    sums = halves.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col(src), b).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"{pre}{b}")
            for pre, src in (("hb", "hi"), ("lb", "lo"))
            for b in range(32)
        ]
    )

    def _sig(prefix: str):
        s = F.lit(0).cast("bigint")
        for b in range(32):
            s = s + F.when(
                F.col(f"{prefix}{b}") > 0, F.lit(1 << b).cast("bigint")
            ).otherwise(F.lit(0).cast("bigint"))
        return s

    sigs = sums.select(
        "doc_id", _sig("hb").alias("sig_hi"), _sig("lb").alias("sig_lo")
    )
    keys = F.array(
        F.col("sig_hi").bitwiseAND(F.lit(65535)),
        F.lit(65536)
        + F.shiftright(F.col("sig_hi"), 16).bitwiseAND(F.lit(65535)),
        F.lit(131072) + F.col("sig_lo").bitwiseAND(F.lit(65535)),
        F.lit(196608)
        + F.shiftright(F.col("sig_lo"), 16).bitwiseAND(F.lit(65535)),
    )
    banded = sigs.select(
        "doc_id", "sig_hi", "sig_lo", F.explode(keys).alias("bkey")
    )
    a, b = banded.alias("a"), banded.alias("b")
    hamming = F.bit_count(
        F.col("a.sig_hi").bitwiseXOR(F.col("b.sig_hi"))
    ) + F.bit_count(F.col("a.sig_lo").bitwiseXOR(F.col("b.sig_lo")))
    return (
        a.join(
            b,
            (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= 6)
        .orderBy("doc_a", "doc_b")
    )


# --- md5-based MinHash: the engine-portable (oracle-checked) variant ------
# Same pattern as n2g vs n2d: n2c's xxhash64(seed) family is JVM-only, so
# its LSH output can only be rows-only checked. Deriving the 32 hash
# functions from md5('<seed>:<shingle>') makes signature, band keys, and
# the verified pair set bit-identical in DuckDB.

_MH_SEEDS, _MH_BANDS, _MH_ROWS = 32, 8, 4


def md5_minhash_sig(shingles) -> "F.Column":
    """Per-row MinHash signature with the engine-portable md5 hash family:
    sig[s] = min over shingles of int32(md5('<s>:<shingle>')[:8]).

    Pure higher-order functions — NO explode, NO shuffle — so it works on a
    STREAMING DataFrame (stateless per row). For batch corpus-scale
    signature builds prefer the explode -> grouped-min path in n2h (each
    shingle hashed once per seed; this formulation re-evaluates the shingle
    array per seed, measured 15x slower) — the two produce identical
    signatures."""
    return F.array(
        *[
            F.array_min(
                F.transform(
                    shingles,
                    lambda sh: F.conv(
                        F.substring(
                            F.md5(F.concat_ws(":", F.lit(str(s)), sh)), 1, 8
                        ),
                        16,
                        10,
                    ).cast("bigint"),
                )
            )
            for s in range(_MH_SEEDS)
        ]
    )


def md5_minhash_sig_grouped(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-scale signature build: explode shingles -> per-batch
    partial mins in Arrow Python -> one id-keyed final min shuffle.
    Returns (id_col, sig array<bigint>). Same hash family (and
    bit-identical values) as `md5_minhash_sig`.

    Round-10 shape: the previous all-JVM form (32 grouped
    min(conv(substring(md5(concat))...)) aggregates) measured 8.5 s at
    sf0.1 — profiled per component, ~40% is Spark's Md5 expression
    (one MessageDigest per call) and ~35% the conv() hex parse
    (NumberConverter string round trip). The mapInPandas kernel
    dedupes shingles WITHIN each Arrow batch (a doc's shingles are
    contiguous after explode, and the fixture vocabulary is ~10x
    smaller than the (doc, shingle) stream), hashes each unique
    shingle once per seed with hashlib, and reduces per-doc partial
    mins vectorized (np.minimum.reduceat). Partial mins are exact
    under the final per-id min (min is associative), so the signatures
    are unchanged — pinned bit-for-bit by
    tests/test_plan_quality_r10opt.py. Measured 8.5 s -> ~1.3 s.
    """
    # the fixture lands as one single-row-group parquet file, so the
    # scan is ONE partition and the shingle+hash map work would run on
    # one core (round-10 finding — this, not the hash chain, was the
    # 8 s); spread the doc rows first. Gated: already-wide inputs (any
    # real scale) pass through with no exchange (round-11).
    exploded = _ensure_wide(docs).select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), 3)).alias("_sh")
    )
    n_seeds = _MH_SEEDS

    def partial_sigs(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        seed_prefixes = [f"{s}:".encode() for s in range(n_seeds)]
        md5 = hashlib.md5

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf.iloc[:, 0].to_numpy(dtype=np.int64)
            # vocab within the batch: hash each unique shingle once/seed
            uniq, inv = np.unique(
                pdf["_sh"].to_numpy(dtype=object), return_inverse=True
            )
            H = np.empty((len(uniq), n_seeds), dtype=np.int64)
            for u, sh in enumerate(uniq):
                b = sh.encode()
                H[u] = [
                    int.from_bytes(md5(p + b).digest()[:4], "big")
                    for p in seed_prefixes
                ]
            rows = H[inv]  # (n_rows, n_seeds) hash matrix in row order
            # per-doc partial min, vectorized: group contiguous id runs
            order = np.argsort(ids, kind="stable")
            sids = ids[order]
            starts = np.flatnonzero(
                np.r_[True, sids[1:] != sids[:-1]]
            )
            mins = np.minimum.reduceat(rows[order], starts, axis=0)
            out = pd.DataFrame(
                mins, columns=[f"_h{s}" for s in range(n_seeds)]
            )
            out.insert(0, "_mid", sids[starts])
            yield out

    schema = "_mid long, " + ", ".join(
        f"_h{s} long" for s in range(n_seeds)
    )
    mins = (
        exploded.mapInPandas(partial_sigs, schema)
        .groupBy(F.col("_mid").alias(id_col))
        .agg(*[F.min(f"_h{s}").alias(f"_h{s}") for s in range(n_seeds)])
    )
    return mins.select(
        F.col(id_col),
        F.array(*[F.col(f"_h{s}") for s in range(n_seeds)]).alias("sig"),
    )


def md5_minhash_sig_rows(
    df: DataFrame, id_col: str = "doc_id", shingle_col: str = "sh"
) -> DataFrame:
    """Per-ROW MinHash signatures via Arrow batches — stateless, so it
    runs on a STREAMING DataFrame exactly like the per-row HOF form
    (`md5_minhash_sig`), with bit-identical signatures (same
    md5('<seed>:<shingle>') first-4-bytes family, min over int64s).

    Round-10: the HOF form pays Spark's per-call Md5 + conv() hex
    parse per (shingle, seed) inside the interpreter; this kernel
    dedupes shingles within each Arrow batch, hashes each unique one
    once per seed with hashlib, and takes per-row mins vectorized
    (np.minimum.reduceat over the flattened shingle stream). Rows with
    EMPTY shingle arrays must be filtered out first (the HOF form
    would emit an all-null signature; this one has no min to take) —
    l9 already filters size(sh) > 0 for index symmetry."""
    n_seeds = _MH_SEEDS

    def kernel(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        prefixes = [f"{s}:".encode() for s in range(n_seeds)]
        md5 = hashlib.md5
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf.iloc[:, 0].to_numpy(dtype=np.int64)
            lists = pdf.iloc[:, 1].tolist()
            lens = np.array([len(x) for x in lists], dtype=np.int64)
            flat = np.array(
                [s for lst in lists for s in lst], dtype=object
            )
            uniq, inv = np.unique(flat, return_inverse=True)
            H = np.empty((len(uniq), n_seeds), dtype=np.int64)
            for u, sh in enumerate(uniq):
                b = sh.encode()
                H[u] = [
                    int.from_bytes(md5(p + b).digest()[:4], "big")
                    for p in prefixes
                ]
            starts = np.r_[0, np.cumsum(lens)[:-1]]
            sigs = np.minimum.reduceat(H[inv], starts, axis=0)
            yield pd.DataFrame(
                {"_mid": ids, "sig": list(sigs)}
            )

    return (
        df.select(F.col(id_col), F.col(shingle_col))
        .mapInPandas(kernel, "_mid long, sig array<bigint>")
        .withColumnRenamed("_mid", id_col)
    )


def md5_band_keys(sig) -> "F.Column":
    """Banded LSH keys over an md5-family signature:
    array<struct<band:int, bkey:string>> with bkey = md5 of the band's
    comma-joined rows — the single shared band-key definition for n2h and
    the streaming ingest twin (l9), so the two can never drift."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.array_join(
                        F.transform(
                            F.slice(sig, b * _MH_ROWS + 1, _MH_ROWS),
                            lambda x: x.cast("string"),
                        ),
                        ",",
                    )
                ).alias("bkey"),
            )
            for b in range(_MH_BANDS)
        ]
    )


@declare(
    "n2h_minhash_md5_neardup",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sh AS (
            SELECT DISTINCT doc_id,
                   array_to_string(list_slice(w, i + 1, i + 3), ' ') AS shingle
            FROM d, unnest(range(greatest(len(w) - 2, 0))) AS t(i)),
        h AS (
            SELECT doc_id, s.seed,
                   min(('0x' || substr(
                       md5(s.seed::VARCHAR || ':' || shingle), 1, 8))::BIGINT)
                       AS mh
            FROM sh, unnest(range({_MH_SEEDS})) AS s(seed)
            GROUP BY doc_id, s.seed),
        sig AS (
            SELECT doc_id, list(mh ORDER BY seed) AS sig
            FROM h GROUP BY doc_id),
        banded AS (
            SELECT doc_id, sig, b.band,
                   md5(array_to_string(
                       sig[b.band * {_MH_ROWS} + 1 : (b.band + 1) * {_MH_ROWS}],
                       ',')) AS bkey
            FROM sig, unnest(range({_MH_BANDS})) AS b(band)),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.sig AS sig_a, b.sig AS sig_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.bkey = b.bkey
                 AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b,
               round(len(list_filter(generate_series(1, {_MH_SEEDS}),
                         i -> sig_a[i] = sig_b[i])) / {_MH_SEEDS}.0, 6)
                   AS est_jaccard
        FROM cand
        WHERE len(list_filter(generate_series(1, {_MH_SEEDS}),
                  i -> sig_a[i] = sig_b[i])) / {_MH_SEEDS}.0 >= 0.8
        ORDER BY doc_a, doc_b
    """,
    tags=("ext", "dedup", "minhash", "lsh"),
)
def n2h_minhash_md5_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH with an engine-portable hash family:
    hash_s(shingle) = int32(md5('<s>:<shingle>')[:8]) for 32 seeds,
    8 bands x 4 rows, candidate join on md5 band keys, verify at
    estimated Jaccard >= 0.8 — the auditable twin of the n2c throughput
    path (xxhash64), fully hash-checkable in DuckDB.

    Same scale shape as n2c: explode -> 32 grouped mins (one doc_id
    shuffle, each shingle hashed once per seed — the column-expression
    formulation re-evaluates the shingle array 32x, measured 15x slower),
    band join keyed on (band, 128-bit key) so the candidate space stays
    linear in corpus size."""
    # md5_minhash_sig_grouped widens the narrow fixture scan itself
    # (gated); no second exchange here
    docs = load_table(spark, sf_dir, "documents")
    sig = md5_minhash_sig_grouped(docs)
    banded = sig.select(
        "doc_id", "sig", F.explode(md5_band_keys(F.col("sig"))).alias("bk")
    ).select("doc_id", "sig", "bk.band", "bk.bkey")
    a, b = banded.alias("a"), banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                lambda eq: eq,
            )
        )
        / F.lit(float(_MH_SEEDS))
    )
    return (
        candidates.select(
            "doc_a", "doc_b", F.round(est, 6).alias("est_jaccard")
        )
        .filter(F.col("est_jaccard") >= 0.8)
        .orderBy("doc_a", "doc_b")
    )


# --- SemDeDup-style semantic dedup decisions ------------------------------
# Turns the exact embedding-cosine near-dup graph (n2e) into per-vector
# KEEP/DROP decisions: connected components over the pair graph, keep the
# min-id representative of each semantic cluster (SemDeDup, Abbas et al.
# 2023, arXiv:2303.09540 — public paper; the keep-one-per-cluster policy).

_SEMANTIC_DEDUP_ORACLE = f"""
    WITH RECURSIVE e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    np AS (
        SELECT a.vec_id AS va, b.vec_id AS vb
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v))
                 * sqrt(list_dot_product(b.v, b.v))) >= {_NEARDUP_THRESHOLD}),
    edges AS (
        SELECT va AS s, vb AS t FROM np
        UNION ALL SELECT vb, va FROM np),
    reach(doc, r) AS (
        SELECT DISTINCT s AS doc, s AS r FROM edges
        UNION
        SELECT e2.s, reach.r FROM edges e2 JOIN reach ON reach.doc = e2.t),
    comp AS (SELECT doc AS vec_id, min(r) AS cluster_id
             FROM reach GROUP BY doc)
    SELECT u.vec_id,
           coalesce(c.cluster_id, u.vec_id) AS cluster_id,
           CASE WHEN c.cluster_id IS NULL OR c.cluster_id = u.vec_id
                THEN 1 ELSE 0 END AS keep
    FROM (SELECT vec_id FROM embeddings) u
    LEFT JOIN comp c ON c.vec_id = u.vec_id
    ORDER BY u.vec_id
"""


@declare(
    "n25_semantic_dedup",
    oracle=_SEMANTIC_DEDUP_ORACLE,
    tags=("ext", "dedup", "embeddings", "iterative"),
)
def n25_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup decisions: cosine>=threshold pair graph (exact, via
    n2e's size-guarded GEMM) -> connected components (large-star/small-star
    contraction, O(log² n) rounds) -> keep the min-vec_id representative per
    cluster; singletons keep themselves. The DuckDB recursive-CTE oracle
    materializes the transitive closure — fine at test scale, exactly the
    formulation the engine side avoids.
    """
    pairs = n2e_embedding_cosine_neardup(spark, sf_dir).select("vec_a", "vec_b")
    comp = _star_components(pairs)
    universe = load_table(spark, sf_dir, "embeddings").select("vec_id")
    return (
        universe.join(comp, universe.vec_id == comp.id, "left")
        .select(
            "vec_id",
            F.coalesce("label", F.col("vec_id")).alias("cluster_id"),
        )
        .withColumn(
            "keep",
            F.when(F.col("cluster_id") == F.col("vec_id"), 1).otherwise(0),
        )
        .orderBy("vec_id")
    )
