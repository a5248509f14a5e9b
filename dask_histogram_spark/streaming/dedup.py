"""Stateful streaming deduplication (custom stateful operator via
``applyInPandasWithState`` — the extension point the reference lacks
entirely; SURVEY.md §2.3 'Streaming: absent').

``streaming_dedup_exact`` drops every record whose content hash has
been seen before, across micro-batches: the grouped state (one boolean
per content-hash key) lives in Spark's state store, so the operator
scales to an unbounded stream with state proportional to distinct
content, not stream length.  Pair with a state TTL (``timeout``) when
"seen recently" is the desired semantic instead of "seen ever".
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_dedup_exact", "streaming_minhash_candidates",
           "streaming_simhash_candidates", "streaming_embedding_candidates"]


def streaming_dedup_exact(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """First-arrival-wins exact dedup over a (streaming) DataFrame.

    Plan: hash the content JVM-side (8-byte state key), group by the
    hash, keep one bit of state per distinct document.  Output rows are
    the first-seen (id, hash) pairs; join back to the payload downstream
    if the full row is needed (keeps state and shuffle minimal).
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("content_hash", T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])

    def dedup(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            # already emitted a winner for this content hash
            for _ in pdfs:
                pass
            return
        best = None
        for pdf in pdfs:
            m = pdf[id_col].min()
            best = m if best is None else min(best, m)
        if best is not None:
            state.update((True,))
            yield pd.DataFrame({id_col: [best], "content_hash": [key[0]]})

    hashed = df.select(
        F.col(id_col), F.xxhash64(F.col(text_col)).alias("content_hash")
    )
    return hashed.groupBy("content_hash").applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_minhash_candidates(df: DataFrame, text_col: str = "text",
                                 id_col: str = "doc_id", num_perm: int = 64,
                                 bands: int = 16, shingle_k: int = 5,
                                 seed: int = 17,
                                 hash_fn: str = "xxhash64",
                                 seen_table: str | None = None,
                                 min_sig_matches: int | None = None
                                 ) -> DataFrame:
    """Streaming near-duplicate candidate detection by MinHash LSH.

    The band-bucket projection (operators/dedup.py ``minhash_banded``)
    is pure Column expressions, so it runs unchanged on the stream; the
    stateful part anchors each (band, bucket) group on its first-seen
    document id — every later arrival in the bucket is emitted as a
    candidate pair against the anchor.  State is ONE long per occupied
    bucket (not the bucket's membership list), so state growth is
    bounded by distinct buckets; candidate pairs then go through exact
    verification downstream (e.g. jaccard on the pair's texts), exactly
    as in the batch pipeline.

    Within one micro-batch the min-id row is the anchor and the rest
    emit against it — the same pairs a batch run of the bucket would
    produce against its min-id member.

    ``seen_table`` bridges the stream to CROSS-RUN state: pass the
    name of a :func:`~..operators.dedup.write_signature_table` table
    and every micro-batch ALSO stream-static-joins its band rows
    against the persisted corpus — the same bucketed no-exchange probe
    as :func:`~..operators.dedup.dedup_incremental_lsh`, gated by the
    same component-agreement ``min_sig_matches`` (default: the
    theory-derived J>=0.9 gate).  A RESTARTED stream therefore doesn't
    re-admit documents the corpus already holds: its in-memory bucket
    anchors are gone, but the persisted probe still pairs every
    re-arrival with its stored near-duplicates.  Banding parameters
    come from the table's ``__params`` sidecar (overriding the
    keyword defaults — drifted parameters would silently match
    nothing), with the same loud formula/empty-sidecar checks.

    Output (append mode): (id_a, id_b, band) with id_a the anchor —
    the in-stream first-seen id, or the SEEN corpus id for probe hits.
    """
    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("band", T.IntegerType()),
        ]
    )
    state_schema = T.StructType([T.StructField("anchor", T.LongType())])

    def detect(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        band = key[0]
        ids: list[int] = []
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf[id_col])
        if not ids:
            return
        ids.sort()
        if state.exists:
            (anchor,) = state.get
        else:
            anchor = ids.pop(0)
            state.update((anchor,))
        if ids:
            yield pd.DataFrame(
                {
                    "id_a": [anchor] * len(ids),
                    "id_b": ids,
                    "band": [band] * len(ids),
                }
            )

    from ..operators.dedup import (
        _band_explode,
        _sig_agreement,
        agreement_gate,
        load_signature_table,
        minhash_signatures,
    )

    seen = None
    if seen_table is not None:
        seen, (num_perm, bands, shingle_k, seed, hash_fn) = (
            load_signature_table(df.sparkSession, seen_table))
        if min_sig_matches is None:
            min_sig_matches = agreement_gate(num_perm, jaccard=0.9)
    # band once, WITH the signature kept only when a persisted corpus
    # is probed: the stateful detector ignores the extra column, the
    # probe needs it for the agreement gate — one signature fold (and
    # one stateful call site) serves both modes
    sigs = minhash_signatures(df, text_col, id_col, num_perm,
                              shingle_k, seed, hash_fn)
    banded = _band_explode(sigs, id_col, num_perm, bands, hash_fn,
                           keep=("sig",) if seen is not None else ())
    in_stream = (banded.drop("sig") if seen is not None else banded).groupBy(
        "band", "bucket").applyInPandasWithState(
        detect,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    if seen is None:
        return in_stream
    seen_b = seen.select(
        F.col(id_col).alias("__seen_id"), F.col("sig").alias("__seen_sig"),
        "band", "bucket")
    probe = (
        banded.join(seen_b, ["band", "bucket"])
        .where(_sig_agreement("sig", "__seen_sig")
               >= F.lit(min_sig_matches))
        .select(
            F.col("__seen_id").alias("id_a"),
            F.col(id_col).alias("id_b"),
            F.col("band").cast("int").alias("band"),
        )
    )
    return in_stream.unionByName(probe)


def streaming_embedding_candidates(df: DataFrame,
                                   vec_col: str = "embedding",
                                   id_col: str = "vec_id",
                                   planes: int = 16, seed: int = 23,
                                   repetitions: int = 1,
                                   method: str = "auto",
                                   dim: int | None = None,
                                   seen_table: str | None = None,
                                   threshold: float = 0.95,
                                   probes: int = 0) -> DataFrame:
    """Streaming near-duplicate candidates for the EMBEDDING modality —
    the vector twin of :func:`streaming_minhash_candidates`, completing
    the streaming x cross-run unification for both modalities.

    The hyperplane band projection
    (operators/similarity.py ``_hyperplane_banded``) is a stateless
    projection, so it runs unchanged on the stream; each (rep, sig)
    bucket anchors on its first-seen id with ONE long of state, and
    later arrivals emit (anchor, id, rep) candidate rows for exact-
    cosine verification downstream — the same two-tier shape as the
    batch operator.

    ``dim`` must be given for a pure in-stream run (a stream cannot be
    sampled for it); with ``seen_table`` it — and every banding
    parameter — loads from the persisted table's ``__params`` sidecar
    instead (drifted parameters would silently match nothing), with
    the loud formula/empty-sidecar checks.  The probe leg stream-
    static-joins each micro-batch's band rows against the bucketed
    seen table (no seen-side exchange) and verifies INLINE with the
    exact cosine at ``threshold`` — vectors ride the joined row, so
    unlike the in-stream leg no downstream verify is needed; a
    restarted stream therefore still refuses vectors the corpus
    already holds, exactly like :func:`~..operators.similarity.
    embedding_dedup_incremental`.

    Output (append mode): (id_a, id_b, rep) — id_a is the in-stream
    anchor, or the SEEN corpus id for probe hits (per-rep rows;
    distinct on (id_a, id_b) downstream if pair-unique output is
    needed, the batch operators' dropDuplicates convention).

    ``probes > 0`` multi-probes the PERSISTED-table leg only (each
    micro-batch row also joins under its lowest-margin bit-flip
    signatures — the batch operator's recall lever, same banding
    pass): it requires ``seen_table`` because multi-probing the
    IN-STREAM state buckets is not meaningful — every stream item is
    both query and corpus there, and probe rows would mint spurious
    anchors; the stateful detector reads base-signature rows only.
    """
    from ..operators.similarity import (
        _hyperplane_banded,
        cosine_expr,
        load_embedding_signature_table,
    )

    seen = None
    if seen_table is not None:
        seen, (planes, seed, repetitions, dim) = (
            load_embedding_signature_table(df.sparkSession, seen_table))
    elif dim is None:
        raise ValueError(
            "streaming_embedding_candidates needs dim= for a pure "
            "in-stream run (a stream cannot be sampled for it); with "
            "seen_table= it loads from the sidecar instead")
    if probes and seen is None:
        raise ValueError(
            "probes > 0 requires seen_table=: multi-probe is a QUERY-"
            "side lever against a persisted corpus; in-stream state "
            "buckets have no query/corpus asymmetry to probe")

    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("rep", T.IntegerType()),
        ]
    )
    state_schema = T.StructType([T.StructField("anchor", T.LongType())])

    def detect(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rep = key[0]
        ids: list[int] = []
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf[id_col])
        if not ids:
            return
        ids.sort()
        if state.exists:
            (anchor,) = state.get
        else:
            anchor = ids.pop(0)
            state.update((anchor,))
        if ids:
            yield pd.DataFrame(
                {
                    "id_a": [anchor] * len(ids),
                    "id_b": ids,
                    "rep": [rep] * len(ids),
                }
            )

    banded, _ = _hyperplane_banded(df, vec_col, id_col, planes, seed,
                                   repetitions, method, dim=dim,
                                   probes=probes)
    # the stateful detector reads only the id — don't ship rep x dim
    # floats per vector through its exchange (the minhash twin's
    # drop("sig") rationale); the probe leg below keeps the vector for
    # its inline cosine verify.  With multi-probe on, the detector
    # additionally sees BASE-signature rows only (probe rows would
    # mint spurious in-stream anchors).
    in_base = (banded.where(F.col("__probe") == 0).drop("__probe")
               if probes else banded)
    in_stream = in_base.drop(vec_col).groupBy(
        "__rep", "__sig").applyInPandasWithState(
        detect,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    if seen is None:
        return in_stream
    seen_b = seen.select(
        F.col(id_col).alias("__seen_id"),
        F.col(vec_col).alias("__seen_vec"), "rep", "sig")
    probe = (
        banded.join(
            seen_b,
            (F.col("__rep") == F.col("rep"))
            & (F.col("__sig") == F.col("sig")))
        .where(F.round(cosine_expr(F.col(vec_col), F.col("__seen_vec")), 6)
               >= F.lit(float(threshold)))
        .select(
            F.col("__seen_id").alias("id_a"),
            F.col(id_col).alias("id_b"),
            F.col("rep").cast("int").alias("rep"),
        )
    )
    return in_stream.unionByName(probe)


def streaming_simhash_candidates(df: DataFrame, text_col: str = "text",
                                 id_col: str = "doc_id",
                                 max_hamming: int = 3,
                                 hash_fn: str = "xxhash64") -> DataFrame:
    """Streaming near-duplicate candidates by SimHash pigeonhole
    banding — the SimHash twin of :func:`streaming_minhash_candidates`:
    the banded projection (operators/dedup.py ``simhash_banded``) runs
    unchanged on the stream, and each (chunk, cv) bucket anchors on its
    first-seen id with ONE long of state.  Candidates go to exact
    Hamming verification downstream, as in the batch operator.

    Output (append mode): (id_a, id_b, chunk) with id_a the anchor.
    """
    from ..operators.dedup import simhash_banded

    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("chunk", T.IntegerType()),
        ]
    )
    state_schema = T.StructType([T.StructField("anchor", T.LongType())])

    def detect(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        chunk = key[0]
        ids: list[int] = []
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf[id_col])
        if not ids:
            return
        ids.sort()
        if state.exists:
            (anchor,) = state.get
        else:
            anchor = ids.pop(0)
            state.update((anchor,))
        if ids:
            yield pd.DataFrame(
                {
                    "id_a": [anchor] * len(ids),
                    "id_b": ids,
                    "chunk": [chunk] * len(ids),
                }
            )

    banded = simhash_banded(df, text_col, id_col, max_hamming,
                            hash_fn=hash_fn)
    return banded.groupBy("chunk", "cv").applyInPandasWithState(
        detect,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
