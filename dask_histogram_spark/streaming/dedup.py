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

__all__ = ["streaming_dedup_exact"]


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
