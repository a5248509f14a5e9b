"""Structured-Streaming histograms (engine extension — the reference is
batch-only, SURVEY.md §2.3 'Streaming: absent').

A streaming histogram is the same declarative plan as the batch fill
(bin exprs -> groupBy -> storage aggs) with an event-time window key
prepended and a watermark for late data; Spark's incremental state
store maintains the per-(window, bin) accumulators.  Because the fill
is expressed over built-in aggregates, it runs in every output mode
('update' for dashboards, 'append' after watermark close).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..fill import (
    ColumnLike,
    WeightLike,
    _as_col,
    _sample_col,
    _storage_aggs,
    _weight_col,
)
from ..binning import bin_column
from ..spec import HistogramSpec

__all__ = ["streaming_histogram", "windowed_histogram"]


def windowed_histogram(
    df: DataFrame,
    ts_col: str,
    cols: Sequence[ColumnLike],
    spec: HistogramSpec,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "1 hour",
    weight: WeightLike = None,
    sample: ColumnLike | None = None,
) -> DataFrame:
    """Event-time-windowed histogram; works identically on batch and
    streaming DataFrames (the streaming case adds the watermark).

    Output: (window_start, window_end, bin_0.., <accumulators>).
    """
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window, slide or window)
    proj = [
        bin_column(ax, _as_col(c)).alias(name)
        for ax, c, name in zip(spec.axes, cols, spec.bin_cols)
    ]
    # _sample_col, not a bare cast: the spec's sample_shift must apply
    # on streams exactly as in batch fills
    proj.append(_weight_col(weight).alias("__w"))
    proj.append(_sample_col(spec, sample).alias("__s"))
    weighted = weight is not None or spec.storage.needs_weight
    return (
        df.select(win.alias("__win"), *proj)
        .groupBy("__win", *spec.bin_cols)
        .agg(*_storage_aggs(spec, weighted))
        .select(
            F.col("__win.start").alias("window_start"),
            F.col("__win.end").alias("window_end"),
            *spec.bin_cols,
            *spec.value_cols,
        )
    )


def streaming_histogram(
    df: DataFrame,
    ts_col: str,
    cols: Sequence[ColumnLike],
    spec: HistogramSpec,
    window: str = "1 hour",
    watermark: str = "1 hour",
    weight: WeightLike = None,
):
    """Convenience: windowed_histogram + a memory-sink writeStream
    handle (caller starts/stops the query)."""
    out = windowed_histogram(df, ts_col, cols, spec, window=window,
                             watermark=watermark, weight=weight)
    return out.writeStream.outputMode("update").format("memory")
