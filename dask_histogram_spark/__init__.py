"""dask_histogram_spark — a PySpark-native histogram-aggregation engine
with the query and data-processing capabilities of
dask-contrib/dask-histogram, re-expressed Spark-first (declarative
DataFrame plans; Catalyst/Tungsten pick the physical strategy), plus
LLM-training-data pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) designed for 100 TB scale.
"""

from __future__ import annotations

from . import axis, storage
from .bins import normalize_bins_range
from .fill import (
    FillSpec,
    PartitionedHistogram,
    collapse,
    factory,
    fill,
    fill_multi,
    fill_partitioned,
    fill_sql,
    partitioned_factory,
)
from .object_api import Histogram
from .result import AggHistogram, round_doubles
from .routines import histogram, histogram2d, histogramdd
from .spec import (
    Boolean,
    HistogramSpec,
    IntCategory,
    Integer,
    Regular,
    Storage,
    StrCategory,
    Variable,
)

__version__ = "0.2.0"

__all__ = [
    "AggHistogram",
    "PartitionedHistogram",
    "axis",
    "storage",
    "factory",
    "partitioned_factory",
    "Boolean",
    "FillSpec",
    "Histogram",
    "HistogramSpec",
    "IntCategory",
    "Integer",
    "Regular",
    "Storage",
    "StrCategory",
    "Variable",
    "collapse",
    "fill",
    "fill_multi",
    "fill_partitioned",
    "fill_sql",
    "histogram",
    "histogram2d",
    "histogramdd",
    "normalize_bins_range",
    "round_doubles",
]
