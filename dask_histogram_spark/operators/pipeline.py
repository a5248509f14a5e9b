"""Composed training-data pipeline: the operators of this package
chained the way a 100 TB corpus-preparation run chains them.

``prepare_training_corpus`` = exact dedup -> quality filter -> token
accounting, as ONE declarative plan (no intermediate materialization:
Catalyst pipelines the narrow stages and the single shuffle is the
dedup groupBy).  Every stage is SQL-expressible, so the whole pipeline
is covered by the DuckDB oracle gate end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["prepare_training_corpus", "corpus_stats"]


def prepare_training_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_chars: int = 80,
    max_digit_ratio: float = 0.3,
    min_tokens: int = 10,
) -> DataFrame:
    """Deduplicate + quality-filter a document table.

    Stages (all lazy, one plan):
      1. exact dedup on full text, min-id winner (one shuffle);
      2. length / digit-ratio / token-count quality gates;
      3. token accounting for budget tracking.

    Output: (id, n_tokens, n_chars, digit_ratio) for every KEPT doc.

    Scale shape: the quality gates and token accounting are
    deterministic functions of the text, so they run BEFORE the dedup
    shuffle (all copies of a text pass or fail together — the min-id
    winner is unchanged) and the groupBy keys on ``xxhash64(text)``
    (8-byte shuffle key, like :func:`~.dedup.dedup_exact`).  The
    exchange therefore carries only (hash, id, 3 small ints) per
    surviving row — the document text itself never shuffles.
    """
    t = F.col(text_col)
    n = F.length(t).cast("double")
    digit_ratio = F.round(
        F.length(F.regexp_replace(t, "[^0-9]", "")) /
        F.greatest(n, F.lit(1.0)),
        6,
    )
    toks = F.split(F.trim(F.lower(t)), r"\s+")
    gated = (
        df.select(
            F.xxhash64(t).alias("__k"),
            F.col(id_col),
            F.length(t).alias("n_chars"),
            F.size(toks).alias("n_tokens"),
            digit_ratio.alias("digit_ratio"),
        )
        .where(
            (F.col("n_chars") >= min_chars)
            & (F.col("digit_ratio") <= max_digit_ratio)
            & (F.col("n_tokens") >= min_tokens)
        )
    )
    # stats are identical within a hash group; min() keeps them paired
    # with the min-id winner deterministically
    return (
        gated.groupBy("__k")
        .agg(
            F.min(id_col).alias(id_col),
            F.min("n_chars").alias("n_chars"),
            F.min("n_tokens").alias("n_tokens"),
            F.min("digit_ratio").alias("digit_ratio"),
        )
        .select(id_col, "n_chars", "n_tokens", "digit_ratio")
    )


def corpus_stats(kept: DataFrame) -> DataFrame:
    """Budget summary of a prepared corpus: docs kept, token/char
    totals (the numbers a training-data run reports)."""
    return kept.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )


def prepare_training_corpus_sql(min_chars: int = 80,
                                max_digit_ratio: float = 0.3,
                                min_tokens: int = 10,
                                table: str = "documents") -> str:
    """DuckDB twin of :func:`prepare_training_corpus` for the oracle
    gate.  The twin groups on the full text and filters after the
    group — algebraically identical to the engine's pre-shuffle-gate +
    hash-key plan, because every gate/stat is a deterministic function
    of the text (all copies agree) and xxhash64 collisions are
    negligible at test scale."""
    return rf"""
SELECT doc_id, n_chars, n_tokens, digit_ratio FROM (
  SELECT doc_id,
         length(text) AS n_chars,
         len(string_split_regex(trim(lower(text)), '\s+')) AS n_tokens,
         ROUND(length(regexp_replace(text, '[^0-9]', '', 'g'))
               / GREATEST(CAST(length(text) AS DOUBLE), 1.0), 6) AS digit_ratio
  FROM (SELECT text, MIN(doc_id) AS doc_id FROM {table} GROUP BY text))
WHERE n_chars >= {min_chars} AND digit_ratio <= {max_digit_ratio}
  AND n_tokens >= {min_tokens}
"""
