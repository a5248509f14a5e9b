"""Composed corpus-chain leg (queries.pipeline_corpus_stats,
kind='chain'): the cheap invariants that don't need the full replay —
the full chain itself is gated end-to-end by the driver row and
scripts/check_oracles.py at sf0.001/0.01/0.1.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from dask_histogram_spark.queries import (
    _CHAIN_C_OFF,
    _CHAIN_N_OFF,
    _chain_layout,
    _chain_plain_sql,
    _chain_text_sql,
)


def test_chain_layout_arithmetic():
    lay = _chain_layout(500)
    # driver-gate constants (sf0.01): pinned so an accidental modulus
    # edit shows up as a test diff, not a silent gate reshape
    assert lay == {
        "n": 500, "n_gib": 38, "n_copy": 71, "n_near": 46,
        "n_near_gib": 3, "n_bench": 26, "n_footer_corpus": 115,
        "corpus_n": 617,
    }
    # structural invariants at an sf0.1-ish n
    lay = _chain_layout(5000)
    assert lay["corpus_n"] == lay["n"] + lay["n_copy"] + lay["n_near"]
    assert lay["n_bench"] > 0 and lay["n_footer_corpus"] > 0
    # offsets clear any base id and each other
    assert _CHAIN_N_OFF > _CHAIN_C_OFF > 5000


def test_chain_generation_cross_engine(spark):
    """The ONE text template must evaluate identically in Spark and
    DuckDB (md5/concat_ws/CASE arithmetic) — the property the whole
    oracle replay rests on."""
    n = 40
    got_spark = {
        r["id"]: r["text"]
        for r in spark.range(n).select(
            "id", F.expr(_chain_text_sql("CAST(id AS STRING)"))
            .alias("text")).collect()
    }
    got_duck = dict(duckdb.sql(
        f"SELECT id, {_chain_text_sql('CAST(id AS VARCHAR)')} AS t "
        f"FROM range({n}) AS r(id)").fetchall())
    assert got_spark == got_duck
    # layout spot-checks: id 6 gibberish, id 0 footer, id 1 plain
    assert got_spark[6].startswith("g6x0 ") and "w" not in got_spark[6]
    assert got_spark[0].endswith(" ftr7") and " u0 " in got_spark[0]
    assert got_spark[1].endswith(" u1") and not got_spark[1].endswith("ftr7")
    # plain template == the CASE's ELSE arm for a plain id
    plain = duckdb.sql(
        f"SELECT {_chain_plain_sql('CAST(id AS VARCHAR)')} FROM "
        "range(1, 2) AS r(id)").fetchone()[0]
    assert plain == got_spark[1]


def test_chain_planted_words_unique_trailer():
    """Every doc's trailer word is doc-unique ('u<id>'), the guard
    against scale-dependent window-straddle widening — verify the
    template keeps it LAST before any footer."""
    sql = _chain_text_sql("CAST(id AS VARCHAR)")
    rows = duckdb.sql(
        f"SELECT id, string_split({sql}, ' ') AS w FROM range(25) AS r(id)"
    ).fetchall()
    for i, w in rows:
        if i % 13 == 6:
            continue  # gibberish: no trailer needed (all words unique)
        if i % 5 == 0:
            assert w[-9] == f"u{i}" and w[-8:] == [
                f"ftr{k}" for k in range(8)]
        else:
            assert w[-1] == f"u{i}"


def test_chain_leg_rows_gate(spark):
    """End-to-end chain at sf0.001: the planted accounting holds and
    the stage counts are internally consistent."""
    from dask_histogram_spark.queries import _chain_leg_rows, get_tables

    sf = "/root/testdata/sf0.001"
    n = get_tables(spark, sf)["documents"].count()
    lay = _chain_layout(n)
    rows = {r[1]: r for r in _chain_leg_rows(spark, sf)}
    assert rows["input"][2] == lay["corpus_n"]
    assert rows["span"][3] == 8 * lay["n_footer_corpus"]
    assert rows["exact"][3] == lay["n_copy"]
    assert rows["lm"][3] >= lay["n_gib"]
    assert rows["contam"][3] == lay["n_bench"]
    assert rows["final"][2] == rows["contam"][2]
