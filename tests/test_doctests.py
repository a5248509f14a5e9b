"""Executable docstring examples (the reference's CI runs
``pytest --doctest-modules`` over ``src/`` — .github/workflows/ci.yml:
58-61, e.g. core.py:1256-1295; these five public entry points carry the
same kind of runnable specs).

Run programmatically (not via --doctest-modules) so the Spark session
is shared with the suite's JVM and collection stays deterministic.
"""

from __future__ import annotations

import doctest
import importlib

import pytest

MODULES = [
    "dask_histogram_spark.routines",
    # importlib, not attribute access: the package re-exports a `fill`
    # FUNCTION that shadows the `fill` submodule attribute
    "dask_histogram_spark.fill",
    "dask_histogram_spark.object_api",
    "dask_histogram_spark.operators.dedup",
    "dask_histogram_spark.operators.pipeline",
]


@pytest.mark.parametrize("name", MODULES)
def test_doctests(spark, name):
    # `spark` fixture: the doctests' get_spark(...) resolves to this
    # already-running session via getOrCreate
    mod = importlib.import_module(name)
    result = doctest.testmod(mod, verbose=False)
    assert result.attempted > 0, f"no doctests collected in {name}"
    assert result.failed == 0
