"""Smoke tests for the driver contract."""

from __future__ import annotations

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMOKE


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) >= {"poly_id", "n_points"}


def test_queries_and_oracles_aligned(spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 20


def test_all_queries_run_at_smoke_scale(spark):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, SF_SMOKE)
        n = df.count()
        assert n >= 0, name
