"""Driver-contract surface checks."""

from __future__ import annotations

import __spark_entry__ as entry


def test_entry_runs(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert "sum_qty" in df.columns


def test_oracle_keys_subset_of_queries():
    q = set(entry.queries())
    o = set(entry.oracle_sql())
    assert o <= q
    # every non-oracle query is one of the documented hash-based ops
    rows_only = q - o
    assert all(name.startswith("x_") for name in rows_only)


def test_all_queries_run_at_smoke_sf(spark):
    for name, fn in entry.queries().items():
        df = fn(spark, entry.SF_SMOKE)
        assert df.columns, name
        df.limit(1).collect()
