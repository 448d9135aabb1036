"""Per-column table profiling (SURVEY §2.5 A1/A2 widened to every column).

The reference probes row counts (S8) and chunk-column bounds (S9) before
dumping; a migration/curation pipeline wants the same pass over EVERY
column: rows, null counts, distinct cardinality, bounds. One aggregate
job per table — all counters are map-side partial-aggregatable, and the
output is a handful of rows regardless of table size.

Distinct counts are the one knob with a real scale trade:
- ``approx_distinct=True`` (production default): HLL sketches
  (``approx_count_distinct``) — single-pass, fixed-size state, no Expand.
- ``approx_distinct=False``: exact ``count(DISTINCT col)`` — Catalyst
  plans multiple distinct aggregates via an Expand node that replicates
  every input row once per profiled column. Fine at fixture scale (and
  required for the DuckDB oracle, which must agree exactly); at 100 TB
  use the sketch.

Min/max stringify through the SAME canonicalization as the checksum
module (doubles → round(6) → DECIMAL(30,6) → string), so both engines
print identical values — raw double→string formatting does not match
across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _canon_str(c, dtype) -> F.Column:
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return F.round(c, 6).cast(T.DecimalType(30, 6)).cast("string")
    return c.cast("string")


_UNORDERED = (T.ArrayType, T.MapType, T.StructType, T.BinaryType)


def table_profile(
    df: DataFrame,
    cols: list[str] | None = None,
    approx_distinct: bool = True,
) -> DataFrame:
    """(column_name, n_rows, n_nulls, n_distinct, min_str, max_str) — one
    row per profiled column, from ONE aggregate pass. Complex/binary
    columns get NULL bounds (no portable ordering)."""
    fields = [f for f in df.schema.fields if cols is None or f.name in cols]
    aggs = []
    for f in fields:
        c = F.col(f.name)
        n = f.name
        aggs.append(F.count(F.lit(1)).alias(f"__rows_{n}"))
        aggs.append(
            F.sum(F.when(c.isNull(), 1).otherwise(0)).cast("bigint")
            .alias(f"__nulls_{n}")
        )
        distinct = (
            F.approx_count_distinct(c) if approx_distinct
            else F.count_distinct(c)
        )
        aggs.append(distinct.cast("bigint").alias(f"__dist_{n}"))
        if isinstance(f.dataType, _UNORDERED):
            aggs.append(F.lit(None).cast("string").alias(f"__min_{n}"))
            aggs.append(F.lit(None).cast("string").alias(f"__max_{n}"))
        else:
            aggs.append(_canon_str(F.min(c), f.dataType).alias(f"__min_{n}"))
            aggs.append(_canon_str(F.max(c), f.dataType).alias(f"__max_{n}"))
    wide = df.agg(*aggs)  # one row; all states fixed-size, map-side combined
    structs = F.array(*[
        F.struct(
            F.lit(f.name).alias("column_name"),
            F.col(f"__rows_{f.name}").alias("n_rows"),
            F.col(f"__nulls_{f.name}").alias("n_nulls"),
            F.col(f"__dist_{f.name}").alias("n_distinct"),
            F.col(f"__min_{f.name}").alias("min_str"),
            F.col(f"__max_{f.name}").alias("max_str"),
        )
        for f in fields
    ])
    return wide.select(F.explode(structs).alias("p")).select("p.*")


def oracle_profile_sql(table: str, fields: list[tuple[str, str]]) -> str:
    """DuckDB twin of :func:`table_profile` with exact distincts.
    ``fields`` is [(name, duckdb_type), ...]; the canonicalization mirrors
    ``_canon_str``."""
    parts = []
    for name, typ in fields:
        t = typ.upper()
        if t.endswith("[]"):
            mn = mx = "CAST(NULL AS VARCHAR)"
        elif t in ("DOUBLE", "FLOAT", "REAL"):
            mn = f"CAST(CAST(round(min({name}), 6) AS DECIMAL(30,6)) AS VARCHAR)"
            mx = f"CAST(CAST(round(max({name}), 6) AS DECIMAL(30,6)) AS VARCHAR)"
        else:
            mn = f"CAST(min({name}) AS VARCHAR)"
            mx = f"CAST(max({name}) AS VARCHAR)"
        parts.append(
            f"SELECT '{name}' AS column_name, "
            f"CAST(count(*) AS BIGINT) AS n_rows, "
            f"CAST(sum(CASE WHEN {name} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS n_nulls, "
            f"CAST(count(DISTINCT {name}) AS BIGINT) AS n_distinct, "
            f"{mn} AS min_str, {mx} AS max_str FROM {table}"
        )
    return " UNION ALL ".join(parts)
