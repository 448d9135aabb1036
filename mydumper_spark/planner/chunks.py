"""Chunk planner — the scan-partitioning core of the engine.

The reference's central trick is turning one table into many disjoint WHERE
ranges executed in parallel:

- S2 integer-range chunking       — /root/reference/src/mydumper/mydumper_chunks.c:104-256,
                                    WHERE builder mydumper_integer_chunks.c:945-1000
- S3 adaptive chunk resizing      — mydumper_integer_chunks.c:781-827
- S4 work-stealing chunk split    — mydumper_integer_chunks.c:150-233
- S5 multi-column PK chunking     — mydumper_integer_chunks.c:638-700
- S6 string-range chunking        — mydumper_string_chunks.c:404-560, 1096-1121
- S8 row-count estimation         — mydumper_chunks.c:259-309
- S9 MIN/MAX boundary discovery   — mydumper_chunks.c:115-122

Spark-first re-expression: the planner runs on the driver and produces a list
of predicate strings (valid in both Spark SQL and ANSI SQL). Those predicates
become either ``spark.read.jdbc(predicates=[...])`` partitions (JDBC source)
or per-chunk ``df.filter`` clauses (file source — mostly useful for testing
and for bounded-size export files). Differences from the reference, chosen
deliberately for Spark's execution model:

- **Quantile boundaries instead of fixed steps.** The reference walks
  ``[MIN,MAX]`` with an adaptive step because it cannot see the distribution
  up front. We can: one ``approxQuantile`` pass yields equi-depth boundaries,
  so skewed/gappy keys produce balanced chunks in one shot. This replaces the
  time-feedback loop (S3) with a plan-time statistic, which is the idiomatic
  Spark shape (sample → plan; AQE handles runtime skew on shuffles).
- **Work stealing comes free.** Generating ≫ parallelism chunks up front lets
  Spark's scheduler do what the reference's ``split_chunk_step`` does (S4).
- **NULL safety.** The first chunk predicate includes ``col IS NULL`` exactly
  like the reference's ``include_null`` first chunk
  (mydumper_integer_chunks.c:945-955), so reassembly is lossless.

At 100 TB: chunk count should be 2-4× total executor cores; every predicate is
pushed down (JDBC) or pruned (parquet row-group stats), so a chunked scan
costs no more than a plain scan, while bounding per-task memory.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Literal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Strategy = Literal["none", "integer", "string", "multi", "partition"]


@dataclass
class ChunkPlan:
    """Driver-side analogue of the reference's ``chunk_step_item`` list
    (mydumper_chunks.h:35-79): an ordered set of disjoint predicates whose
    union covers the whole table."""

    column: str | None
    strategy: Strategy
    predicates: list[str] = field(default_factory=list)
    boundaries: list = field(default_factory=list)

    @property
    def num_chunks(self) -> int:
        return max(1, len(self.predicates))


def estimate_rows(df: DataFrame) -> int:
    """S8. On parquet this is answered from footer metadata (Spark rewrites
    count(*) to a stats-only scan); on JDBC it pushes COUNT(*) down."""
    return df.count()


def min_max(df: DataFrame, column: str):
    """S9 boundary discovery — a single agg, pushed down to the source."""
    row = df.agg(
        F.min(column).alias("lo"), F.max(column).alias("hi"), F.count(column).alias("nonnull")
    ).first()
    return row["lo"], row["hi"], row["nonnull"]


def _quote(v) -> str:
    if isinstance(v, str):
        # escape BOTH the quote and the backslash: predicate strings are
        # parsed by Spark SQL (F.expr) and MySQL-family servers, and both
        # treat backslash as a string-literal escape — an unescaped
        # backslash would shift the boundary value ('a\\b' → 'ab')
        return "'" + v.replace("\\", "\\\\").replace("'", "''") + "'"
    return str(v)


def _ranges_to_predicates(column: str, bounds: list, include_null_first: bool) -> list[str]:
    """Build disjoint range predicates: (-inf,b1), [b1,b2), ... [bn-1,+inf).

    The END chunks are deliberately UNBOUNDED (`< b1` / `>= b(n-1)`), not
    clamped to the observed MIN/MAX. This is what makes the plan
    loss-proof under escaping/collation drift: every chunk's comparisons
    are evaluated by ONE engine, and chunk i's ``< X`` is exactly the
    complement of chunk i+1's ``>= X`` IN THAT ENGINE — so every row
    falls in exactly one chunk no matter how the engine parses the
    literal or orders the collation. Clamped ends instead silently DROP
    any row the evaluating engine orders outside the planner's [lo, hi]
    (e.g. a case-insensitive server collation vs the planner's binary
    sort, or rows written after planning). Per-chunk row counts may
    differ from the plan under such drift; coverage never does. Same end
    shape Spark's own JDBC partitioner uses (first/last stride
    unbounded)."""
    preds: list[str] = []
    n = len(bounds) - 1
    for i in range(n):
        lo, hi = bounds[i], bounds[i + 1]
        if n == 1:
            p = "1=1" if not include_null_first else f"{column} IS NOT NULL"
        elif i == 0:
            p = f"{column} < {_quote(hi)}"
        elif i == n - 1:
            p = f"{column} >= {_quote(lo)}"
        else:
            p = f"{column} >= {_quote(lo)} AND {column} < {_quote(hi)}"
        if i == 0 and include_null_first:
            p = f"({column} IS NULL OR ({p}))"
        preds.append(p)
    return preds


def plan_integer_chunks(
    df: DataFrame,
    column: str,
    num_chunks: int | None = None,
    rows_per_chunk: int | None = None,
    equi_depth: bool = True,
    relative_error: float = 0.001,
) -> ChunkPlan:
    """S2/S3: partition an integer key space into disjoint ranges.

    ``equi_depth=True`` uses approxQuantile so each chunk holds ~equal rows
    even when the key space has gaps or skew — the plan-time replacement for
    the reference's adaptive step resizing. ``equi_depth=False`` reproduces
    the reference's uniform ``(max-min)/n`` stepping.

    Plan-time cost: when the chunk count is known up front (every caller
    but the ``rows_per_chunk`` form), bounds/row-count/quantiles come from
    ONE aggregate job — min/max/counts/percentile_approx share a single
    column scan — instead of the pre-r14 three driver jobs (min-max agg,
    count, approxQuantile). percentile_approx and approxQuantile run the
    same Greenwald-Khanna summary at the same relative error; boundary
    values may differ within that error, which chunk coverage is
    insensitive to by construction (disjoint ranges, unbounded ends).
    """
    qs: "list | None" = None
    pre_known = num_chunks if num_chunks is not None else (
        None if rows_per_chunk
        else max(1, df.sparkSession.sparkContext.defaultParallelism)
    )
    # relative_error <= 0 is approxQuantile's EXACT mode, which
    # percentile_approx cannot express (its accuracy clamp would silently
    # approximate) — route it through the approxQuantile fallback below
    if equi_depth and pre_known and pre_known > 1 and relative_error > 0:
        probs = [i / pre_known for i in range(pre_known + 1)]
        accuracy = max(1, int(round(1.0 / max(relative_error, 1e-6))))
        row = df.agg(
            F.min(column).alias("lo"), F.max(column).alias("hi"),
            F.count(column).alias("nonnull"), F.count(F.lit(1)).alias("total"),
            F.percentile_approx(column, probs, accuracy).alias("qs"),
        ).first()
        lo, hi, nonnull, total = row["lo"], row["hi"], row["nonnull"], row["total"]
        qs = list(row["qs"]) if row["qs"] is not None else None
    else:
        lo, hi, nonnull = min_max(df, column)
        total = estimate_rows(df)
    has_null = total > nonnull
    if num_chunks is None:
        if rows_per_chunk:
            num_chunks = max(1, math.ceil(total / rows_per_chunk))
        else:
            num_chunks = max(1, df.sparkSession.sparkContext.defaultParallelism)
    if lo is None or total == 0 or num_chunks <= 1 or lo == hi:
        pred = None
        if lo is not None and num_chunks <= 1:
            pred = None
        return ChunkPlan(column=column, strategy="none", predicates=[pred] if pred else [])

    if equi_depth:
        if qs is None:
            probs = [i / num_chunks for i in range(num_chunks + 1)]
            qs = df.approxQuantile(column, probs, relative_error)
        bounds = sorted({int(q) for q in qs})
        bounds[0], bounds[-1] = int(lo), int(hi)
    else:
        step = max(1, math.ceil((int(hi) - int(lo) + 1) / num_chunks))
        bounds = list(range(int(lo), int(hi), step)) + [int(hi)]
        bounds = sorted(set(bounds))
    if len(bounds) < 2:
        return ChunkPlan(column=column, strategy="none", predicates=[])
    preds = _ranges_to_predicates(column, bounds, include_null_first=has_null)
    return ChunkPlan(column=column, strategy="integer", predicates=preds, boundaries=bounds)


def plan_string_chunks(
    df: DataFrame, column: str, num_chunks: int, sample_rows: int = 100_000
) -> ChunkPlan:
    """S6: partition a string key space.

    The reference binary-splits on character prefixes (``LEFT(col,k)``,
    mydumper_string_chunks.c:404-560). The Spark-first equivalent is an
    equi-depth sample: sort a bounded sample, take every (n/k)-th value as a
    boundary. One job over a sample, robust to arbitrary collations/prefix
    skew, and the resulting predicates are plain range comparisons that push
    down everywhere.
    """
    total = estimate_rows(df)
    if total == 0 or num_chunks <= 1:
        return ChunkPlan(column=column, strategy="none", predicates=[])
    frac = min(1.0, sample_rows / max(total, 1))
    sample = (
        df.select(column)
        .where(F.col(column).isNotNull())
        .sample(fraction=frac, seed=42)
        .orderBy(column)
        .collect()
    )
    if not sample:
        return ChunkPlan(column=column, strategy="none", predicates=[])
    values = [r[0] for r in sample]
    idxs = [round(i * (len(values) - 1) / num_chunks) for i in range(num_chunks + 1)]
    bounds = sorted(set(values[i] for i in idxs))
    lo, hi, nonnull = min_max(df, column)
    bounds[0], bounds[-1] = lo, hi
    bounds = sorted(set(bounds))
    if len(bounds) < 2:
        return ChunkPlan(column=column, strategy="none", predicates=[])
    preds = _ranges_to_predicates(column, bounds, include_null_first=total > nonnull)
    return ChunkPlan(column=column, strategy="string", predicates=preds, boundaries=bounds)


def plan_multi_column_chunks(
    df: DataFrame, outer: str, inner: str, inner_chunks: int, max_outer: int = 10_000
) -> ChunkPlan:
    """S5: two-level chunking for composite PKs — outer column stepped by
    distinct value, inner column range-chunked, WHERE is the prefix
    conjunction (mydumper_integer_chunks.c:638-700, 1002-1020).

    The outer distinct list is driver-collected, so it is guarded by
    ``max_outer``; beyond that fall back to chunking the outer column alone
    (which is what the reference's step>1 outer mode converges to).
    """
    n_outer = df.select(outer).distinct().count()
    if n_outer > max_outer:
        return plan_integer_chunks(df, outer, num_chunks=inner_chunks)
    outer_vals = [r[0] for r in df.select(outer).distinct().orderBy(outer).collect()]
    inner_plan = plan_integer_chunks(df, inner, num_chunks=inner_chunks)
    inner_preds = inner_plan.predicates or ["1=1"]
    preds = []
    for v in outer_vals:
        for ip in inner_preds:
            preds.append(f"{outer} = {_quote(v)} AND ({ip})")
    preds.append(f"{outer} IS NULL")
    return ChunkPlan(column=f"{outer},{inner}", strategy="multi", predicates=preds)


def plan_partition_chunks(
    df: DataFrame, column: str, pattern: str | None = None, max_partitions: int = 10_000
) -> ChunkPlan:
    """S7: partition-wise scan — one chunk per native partition, regex-filterable.

    The reference enumerates ``information_schema.PARTITIONS`` and emits one
    ``SELECT ... PARTITION (p)`` per name, filtered by ``--partition-regex``
    (mydumper_partition_chunks.c:46-61, 119-141). On a file source the same
    role is played by a low-cardinality partitioning column: one equality
    predicate per distinct value. Each predicate prunes to exactly one
    partition directory on hive-partitioned parquet/Delta (partition pruning),
    or pushes down as an equality filter otherwise — either way no chunk ever
    rescans another chunk's data.
    """
    rows = (
        df.select(column).distinct().orderBy(column).limit(max_partitions + 1).collect()
    )
    if len(rows) > max_partitions:
        raise ValueError(
            f"{column} has more than {max_partitions} distinct values; "
            "not a partitioning column — use plan_chunks instead"
        )
    vals = [r[0] for r in rows]
    has_null = any(v is None for v in vals)
    if pattern is not None:
        import re

        rx = re.compile(pattern)
        vals = [v for v in vals if v is not None and rx.search(str(v))]
    else:
        vals = [v for v in vals if v is not None]
    preds = [f"{column} = {_quote(v)}" for v in vals]
    if has_null and pattern is None:
        preds.append(f"{column} IS NULL")
    return ChunkPlan(column=column, strategy="partition", predicates=preds, boundaries=vals)


def plan_chunks(df: DataFrame, column: str, num_chunks: int | None = None) -> ChunkPlan:
    """Strategy dispatch, mirroring ``set_chunk_strategy_for_dbt``
    (mydumper_chunks.c:312-345): integer key → integer CSI, string key →
    string CSI, else NONE (full scan)."""
    dtype = dict(df.dtypes).get(column)
    if dtype in ("tinyint", "smallint", "int", "bigint"):
        return plan_integer_chunks(df, column, num_chunks=num_chunks)
    if dtype == "string":
        return plan_string_chunks(df, column, num_chunks=num_chunks or 8)
    return ChunkPlan(column=column, strategy="none", predicates=[])


def apply_chunk(df: DataFrame, plan: ChunkPlan, i: int) -> DataFrame:
    return df.where(plan.predicates[i])


def reassemble(df: DataFrame, plan: ChunkPlan) -> DataFrame:
    """Union of all chunk scans — must equal the plain table scan. This is the
    planner's correctness property (the reference proves it with roundtrip
    checksums; we prove it with the duckdb oracle + checksum tests)."""
    if not plan.predicates:
        return df
    out = None
    for p in plan.predicates:
        part = df.where(p)
        out = part if out is None else out.unionAll(part)
    return out


def chunk_counts(df: DataFrame, plan: ChunkPlan) -> list[int]:
    """One job: tag rows with their chunk id via a CASE cascade and count.
    Used by the adaptive re-planner, replacing per-chunk COUNT round-trips."""
    if not plan.predicates:
        return [df.count()]
    expr = None
    for i, p in enumerate(plan.predicates):
        expr = F.when(F.expr(p), F.lit(i)) if expr is None else expr.when(F.expr(p), F.lit(i))
    tagged = df.select(expr.alias("__chunk_id"))
    rows = tagged.groupBy("__chunk_id").count().collect()
    by_id = {r["__chunk_id"]: r["count"] for r in rows}
    return [by_id.get(i, 0) for i in range(len(plan.predicates))]


def adaptive_replan(
    df: DataFrame, plan: ChunkPlan, max_rows_per_chunk: int, max_iters: int = 3
) -> ChunkPlan:
    """S3/S4 analogue: iteratively bisect chunks whose observed row count
    exceeds the cap. The reference resizes its step after every chunk based on
    elapsed time; we re-plan from observed counts — same feedback loop, but
    batched (one counting job per iteration instead of per-chunk timing)."""
    if plan.strategy != "integer" or not plan.boundaries:
        return plan
    bounds = list(plan.boundaries)
    for _ in range(max_iters):
        cur = ChunkPlan(
            column=plan.column,
            strategy="integer",
            predicates=_ranges_to_predicates(plan.column, bounds, include_null_first=True),
            boundaries=bounds,
        )
        counts = chunk_counts(df, cur)
        new_bounds = [bounds[0]]
        split_any = False
        for i in range(len(bounds) - 1):
            lo, hi = bounds[i], bounds[i + 1]
            if counts[i] > max_rows_per_chunk and hi - lo > 1:
                mid = (lo + hi) // 2
                if mid not in (lo, hi):
                    new_bounds.append(mid)
                    split_any = True
            new_bounds.append(hi)
        bounds = sorted(set(new_bounds))
        if not split_any:
            break
    return ChunkPlan(
        column=plan.column,
        strategy="integer",
        predicates=_ranges_to_predicates(plan.column, bounds, include_null_first=True),
        boundaries=bounds,
    )


def to_jdbc_options(
    plan: ChunkPlan, url: str, table: str, properties: dict[str, str] | None = None
) -> dict:
    """Render a plan as ``spark.read.jdbc`` arguments: the predicate array
    verbatim — one JDBC partition per predicate, exactly the reference's
    one-SELECT-per-chunk execution (mydumper_write.c:1035-1108). Integer
    plans ship their predicates too (NOT partitionColumn/lowerBound/
    upperBound): Spark regenerates UNIFORM strides from the bounds, which
    would throw away the equi-depth quantile boundaries the planner paid a
    scan for — the skew the plan exists to remove would come right back."""
    props = {"fetchsize": "10000", **(properties or {})}
    return {"url": url, "table": table, "predicates": list(plan.predicates), "properties": props}
