"""As-of (nearest-key temporal) join — a custom operator Spark lacks.

For every left row, attach the right row with the greatest right timestamp
≤ the left timestamp (direction="backward"; "forward" = smallest ≥), per
join key — the point-in-time lookup under every feature store, slowly-
changing-dimension read, and trade/quote alignment.

Spark-first shape: the naive formulation is a range join
(``l.ts >= r.ts``) whose only built-in physical strategy is
BroadcastNestedLoop / cartesian-per-key — O(|L|·|R|) per key, a
scale-killer. This implementation is the **union + ordered window** merge:

1. tag left (probe) and right (build) rows, union them by name;
2. one hash-partition by key, one sort by (ts, tag) inside each partition
   — right rows sort before coincident left rows, making the match
   inclusive;
3. ``last(payload, ignorenulls=True)`` over an unbounded-preceding running
   frame carries the most recent right payload onto every left row;
4. keep the left rows, unpack the payload.

Cost: ONE shuffle of |L| + |R| rows and a per-partition sort — identical
asymptotics to a regular sort-merge join, regardless of how many right rows
precede each left row. No range explosion, no per-key quadratic blowup, and
skew behaves exactly like any sort-merge join (AQE skew handling applies).

Semantics match pandas ``merge_asof`` (left-join: unmatched left rows keep
NULL payloads; ``tolerance`` nulls out matches farther than the bound
rather than dropping rows) and the DuckDB/kdb ASOF JOIN (the oracle twin
uses DuckDB's native ``ASOF LEFT JOIN``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    direction: str = "backward",
    tolerance: int | float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Attach to each left row the temporally nearest right row per key.

    ``right_cols`` are the payload columns to carry over (emitted as
    ``<name><suffix>``, plus ``<right_ts><suffix>`` itself). ``tolerance``
    bounds ``|left_ts - right_ts|``; beyond it the payload is NULL (the row
    survives — left-join semantics)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    payload = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c) for c in right_cols]
    )
    # __t stays in the source numeric type — a double cast would silently
    # lose precision for ns-scale bigints (> 2^53)
    r = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_l"),
        payload.alias("__p"),
    )
    left_cols = left.columns
    l = left.select(
        *[F.col(k) for k in on],
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_l"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        F.struct(*[F.col(c) for c in left_cols]).alias("__l"),
    )
    r = r.withColumn("__l", F.lit(None).cast(l.schema["__l"].dataType))

    both = l.unionByName(r)
    # right rows sort before coincident left rows → ties are inclusive
    if direction == "backward":
        w = Window.partitionBy(*on).orderBy(F.col("__t").asc(), F.col("__is_l").asc())
        carried = F.last("__p", ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = Window.partitionBy(*on).orderBy(F.col("__t").desc(), F.col("__is_l").asc())
        carried = F.last("__p", ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    matched = both.withColumn("__m", carried).where(F.col("__is_l") == 1)
    if tolerance is not None:
        within = F.abs(
            F.col("__t").cast("double") - F.col("__m.__ts").cast("double")
        ) <= F.lit(float(tolerance))
        matched = matched.withColumn(
            "__m", F.when(within, F.col("__m")).otherwise(F.lit(None))
        )
    return matched.select(
        *[F.col(f"__l.{c}").alias(c) for c in left_cols],
        F.col("__m.__ts").alias(f"{right_ts}{suffix}"),
        *[F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
