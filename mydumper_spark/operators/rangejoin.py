"""Range (interval-proximity) join — the second custom temporal operator.

``lower <= r.ts - l.ts <= upper`` per key: click→conversion attribution,
sensor alignment, trade/quote windows. Spark's only built-in physical plan
for the naive inequality predicate is BroadcastNestedLoop / cartesian-per-
key — O(|L|·|R|) per key and a scale-killer (same failure mode as the
as-of join's naive form, see operators/asof.py).

Spark-first shape — **banded equi-join**: with band width
``B = upper - lower`` (the window span),

1. each right row lands in band ``floor(r.ts / B)``;
2. each left row's admissible interval ``[l.ts+lower, l.ts+upper]`` spans
   at most TWO consecutive bands — explode it to those band keys;
3. equi-join on ``(key, band)`` — hash-partitionable, broadcastable,
   AQE-skew-splittable like any other equi-join;
4. re-check the exact inequality to discard the band-collision false
   positives.

Cost: one shuffle of |L|·≤2 + |R| rows; every true pair is produced exactly
once (a right row has exactly one band), so no dedup pass is needed.
Catalyst sees a plain equi-join — all the usual physical strategies apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower: int,
    upper: int,
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """All (left, right) pairs with ``lower <= right.ts - left.ts <= upper``
    per join key. ``lower``/``upper`` are in the timestamp column's own
    units (integer timestamps expected; ``lower < upper``)."""
    if not lower < upper:
        raise ValueError(f"need lower < upper, got [{lower}, {upper}]")
    band = max(upper - lower, 1)

    # integer DIV, not FP division+floor: a double quotient that lands a ULP
    # below an exact band boundary would silently drop a true pair
    lo_band = F.expr(f"CAST(({left_ts} + {lower}) DIV {band} AS BIGINT)")
    hi_band = F.expr(f"CAST(({left_ts} + {upper}) DIV {band} AS BIGINT)")
    l = left.select(
        *[F.col(k) for k in on],
        *[F.col(c).alias(f"{c}{suffixes[0]}") for c in left.columns if c not in on],
        F.explode(F.sequence(lo_band, hi_band)).alias("__band"),
    )
    r = right.select(
        *[F.col(k) for k in on],
        *[F.col(c).alias(f"{c}{suffixes[1]}") for c in right.columns if c not in on],
        F.expr(f"CAST({right_ts} DIV {band} AS BIGINT)").alias("__band"),
    )
    lts, rts = f"{left_ts}{suffixes[0]}", f"{right_ts}{suffixes[1]}"
    delta = F.col(rts) - F.col(lts)
    return (
        l.join(r, [*on, "__band"])
        .where((delta >= lower) & (delta <= upper))
        .drop("__band")
    )
