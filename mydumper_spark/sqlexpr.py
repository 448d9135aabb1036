"""Render literal-heavy expressions as ONE SQL string for a single
``F.expr`` parse.

Why: every ``F.lit`` / builtin Column call is a py4j round trip plus a JVM
hop, so an expression inlining a 64-dim centroid list costs hundreds of
round trips (~0.3-0.6 ms each) before Spark ever sees a plan — measured
r15: x_embcurate_select spent 2.9 s of its 3.1 s wall in 2 909 py4j
commands at construction time. Rendering the same expression as SQL text
and parsing it once costs ~1 py4j call + a ~10 ms parse, and the analyzed
tree is identical (same operators, same literal values, same order), so
results are bit-for-bit unchanged — pinned by test_sqlexpr round-trip
tests and the full DuckDB oracle sweep.

Fidelity rules:
- doubles render via ``repr()`` (shortest round-trip form) + ``D`` suffix;
  Spark parses double literals with Java ``Double.parseDouble``, which
  inverts ``repr`` exactly. Non-finite values raise — SQL text has no
  inf/nan literal, and no operator here should ever inline one.
- python ints render bare (INT when they fit in 32 bits, else BIGINT —
  the same typing ``F.lit`` applies) or with an explicit ``L`` / CAST
  where a caller needs a fixed type.
- column names are always backtick-quoted.
"""

from __future__ import annotations

import math
from typing import Iterable, Sequence


def qcol(name: str) -> str:
    """Backtick-quoted column reference (hostile-name safe)."""
    return "`" + name.replace("`", "``") + "`"


def dlit(x: float) -> str:
    """Exact SQL double literal for a python float."""
    x = float(x)
    if not math.isfinite(x):
        raise ValueError(f"cannot render non-finite double literal: {x!r}")
    return repr(x) + "D"


def darr(vals: Iterable[float]) -> str:
    """``array(<double literals>)`` — one parse instead of N ``F.lit`` calls."""
    return "array(" + ", ".join(dlit(v) for v in vals) + ")"


def dot_sql(vec_sql: str, vals: Sequence[float]) -> str:
    """Σ vecᵢ·cᵢ as the same ordered left-to-right double fold as
    :func:`mydumper_spark.operators.similarity.dot` (zip_with + aggregate,
    both sides cast to double) — bit-identical term order."""
    return (
        f"aggregate(zip_with({vec_sql}, {darr(vals)}, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "0.0D, (acc, x) -> acc + x)"
    )


def norm_sql(vec_sql: str) -> str:
    """sqrt(Σ vᵢ²) — the SQL text of ``similarity.norm`` (same fold)."""
    return (
        f"SQRT(aggregate(zip_with({vec_sql}, {vec_sql}, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "0.0D, (acc, x) -> acc + x))"
    )


def cosine_const_sql(vec_sql: str, vals: Sequence[float]) -> str:
    """cosine(vec, <literal array>) with the zero-norm guard of
    ``similarity.cosine`` — the literal side's norm constant-folds."""
    q = darr(vals)
    dot = (
        f"aggregate(zip_with({vec_sql}, {q}, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "0.0D, (acc, x) -> acc + x)"
    )
    qn = (
        f"SQRT(aggregate(zip_with({q}, {q}, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "0.0D, (acc, x) -> acc + x))"
    )
    denom = f"({norm_sql(vec_sql)} * {qn})"
    return f"CASE WHEN {denom} = 0.0D THEN 0.0D ELSE {dot} / {denom} END"


def cell_scores_sql(vec_sql: str, centroids: Sequence[Sequence[float]]) -> str:
    """``array(named_struct('d', dot(v,c)−|c|²/2, 'cell', i), …)`` — the
    scored-cells array of ``ivf_assign_cells`` in one parse. The bias is
    computed in python float arithmetic exactly as ``_cell_score`` does."""
    parts = []
    for i, c in enumerate(centroids):
        bias = sum(x * x for x in c) / 2.0
        parts.append(
            f"named_struct('d', {dot_sql(vec_sql, c)} - {dlit(bias)}, "
            f"'cell', {int(i)})"
        )
    return "array(" + ", ".join(parts) + ")"
