"""Referential-integrity audit — the restore-side cross-table verification.

The reference verifies a restore per-table (checksums, L9 —
manifest.py/checksum.py); the question it cannot answer is whether the
RELATIONSHIPS survived: does every ``orders.o_custkey`` still resolve to a
``customer`` row after a partial/filtered/incremental load? A mydumper user
restoring with ``--tables-list`` or ``--where`` hits this immediately.

``fk_orphans`` audits one edge; ``integrity_report`` audits a whole edge
list into one tiny (edge, n_rows, n_orphans) frame.

Plan shape: per edge, ONE left-anti join child→parent on the key. The
parent side is reduced to its distinct key column before the join (narrow
scan, pushed projection); when the parent key set is small it broadcasts,
otherwise it's a plain shuffled anti join — either way rows that cross the
wire are keys, never payloads. NULL FKs are not orphans (SQL semantics:
a NULL FK is absent, not dangling)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_orphans(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """Child rows whose non-NULL ``child_key`` has no match in
    ``parent.parent_key``."""
    keys = parent.select(F.col(parent_key).alias(child_key)).distinct()
    return child.where(F.col(child_key).isNotNull()).join(
        keys, child_key, "left_anti"
    )


def integrity_report(
    edges: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """(edge, n_rows, n_orphans) for each (name, child, child_key, parent,
    parent_key) edge — the one-glance post-restore integrity summary."""
    out = None
    for name, child, ck, parent, pk in edges:
        rows = child.agg(F.count(F.lit(1)).alias("n_rows")).select(
            F.lit(name).alias("edge"), "n_rows"
        )
        orphans = fk_orphans(child, parent, ck, pk).agg(
            F.count(F.lit(1)).alias("n_orphans")
        )
        piece = rows.crossJoin(orphans)
        out = piece if out is None else out.unionAll(piece)
    return out
