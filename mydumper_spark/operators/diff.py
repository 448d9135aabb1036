"""Snapshot diff — compare two dump generations row-by-row.

The reference's workflow produces periodic full dumps (daemon mode,
mydumper_daemon.c) and verifies restores by checksum (L9); the natural next
question — *what changed between snapshot N and N+1* — is answered here:
``snapshot_diff(old, new, pk)`` emits one row per differing primary key with
a status of ``added`` / ``deleted`` / ``changed``.

Spark-first shape: both sides reduce to (pk, row_digest) — the digest is the
same md5-of-canonical-row used by the A4 checksum
(functions/checksum.py:portable_checksum), computed scan-side so the full
row never crosses the wire — then ONE full outer join on pk. Cost: two
narrow scans + one shuffle of (pk, 8-byte digest) pairs. At 100 TB the
comparison traffic is keys + digests, ~1% of table bytes; row payloads are
only re-read for the rows a consumer asks to materialize afterwards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mydumper_spark.functions.checksum import portable_checksum


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    pk_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """(pk..., status) for every key that differs between the snapshots.

    ``compare_cols`` restricts the change detection to a column subset
    (default: all non-pk columns in ``old``'s schema order)."""
    cols = compare_cols or [c for c in old.columns if c not in pk_cols]
    o = old.select(
        *[F.col(k) for k in pk_cols], portable_checksum(old, cols).alias("__d_old")
    )
    n = new.select(
        *[F.col(k) for k in pk_cols], portable_checksum(new, cols).alias("__d_new")
    )
    j = o.join(n, pk_cols, "full_outer")
    status = (
        F.when(F.col("__d_old").isNull(), F.lit("added"))
        .when(F.col("__d_new").isNull(), F.lit("deleted"))
        .when(F.col("__d_old") != F.col("__d_new"), F.lit("changed"))
    )
    return (
        j.withColumn("status", status)
        .where(F.col("status").isNotNull())
        .select(*pk_cols, "status")
    )


def apply_diff(
    old: DataFrame,
    new: DataFrame,
    diff: DataFrame,
    pk_cols: list[str],
) -> DataFrame:
    """Merge: apply a :func:`snapshot_diff` result to ``old`` so it becomes
    ``new`` — the restore-side incremental load (only changed rows are read
    from the new snapshot, the unchanged bulk stays put).

    Plan shape: ``old`` drops deleted+changed keys (broadcast-able anti join
    when the diff is small — the usual case for incremental loads), then
    unions the added+changed rows pulled from ``new`` via a semi join. Rows
    move proportionally to the CHANGE volume, not the table size."""
    dels = diff.where(F.col("status").isin("deleted", "changed")).select(*pk_cols)
    adds = diff.where(F.col("status").isin("added", "changed")).select(*pk_cols)
    kept = old.join(F.broadcast(dels), pk_cols, "left_anti")
    pulled = new.join(F.broadcast(adds), pk_cols, "left_semi")
    return kept.unionByName(pulled)
