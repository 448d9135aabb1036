"""Projection / predicate / row-transform pipeline (SURVEY §2.3 P1-P5, §2.4).

Reference semantics being re-expressed:
- P1 global ``--where`` predicate, ANDed with per-table where and chunk WHERE
  (/root/reference/src/mydumper/mydumper_write.c:1048-1057)
- P2 per-table where/limit from defaults file (/root/reference/src/common.c:199-280)
- P3 generated-column pruning → explicit select list
  (/root/reference/src/mydumper/mydumper_table.c:263-322)
- P4 ``columns_on_select_replace`` — arbitrary SQL expression replacing a
  column in the SELECT (server-side masking, mydumper_table.c:351-367)
- P5 explicit select/insert column lists (mydumper_table.c:463-483)
- O1 ``--order-by-primary`` (mydumper_write.c:1055)
- O3 per-table LIMIT (mydumper_write.c:1056)

All declarative: Catalyst pushes the filter and the pruned projection into
the scan (verify with ``.explain``: PushedFilters / ReadSchema), so the same
pipeline definition is optimal on parquet and on JDBC.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class TableTransform:
    """Per-table transform config — the engine's equivalent of the reference's
    ``conf_per_table`` entry (common.h:58-68)."""

    where: str | None = None  # P2 per-table predicate
    limit: int | None = None  # P2/O3
    select_columns: list[str] | None = None  # P5 columns_on_select
    select_replace: dict[str, str] = field(default_factory=dict)  # P4 col → SQL expr
    masquerade: dict[str, list] = field(default_factory=dict)  # §2.4 pipelines
    order_by_primary: bool = False  # O1
    primary_key: list[str] = field(default_factory=list)
    #: P11 object_to_export toggles (common.c:1540-1570): which artifact
    #: classes this table contributes (DATA = rows, SCHEMA = DDL/manifest
    #: schema entry, TRIGGER = post-phase objects)
    object_scope: set[str] = field(default_factory=lambda: {"DATA", "SCHEMA", "TRIGGER"})


def apply_transform(
    df: DataFrame, tt: TableTransform | None = None, global_where: str | None = None
) -> DataFrame:
    """Compose the full scan-side pipeline in the reference's order:
    chunk/global/table predicates → projection (with replacements) →
    masquerade → order → limit (mydumper_write.c:1035-1108)."""
    from mydumper_spark.functions import masquerade as mq

    tt = tt or TableTransform()
    out = df
    if global_where:  # P1
        out = out.where(global_where)
    if tt.where:  # P2
        out = out.where(tt.where)

    cols = tt.select_columns if tt.select_columns is not None else [f.name for f in df.schema.fields]
    projection = []
    for c in cols:
        if c in tt.select_replace:  # P4
            projection.append(F.expr(tt.select_replace[c]).alias(c))
        else:
            projection.append(F.col(c))
    out = out.select(*projection)

    if tt.masquerade:  # §2.4
        out = mq.apply_pipeline(out, tt.masquerade)
    if tt.order_by_primary and tt.primary_key:  # O1
        # chunk == partition in our model, so per-chunk PK order is
        # sortWithinPartitions; a global orderBy would add a useless
        # full-table shuffle the reference never does either.
        out = out.sortWithinPartitions(*tt.primary_key)
    if tt.limit is not None:  # O3
        out = out.limit(tt.limit)
    return out
