"""Shared execution utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Parallelism floor for heavy per-row compute.

    A small table often arrives as one file with one row group → one scan
    partition, which serializes hashing/shingling on a single core no matter
    how many are available. Repartition up-front when (and only when) the
    source has fewer splits than cores: the shuffle moves at most what one
    core would otherwise chew through alone, and on any well-formed large
    source (many files / row groups) this is a no-op — the per-table
    parallelism-cap logic of the reference (mydumper_chunks.c:400-412),
    inverted into a floor."""
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
