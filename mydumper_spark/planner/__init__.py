from mydumper_spark.planner.chunks import (  # noqa: F401
    ChunkPlan,
    adaptive_replan,
    chunk_counts,
    estimate_rows,
    plan_chunks,
    plan_integer_chunks,
    plan_multi_column_chunks,
    plan_partition_chunks,
    plan_string_chunks,
    reassemble,
    to_jdbc_options,
)
