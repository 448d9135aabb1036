from mydumper_spark.plans.loader_dag import (  # noqa: F401
    LoaderDag,
    LoadJob,
    Phase,
    PurgeMode,
    TableState,
)
