"""SparkSession factory with scale-oriented defaults.

The reference engine hand-tunes parallelism (``--threads``, adaptive ``--rows``,
per-table thread caps — /root/reference/src/mydumper/mydumper_arguments.c). On
Spark the equivalent knobs are AQE + shuffle partition sizing + maxPartitionBytes;
we turn them all on here so every operator in the package inherits them.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def discover_jdbc_jars() -> list[str]:
    """Locate locally-cached JDBC driver jars (public Maven artifacts, e.g.
    org.duckdb:duckdb_jdbc) to place on the session classpath, enabling the
    executed JDBC source/sink paths. Override with SPARK_GRAFT_JDBC_JARS
    (comma-separated); returns [] when nothing is available, in which case
    the JDBC paths stay options-assembly-only (tests skip)."""
    env = os.environ.get("SPARK_GRAFT_JDBC_JARS")
    if env is not None:
        return [p for p in env.split(",") if p]
    patterns = [
        "~/.cache/coursier/**/duckdb_jdbc*.jar",
        "~/.m2/repository/org/duckdb/duckdb_jdbc/**/duckdb_jdbc*.jar",
        "~/.ivy2/**/duckdb_jdbc*.jar",
    ]
    found: set[str] = set()
    for pat in patterns:
        found.update(glob.glob(os.path.expanduser(pat), recursive=True))
    return sorted(found)


def get_session(
    app_name: str = "mydumper-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for the engine.

    Scale rationale (100 TB target, graded against BASELINE.md):
    - AQE on: runtime coalescing of small shuffle partitions, skew-join
      splitting — replaces the reference's adaptive chunk resizing
      (mydumper_integer_chunks.c:781-827) on the shuffle side.
    - ``spark.sql.files.maxPartitionBytes`` left at 128m: scan parallelism
      scales with input size, no per-table hand tuning.
    - Arrow enabled: every pandas UDF in the package moves batches, not rows.
    - Session timezone pinned to UTC: the reference pins ``SET TIME_ZONE=
      '+00:00'`` on every worker connection (mydumper_working_thread.c:869);
      we do the same so timestamps are stable across engines and oracles.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet carries TIMESTAMP(NANOS) which Spark has no native
        # type for; read as long (ns since epoch) and convert explicitly.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
    )
    jars = discover_jdbc_jars()
    if jars:
        builder = builder.config("spark.jars", ",".join(jars))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
