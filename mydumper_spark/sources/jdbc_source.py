"""JDBC partitioned source (SURVEY §2.1 S1-S2, §4.2 consistency S11).

This module builds ``spark.read.jdbc`` invocations from chunk plans. There is
no live database in the test environment, so everything here is pure
option/SQL construction (unit-tested); the semantics it encodes:

- S1/S2: one JDBC partition per chunk predicate — Spark opens one connection
  per partition and pushes the predicate into each SELECT, which is exactly
  the reference's one-SELECT-per-chunk execution
  (/root/reference/src/mydumper/mydumper_write.c:1035-1108).
- fetchsize ↔ the reference's row streaming via mysql_use_result
  (/root/reference/src/common.c:1741-1750): without it the MySQL JDBC driver
  buffers whole result sets.
- sessionInitStatement ↔ the reference's per-worker session setup:
  ``SET TIME_ZONE='+00:00'`` + consistent snapshot start
  (mydumper_working_thread.c:453-531, 869).

S11 consistency: Spark's JDBC partitions are independent connections, so a
REPEATABLE-READ snapshot per connection does NOT yield one table-wide
snapshot. The reference solves this with a global fence (FTWRL / BACKUP
STAGE) or GTID equality. Our design (documented contract, verifiable once a
live MySQL exists):
 1. every partition runs sessionInitStatement
    ``SET SESSION TRANSACTION ISOLATION LEVEL REPEATABLE READ;
    START TRANSACTION WITH CONSISTENT SNAPSHOT``;
 2. the driver reads ``gtid_executed`` before submitting and after all
    partitions opened (first row fetched), and
 3. if the two GTID sets differ, the read is retried — the reference's
    ``--no-locks`` GTID-compare mode (mydumper_start_dump.c:1389-1417).
The fence variant (FLUSH TABLES WITH READ LOCK around partition open) is the
strict fallback, issued by the driver over a separate control connection.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from mydumper_spark.planner.chunks import ChunkPlan

CONSISTENT_SNAPSHOT_INIT = (
    "SET SESSION TRANSACTION ISOLATION LEVEL REPEATABLE READ; "
    "SET TIME_ZONE='+00:00'; "
    "START TRANSACTION WITH CONSISTENT SNAPSHOT"
)


@dataclass
class JdbcSourceConfig:
    url: str
    user: str = ""
    password: str = ""
    fetchsize: int = 10_000
    consistent_snapshot: bool = True
    extra: dict[str, str] = field(default_factory=dict)

    def properties(self) -> dict[str, str]:
        props = {
            "user": self.user,
            "password": self.password,
            "fetchsize": str(self.fetchsize),
            # stream rows instead of buffering the whole chunk (MySQL
            # Connector/J needs Integer.MIN_VALUE OR useCursorFetch)
            "useCursorFetch": "true",
        }
        if self.consistent_snapshot:
            props["sessionInitStatement"] = CONSISTENT_SNAPSHOT_INIT
        props.update(self.extra)
        return props


def build_jdbc_reader_args(
    cfg: JdbcSourceConfig,
    table: str,
    plan: ChunkPlan | None = None,
    select: list[str] | None = None,
    where: str | None = None,
) -> dict:
    """Render (cfg, table, plan, projection, predicate) into kwargs for
    ``spark.read.jdbc``. Projection/filter are folded into a dbtable
    subquery so they execute server-side even for drivers without V2
    pushdown — the reference's approach of building them into the SELECT
    (mydumper_write.c:1048-1057)."""
    props = cfg.properties()
    cols = ", ".join(select) if select else "*"
    base = table if (select is None and where is None) else (
        f"(SELECT {cols} FROM {table}" + (f" WHERE {where}" if where else "") + ") AS sub"
    )
    if plan is None or not plan.predicates:
        return {"url": cfg.url, "table": base, "properties": props}
    if plan.strategy == "integer" and plan.boundaries:
        return {
            "url": cfg.url,
            "table": base,
            "column": plan.column,
            "lowerBound": int(plan.boundaries[0]),
            "upperBound": int(plan.boundaries[-1]) + 1,
            "numPartitions": plan.num_chunks,
            "properties": props,
        }
    return {"url": cfg.url, "table": base, "predicates": list(plan.predicates), "properties": props}


def gtid_check_sql() -> tuple[str, str]:
    """The pair of driver-side probes for S11 GTID-equality verification."""
    return (
        "SELECT @@global.gtid_executed",
        "SELECT BINLOG_GTID_POS(@@gtid_binlog_pos)",  # MariaDB variant
    )
