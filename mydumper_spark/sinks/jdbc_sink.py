"""Restore-side JDBC sink (SURVEY §2.2 K11, §2.9 L2-L5, L12).

The reference's myloader executes INSERT / LOAD DATA over a pool of MySQL
connections with re-batching and transaction batching:

- K11 parallel DB sink            — /root/reference/src/myloader/myloader_restore.c (~1066 LoC)
- L2 per-table thread cap          — myloader_worker_loader_main.c:73-128
- L3 purge modes                   — myloader_restore_job.c:44, 120-160, 370-410
- L4 INSERT re-batching (--rows)   — myloader_restore.c:456-543
- L5 transaction batching          — myloader_restore.c:444-513
- L12 replication control          — myloader_common.c (record-only here)

Spark-first re-expression: ``df.write.jdbc`` already is a parallel
connection-pool writer — one connection per partition, batched
``executeBatch`` inserts, one transaction per partition. The reference's
knobs map 1:1 onto JDBC writer options, built here (pure option
construction: no live database exists in the test environment, so this
module is unit-tested at the option level, same as the reader side).

At 100 TB the knob that matters is ``numPartitions`` (the L2 per-table
connection cap — without it a 4000-task write opens 4000 connections and
the target falls over) plus ``batchsize`` and MySQL's
``rewriteBatchedStatements=true``, which turns a 10k-row executeBatch into
one multi-row INSERT — the exact statement shape the reference emits (K1).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from mydumper_spark.plans.loader_dag import PurgeMode


@dataclass
class JdbcSinkConfig:
    url: str
    user: str = ""
    password: str = ""
    #: L4 --rows re-batching: rows per executeBatch round-trip
    batchsize: int = 1_000
    #: L2 max_threads_per_table: cap on concurrent connections per table
    num_partitions: int | None = None
    #: L5 transaction batching: isolation of the per-partition transaction.
    #: NONE = autocommit (the reference's --skip-transactions mode)
    isolation_level: str = "READ_UNCOMMITTED"
    #: L3 purge mode (DROP→overwrite, TRUNCATE→overwrite+truncate,
    #: SKIP→ignore, FAIL→errorifexists, DELETE→append-after-delete)
    purge: PurgeMode = PurgeMode.DROP
    extra: dict[str, str] = field(default_factory=dict)

    def properties(self) -> dict[str, str]:
        props = {
            "user": self.user,
            "password": self.password,
            "batchsize": str(self.batchsize),
            "isolationLevel": self.isolation_level,
        }
        # one multi-row INSERT per batch — the reference's K1 statement
        # shape (mydumper_write.c:874-1032). MySQL Connector/J-only flag;
        # other drivers (DuckDB) hard-error on unknown properties.
        scheme = self.url.split(":")[1].lower() if self.url.count(":") >= 2 else ""
        if scheme in ("mysql", "mariadb"):
            props["rewriteBatchedStatements"] = "true"
        if self.num_partitions is not None:
            props["numPartitions"] = str(self.num_partitions)
        if self.purge == PurgeMode.TRUNCATE:
            # overwrite-without-DROP: keeps grants/triggers, like the
            # reference's TRUNCATE purge (myloader_restore_job.c:120-160)
            props["truncate"] = "true"
        props.update(self.extra)
        return props


def write_jdbc(df: DataFrame, cfg: JdbcSinkConfig, table: str) -> None:
    """K11: parallel JDBC load of one table, purge-mode aware."""
    out = df
    if cfg.num_partitions is not None and df.rdd.getNumPartitions() > cfg.num_partitions:
        out = df.coalesce(cfg.num_partitions)  # narrow: no shuffle
    out.write.mode(cfg.purge.spark_mode).jdbc(cfg.url, table, properties=cfg.properties())


def replication_section(
    binlog_file: str | None = None,
    binlog_pos: int | None = None,
    gtid_executed: str | None = None,
) -> dict:
    """L12 record-only: the [source]/[replication] manifest section the
    reference writes (mydumper_working_thread.c:534-673) and myloader replays
    as CHANGE REPLICATION SOURCE. Analytics parity keeps the record, not the
    replay."""
    return {
        k: v
        for k, v in {
            "file": binlog_file,
            "position": binlog_pos,
            "executed_gtid_set": gtid_executed,
        }.items()
        if v is not None
    }
