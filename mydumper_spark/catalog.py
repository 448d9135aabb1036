"""Catalog discovery + table-scope filters.

Reference behavior re-expressed here:
- S10 catalog discovery scan — enumerate databases/tables and classify them
  (/root/reference/src/mydumper/mydumper_working_thread.c:247-295, 1149-1284).
- P6 regex table filter (``--regex``) — /root/reference/src/regex.c:96-147.
- P7 skiplist filter (``--omit-from-file``) — /root/reference/src/tables_skiplist.c:35-89.
- P8 explicit table/db lists (``--tables-list`` / ``-B``).
- P9 engine filter (``--ignore-engines``) — mydumper_working_thread.c:1203-1210.
- P12 special/system table filter — mydumper_working_thread.c:253-258.
- O6 chunk-column pick by index cardinality — mydumper_table.c:181-239.

On Spark the "catalog" is driver-side metadata: for the parquet test corpus it
is the directory listing + schema probe; for a JDBC source it is
``information_schema`` queries through the same connection. Filtering is pure
driver logic over that list — cheap, no cluster work.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: system namespaces the reference always skips
#: (mydumper_working_thread.c:253-258, is_mysql_special_tables in common.c)
SPECIAL_SCHEMAS = {"information_schema", "performance_schema", "sys", "mysql", "data_dictionary"}

#: PK registry for the driver-supplied TPC-H-ish corpus; the heuristic below
#: covers tables not listed (reference picks PK > first UNIQUE > highest-
#: cardinality index, mydumper_table.c:181-239).
KNOWN_PRIMARY_KEYS: dict[str, list[str]] = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

_INTEGRAL_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


@dataclass
class TableMeta:
    """Driver-side table descriptor — Spark analogue of ``struct db_table``
    (/root/reference/src/mydumper/mydumper_table.h:29-77)."""

    database: str
    name: str
    path: str | None = None  # parquet path; None for JDBC tables
    engine: str = "parquet"
    primary_key: list[str] = field(default_factory=list)
    schema: T.StructType | None = None
    row_estimate: int | None = None

    @property
    def qualified_name(self) -> str:
        return f"{self.database}.{self.name}"


@dataclass
class TableFilters:
    """The reference's table-scoping CLI surface (P6-P12)."""

    regex: str | None = None  # --regex over "db.table"
    skiplist: set[str] = field(default_factory=set)  # --omit-from-file entries
    tables_list: set[str] | None = None  # --tables-list db.t1,db.t2
    databases: set[str] | None = None  # -B db1,db2
    ignore_engines: set[str] = field(default_factory=set)  # --ignore-engines
    include_special: bool = False
    updated_since_days: float | None = None  # P10 --updated-since

    def admits(self, t: TableMeta) -> bool:
        qn = t.qualified_name
        if not self.include_special and t.database in SPECIAL_SCHEMAS:
            return False
        if self.databases is not None and t.database not in self.databases:
            return False
        if self.tables_list is not None and qn not in self.tables_list:
            return False
        # skiplist matches either "db" or "db.table" (tables_skiplist.c:35-89)
        if t.database in self.skiplist or qn in self.skiplist:
            return False
        if t.engine.lower() in {e.lower() for e in self.ignore_engines}:
            return False
        if self.regex is not None and not re.search(self.regex, qn, re.IGNORECASE):
            return False
        return True


def pick_chunk_column(meta: TableMeta) -> str | None:
    """O6: choose the scan-partitioning column.

    Reference order: PK, else first UNIQUE, else highest-cardinality index
    (mydumper_table.c:181-239); integer keys preferred over string keys for
    chunking (mydumper_chunks.c:142-248). Without index stats we prefer the
    first integral PK column, then any integral ``*key``/``*id`` column, then
    the first string PK column (string chunking is the fallback there too).
    """
    schema = meta.schema
    if schema is None:
        return meta.primary_key[0] if meta.primary_key else None
    by_name = {f.name: f for f in schema.fields}
    for c in meta.primary_key:
        f = by_name.get(c)
        if f is not None and isinstance(f.dataType, _INTEGRAL_TYPES):
            return c
    for f in schema.fields:
        if isinstance(f.dataType, _INTEGRAL_TYPES) and re.search(r"(key|id)$", f.name, re.I):
            return f.name
    if meta.primary_key:
        return meta.primary_key[0]
    return None


class ParquetCatalog:
    """Catalog over a directory of ``<table>.parquet`` files (the driver test
    corpus layout, TESTDATA.md). Mirrors the reference's discovery scan S10:
    enumerate, probe schema, classify — all driver-side."""

    def __init__(self, spark: SparkSession, root: str, database: str = "default"):
        self.spark = spark
        self.root = root
        self.database = database

    def discover(self, filters: TableFilters | None = None) -> list[TableMeta]:
        filters = filters or TableFilters()
        out: list[TableMeta] = []
        for fname in sorted(os.listdir(self.root)):
            if not fname.endswith(".parquet"):
                continue
            name = fname[: -len(".parquet")]
            meta = TableMeta(
                database=self.database,
                name=name,
                path=os.path.join(self.root, fname),
                engine="parquet",
                primary_key=KNOWN_PRIMARY_KEYS.get(name, []),
            )
            if not filters.admits(meta):
                continue
            # P10 freshness filter: the reference checks UPDATE_TIME against
            # NOW() - INTERVAL N DAY (mydumper_start_dump.c:527-548); file
            # mtime is the parquet-side equivalent.
            if filters.updated_since_days is not None:
                import time

                age_days = (time.time() - os.path.getmtime(meta.path)) / 86400.0
                if age_days > filters.updated_since_days:
                    continue
            # schema probe is metadata-only for parquet (footer read, no scan)
            meta.schema = self.spark.read.parquet(meta.path).schema
            if not meta.primary_key:
                meta.primary_key = _guess_primary_key(meta.schema)
            out.append(meta)
        return out

    def read(self, meta: TableMeta) -> DataFrame:
        return self.spark.read.parquet(meta.path)


def _guess_primary_key(schema: T.StructType) -> list[str]:
    for f in schema.fields:
        if re.search(r"(^id$|_id$|key$)", f.name, re.I):
            return [f.name]
    return []


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Convenience: read every table in a testdata scale-factor dir."""
    cat = ParquetCatalog(spark, sf_dir)
    return {m.name: spark.read.parquet(m.path) for m in cat.discover()}
