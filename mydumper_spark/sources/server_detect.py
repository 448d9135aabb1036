"""Server product/dialect detection (SURVEY §2.1; reference
/root/reference/src/server_detect.c:1-282).

The reference classifies the server (MySQL / Percona / MariaDB / TiDB / Dolt /
ClickHouse / RDS / Google / unknown) from ``@@version_comment`` +
``@@version`` substrings, with fallback probes for ClickHouse
(``system.build_options``) and Aurora (``aurora_version``), then switches the
SQL dialect it speaks: replica-control statement spellings
(``START SLAVE`` vs ``START REPLICA``, ``SHOW MASTER STATUS`` vs
``SHOW BINARY LOG STATUS`` — server_detect.c:183-248), case-sensitivity
wrappers from ``@@lower_case_table_names`` (``:166-180``), and capability
gates (tablespace support, mysql-likeness — ``:70-76``).

Spark-first re-expression: detection is pure string classification on the
driver (no per-row work), and the chosen ``ServerDialect`` feeds the JDBC
source/sink option builders (``jdbc_source.py`` / ``jdbc_sink.py``) the same
way the reference's globals feed its connection setup. The probe execution
path runs through ``spark.read.jdbc`` with a one-row query, so it works
against any JDBC-reachable engine; tests exercise it live against DuckDB.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from enum import Enum


class ServerProduct(Enum):
    MYSQL = "MySQL"
    PERCONA = "Percona"
    MARIADB = "MariaDB"
    TIDB = "TiDB"
    DOLT = "Dolt"
    GOOGLE = "Google"
    RDS = "RDS"
    CLICKHOUSE = "Clickhouse"
    DUCKDB = "DuckDB"
    UNKNOWN = "unknown"


# Detection precedence mirrors server_detect.c:79-103 — more specific forks
# first (a Percona build's version_comment also contains "mysql").
_PRODUCT_MARKERS: list[tuple[str, ServerProduct]] = [
    ("percona", ServerProduct.PERCONA),
    ("mariadb", ServerProduct.MARIADB),
    ("tidb", ServerProduct.TIDB),
    ("dolt", ServerProduct.DOLT),
    ("google", ServerProduct.GOOGLE),
    ("clickhouse", ServerProduct.CLICKHOUSE),
    ("duckdb", ServerProduct.DUCKDB),
    ("mysql", ServerProduct.MYSQL),
    ("source", ServerProduct.MYSQL),  # "Source distribution" builds
]


def detect_product(version_comment: str | None, version: str | None) -> ServerProduct:
    """Classify from the two version strings (server_detect.c:79-103)."""
    hay = f"{version_comment or ''} {version or ''}".lower()
    for marker, product in _PRODUCT_MARKERS:
        if marker in hay:
            return product
    return ServerProduct.UNKNOWN


def parse_version(version: str | None) -> tuple[int, int, int]:
    """``"10.11.6-MariaDB-log"`` → ``(10, 11, 6)`` (server_detect.c:105-109:
    strtol per dot-segment, trailing junk ignored, absent → 0)."""
    if not version:
        return (0, 0, 0)
    parts = (version.split(".") + ["0", "0", "0"])[:3]
    out = []
    for p in parts:
        m = re.match(r"\s*(\d+)", p)
        out.append(int(m.group(1)) if m else 0)
    return tuple(out)  # type: ignore[return-value]


@dataclass(frozen=True)
class ServerDialect:
    """The dialect switches the reference derives from (product, version)."""

    product: ServerProduct
    major: int = 0
    secondary: int = 0
    revision: int = 0
    lower_case_table_names: bool = False

    # --- capability gates (server_detect.c:70-76) ---
    @property
    def is_mysql_like(self) -> bool:
        return self.product in (
            ServerProduct.MYSQL, ServerProduct.PERCONA, ServerProduct.MARIADB,
            ServerProduct.DOLT, ServerProduct.RDS, ServerProduct.GOOGLE,
            ServerProduct.UNKNOWN,
        )

    @property
    def supports_tablespaces(self) -> bool:
        return self.product in (
            ServerProduct.MYSQL, ServerProduct.PERCONA, ServerProduct.RDS,
            ServerProduct.UNKNOWN,
        )

    # --- replica-control spellings (server_detect.c:183-248) ---
    @property
    def _modern_replica_words(self) -> bool:
        """MySQL-family ≥ 8.0.22 and MariaDB ≥ 10.6 renamed SLAVE→REPLICA."""
        v = (self.major, self.secondary, self.revision)
        if self.product == ServerProduct.MARIADB:
            return v >= (10, 6, 0)
        if self.product == ServerProduct.DOLT:
            return v >= (8, 0, 0)
        return v >= (8, 0, 22)

    @property
    def start_replica(self) -> str:
        return "START REPLICA" if self._modern_replica_words else "START SLAVE"

    @property
    def stop_replica(self) -> str:
        return "STOP REPLICA" if self._modern_replica_words else "STOP SLAVE"

    @property
    def show_replica_status(self) -> str:
        return "SHOW REPLICA STATUS" if self._modern_replica_words else "SHOW SLAVE STATUS"

    @property
    def show_binary_log_status(self) -> str:
        v = (self.major, self.secondary, self.revision)
        if self.product == ServerProduct.MARIADB:
            # MariaDB renamed MASTER→BINLOG at 10.5.2 (server_detect.c:200-204)
            return "SHOW BINLOG STATUS" if v >= (10, 5, 2) else "SHOW MASTER STATUS"
        # MySQL renamed at 8.2 (server_detect.c:230-231)
        return "SHOW BINARY LOG STATUS" if v >= (8, 2, 0) else "SHOW MASTER STATUS"

    @property
    def change_replication_source(self) -> str:
        return (
            "CHANGE REPLICATION SOURCE TO"
            if self._modern_replica_words and self.product != ServerProduct.MARIADB
            else "CHANGE MASTER TO"
        )

    # --- case-sensitivity wrappers (server_detect.c:166-180) ---
    @property
    def case_sensitive_wrap(self) -> tuple[str, str]:
        """(prefix, suffix) to force binary comparison of object names when
        the server folds case; empty when names are already case-sensitive."""
        if self.lower_case_table_names:
            return ("CAST(", " AS BINARY)")
        return ("", "")

    # --- lock strategy (consumed by the snapshot fence in jdbc_source) ---
    @property
    def snapshot_strategy(self) -> str:
        """Which table-wide consistency fence applies (SURVEY §4.2):
        MariaDB ≥ 10.4 has BACKUP STAGE, TiDB is snapshot-everywhere (no
        fence), ClickHouse/DuckDB have no binlog fence at all; everyone else
        gets FTWRL-or-GTID."""
        if self.product == ServerProduct.TIDB:
            return "tidb_snapshot"
        if self.product == ServerProduct.MARIADB and (
            self.major, self.secondary) >= (10, 4):
            return "backup_stage"
        if self.product in (ServerProduct.CLICKHOUSE, ServerProduct.DUCKDB):
            return "none"
        return "ftwrl_or_gtid"


# --- probe plumbing -------------------------------------------------------

PRIMARY_PROBE = "SELECT @@version_comment AS version_comment, @@version AS version"
CLICKHOUSE_PROBE = (
    "SELECT value FROM system.build_options WHERE name='VERSION_FULL' LIMIT 1"
)
AURORA_PROBE = "SHOW GLOBAL VARIABLES LIKE 'aurora_version'"
GENERIC_PROBE = "SELECT version() AS version"
LOWER_CASE_PROBE = "SELECT @@lower_case_table_names"


def dialect_from_probe(
    version_comment: str | None,
    version: str | None,
    lower_case_table_names: bool = False,
) -> ServerDialect:
    product = detect_product(version_comment, version)
    major, secondary, revision = parse_version(version)
    return ServerDialect(
        product=product,
        major=major,
        secondary=secondary,
        revision=revision,
        lower_case_table_names=lower_case_table_names,
    )


def detect_via_jdbc(spark, url: str, properties: dict[str, str]) -> ServerDialect:
    """Execute the probe over a live JDBC connection via a one-row
    ``spark.read.jdbc`` subquery — the executable analogue of
    ``detect_server_version`` (server_detect.c:112-163).

    URL-scheme shortcut first (``jdbc:duckdb:`` needs no server round-trip
    for product), then the generic ``version()`` probe fills the version
    triple. MySQL-family probes (``@@version_comment``) are attempted only
    for mysql-like URLs, since other engines reject the syntax."""
    scheme = url.split(":")[1].lower() if url.count(":") >= 2 else ""
    probe = PRIMARY_PROBE if scheme in ("mysql", "mariadb") else GENERIC_PROBE
    row = (
        spark.read.jdbc(url=url, table=f"({probe}) AS v", properties=properties)
        .first()
    )
    if probe is PRIMARY_PROBE:
        comment, version = row["version_comment"], row["version"]
    else:
        comment, version = scheme, row["version"]
    d = dialect_from_probe(comment, version.lstrip("v") if version else version)
    if d.product is ServerProduct.UNKNOWN and scheme:
        d = ServerDialect(
            product=detect_product(scheme, None),
            major=d.major, secondary=d.secondary, revision=d.revision,
        )
    return d
