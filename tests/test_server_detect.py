"""Server product/dialect classification (reference server_detect.c:1-282)."""

from __future__ import annotations

from mydumper_spark.sources.server_detect import (
    ServerDialect,
    ServerProduct,
    detect_product,
    dialect_from_probe,
    parse_version,
)


def test_product_precedence():
    # Percona's version_comment contains "mysql" too — specific forks win
    assert detect_product("Percona Server (GPL)", "8.0.36-28") is ServerProduct.PERCONA
    assert detect_product("mariadb.org binary distribution", "10.11.6-MariaDB") is ServerProduct.MARIADB
    assert detect_product(None, "8.0.11-TiDB-v7.5.0") is ServerProduct.TIDB
    assert detect_product("Dolt", "8.0.33") is ServerProduct.DOLT
    assert detect_product("(Google)", "8.0.31-google") is ServerProduct.GOOGLE
    assert detect_product("MySQL Community Server - GPL", "8.4.0") is ServerProduct.MYSQL
    # "Source distribution" builds classify as MySQL (server_detect.c:99-101)
    assert detect_product("Source distribution", "8.0.40") is ServerProduct.MYSQL
    assert detect_product(None, None) is ServerProduct.UNKNOWN


def test_parse_version():
    assert parse_version("10.11.6-MariaDB-log") == (10, 11, 6)
    assert parse_version("8.0.22") == (8, 0, 22)
    assert parse_version("8.4") == (8, 4, 0)
    assert parse_version(None) == (0, 0, 0)
    assert parse_version("garbage") == (0, 0, 0)


def test_replica_spelling_boundaries():
    # MySQL: SLAVE→REPLICA at exactly 8.0.22 (server_detect.c:224-236)
    old = dialect_from_probe("MySQL", "8.0.21")
    new = dialect_from_probe("MySQL", "8.0.22")
    assert old.start_replica == "START SLAVE"
    assert new.start_replica == "START REPLICA"
    assert old.show_replica_status == "SHOW SLAVE STATUS"
    assert new.change_replication_source == "CHANGE REPLICATION SOURCE TO"
    # MASTER→BINARY LOG status at 8.2
    assert dialect_from_probe("MySQL", "8.1.0").show_binary_log_status == "SHOW MASTER STATUS"
    assert dialect_from_probe("MySQL", "8.2.0").show_binary_log_status == "SHOW BINARY LOG STATUS"


def test_mariadb_spellings():
    d105 = dialect_from_probe("mariadb", "10.5.2")
    d106 = dialect_from_probe("mariadb", "10.6.0")
    assert d105.start_replica == "START SLAVE"
    assert d106.start_replica == "START REPLICA"
    # MariaDB renamed SHOW MASTER STATUS at 10.5.2, keeps CHANGE MASTER
    assert d105.show_binary_log_status == "SHOW BINLOG STATUS"
    assert dialect_from_probe("mariadb", "10.5.1").show_binary_log_status == "SHOW MASTER STATUS"
    assert d106.change_replication_source == "CHANGE MASTER TO"


def test_capability_gates():
    assert dialect_from_probe("MySQL", "8.0.36").is_mysql_like
    assert dialect_from_probe("Percona", "8.0.36").supports_tablespaces
    assert not dialect_from_probe("mariadb", "10.11.6").supports_tablespaces
    assert not dialect_from_probe(None, "clickhouse 24.1.1").is_mysql_like


def test_case_sensitivity_wrap():
    folded = ServerDialect(ServerProduct.MYSQL, 8, 0, 36, lower_case_table_names=True)
    exact = ServerDialect(ServerProduct.MYSQL, 8, 0, 36, lower_case_table_names=False)
    assert folded.case_sensitive_wrap == ("CAST(", " AS BINARY)")
    assert exact.case_sensitive_wrap == ("", "")


def test_snapshot_strategy():
    assert dialect_from_probe("MySQL", "8.0.36").snapshot_strategy == "ftwrl_or_gtid"
    assert dialect_from_probe("mariadb", "10.4.0").snapshot_strategy == "backup_stage"
    assert dialect_from_probe("mariadb", "10.3.9").snapshot_strategy == "ftwrl_or_gtid"
    assert dialect_from_probe(None, "8.0.11-TiDB-v7.5.0").snapshot_strategy == "tidb_snapshot"
    assert dialect_from_probe("duckdb", "1.0.0").snapshot_strategy == "none"
