from mydumper_spark.sources.jdbc_source import (  # noqa: F401
    JdbcSourceConfig,
    SnapshotError,
    SnapshotResult,
    build_jdbc_reader_args,
    establish_consistent_snapshot,
)
from mydumper_spark.sources.dump_reader import read_dump_table, read_dump_dir  # noqa: F401
from mydumper_spark.sources.insert_parser import parse_tuples, read_insert_sql, typed_from_strings  # noqa: F401
