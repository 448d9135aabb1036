"""Checksum parity + properties (SURVEY §2.5 A4/A5, §2.9 L9)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from mydumper_spark.functions.checksum import (
    checksum_df,
    oracle_checksum_sql,
    table_checksum,
)


def test_cross_engine_parity(spark, sf_dir):
    for t, fields in {
        "customer": [
            ("c_custkey", "BIGINT"), ("c_name", "VARCHAR"), ("c_nationkey", "INTEGER"),
            ("c_acctbal", "DOUBLE"), ("c_mktsegment", "VARCHAR"),
        ],
        "embeddings": [("vec_id", "BIGINT"), ("embedding", "FLOAT[]"), ("label", "INTEGER")],
    }.items():
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        got = table_checksum(df)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        want = con.sql(oracle_checksum_sql(t, fields)).fetchone()
        assert (got["checksum"], got["rows"]) == want


def test_order_independence(orders):
    a = table_checksum(orders)
    b = table_checksum(orders.orderBy(F.rand(seed=1)))
    assert a == b


def test_detects_single_value_change(spark):
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    df2 = spark.createDataFrame([(1, "a"), (2, "c")], "k int, v string")
    assert table_checksum(df1)["checksum"] != table_checksum(df2)["checksum"]


def test_null_position_matters(spark):
    df1 = spark.createDataFrame([("a", None)], "x string, y string")
    df2 = spark.createDataFrame([(None, "a")], "x string, y string")
    assert table_checksum(df1)["checksum"] != table_checksum(df2)["checksum"]


def test_column_subset(customer):
    full = table_checksum(customer)
    sub = table_checksum(customer, cols=["c_custkey", "c_name"])
    assert full["rows"] == sub["rows"]
    assert full["checksum"] != sub["checksum"]


def test_roundtrip_write_read(spark, customer, tmp_path):
    """The reference's core property: dump → load → checksums agree
    (test_mydumper.sh --checksum-all --checksum=fail)."""
    before = table_checksum(customer)
    path = str(tmp_path / "roundtrip.parquet")
    customer.write.mode("overwrite").parquet(path)
    after = table_checksum(spark.read.parquet(path))
    assert before == after
