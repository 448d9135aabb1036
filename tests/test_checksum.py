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


def test_xxhash64_fast_path_same_detection_power(spark, customer, tmp_path):
    """The xxhash64 production path must behave exactly like the md5 spec
    for every property a manifest consumer relies on: roundtrip-stable,
    order-independent, and tamper-detecting — only the hash values differ."""
    fast = table_checksum(customer, algorithm="xxhash64")
    spec = table_checksum(customer)
    assert fast["rows"] == spec["rows"]
    assert fast["checksum"] != spec["checksum"]  # different algorithms
    assert table_checksum(customer.orderBy(F.rand(seed=2)),
                          algorithm="xxhash64") == fast
    path = str(tmp_path / "rt.parquet")
    customer.write.mode("overwrite").parquet(path)
    assert table_checksum(spark.read.parquet(path),
                          algorithm="xxhash64") == fast
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    df2 = spark.createDataFrame([(1, "a"), (2, "c")], "k int, v string")
    assert (table_checksum(df1, algorithm="xxhash64")["checksum"]
            != table_checksum(df2, algorithm="xxhash64")["checksum"])
    with pytest.raises(ValueError, match="unknown checksum algorithm"):
        table_checksum(df1, algorithm="crc32")


def test_manifest_records_and_verify_honors_algorithm(spark, customer, tmp_path):
    """A manifest written with the xxhash64 default records the algorithm
    and verify_manifest recomputes with it (ok=True); an md5 manifest over
    the same data verifies too — and tampering the data fails both."""
    import json
    import os

    from mydumper_spark.sinks.manifest import (
        Manifest, read_manifest, verify_manifest, write_manifest,
    )

    for algo in ("xxhash64", "md5"):
        root = str(tmp_path / algo)
        data_path = os.path.join(root, "customer.parquet")
        customer.write.mode("overwrite").parquet(data_path)
        m = Manifest(algorithm=algo)
        m.add_table(spark.read.parquet(data_path), "customer", data_path)
        m.finish()
        write_manifest(m, root)
        assert read_manifest(root)["config"]["checksum_algorithm"] == algo
        assert verify_manifest(spark, root)["customer"]["ok"] is True
        # tamper: drop a row and rewrite — recorded checksum must now fail
        # (materialize first: Spark can't overwrite a path it is reading)
        tampered = spark.read.parquet(data_path).where("c_custkey <> 1").collect()
        spark.createDataFrame(tampered, customer.schema).write.mode(
            "overwrite"
        ).parquet(data_path)
        assert verify_manifest(spark, root)["customer"]["ok"] is False
    # legacy manifest with no algorithm field defaults to md5
    root = str(tmp_path / "legacy")
    data_path = os.path.join(root, "customer.parquet")
    customer.write.mode("overwrite").parquet(data_path)
    m = Manifest(algorithm="md5")
    m.add_table(spark.read.parquet(data_path), "customer", data_path)
    m.finish()
    mpath = write_manifest(m, root)
    doc = json.load(open(mpath))
    del doc["config"]["checksum_algorithm"]
    json.dump(doc, open(mpath, "w"))
    assert verify_manifest(spark, root)["customer"]["ok"] is True


def test_sql_canon_equals_column_canon(spark):
    """r14: canonical_row_string is rendered as ONE SQL expr (a single
    parser round-trip instead of ~4 py4j calls per field). _canon_sql must
    mirror _canon_col case for case — pinned here over a frame exercising
    every dispatch arm (double rounding, float array, string array, plain
    casts, NULLs in both value and nullmap positions)."""
    from pyspark.sql import functions as F

    from mydumper_spark.functions.checksum import (
        SEP, _canon_col, canonical_row_string,
    )

    df = spark.createDataFrame(
        [
            (1, 1.2345678, [1.5, None, -0.0000004], ["a", None], "x"),
            (2, None, None, [], None),
            (None, -9.9999995, [float("inf")], ["", ","], ""),
        ],
        "i bigint, d double, af array<double>, "
        "astr array<string>, s string",
    )

    def column_form(frame):
        fields = frame.schema.fields
        parts = [_canon_col(f) for f in fields]
        nullmap = F.concat(*[
            F.when(F.col(f.name).isNull(), F.lit("1")).otherwise(F.lit("0"))
            for f in fields
        ])
        return F.concat_ws(SEP, *parts, nullmap)

    rows = df.select(
        canonical_row_string(df).alias("sql_form"),
        column_form(df).alias("col_form"),
    ).collect()
    assert rows and all(r["sql_form"] == r["col_form"] for r in rows)
