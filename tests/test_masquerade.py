"""Masquerade function properties (SURVEY §2.4 T1-T12)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from mydumper_spark.functions import masquerade as mq


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_random_int_length_preserving(spark, customer):
    out = customer.select(
        F.length(F.col("c_custkey").cast("string")).alias("in_len"),
        F.length(mq.random_int(F.col("c_custkey"))).alias("out_len"),
    ).collect()
    assert all(r["in_len"] == r["out_len"] for r in out)


def test_random_string_alpha_and_length(spark, customer):
    out = customer.select(
        F.col("c_name"), mq.random_string(F.col("c_name")).alias("fake")
    ).collect()
    for r in out:
        assert len(r["fake"]) == len(r["c_name"])
        assert re.fullmatch(r"[a-j]+", r["fake"])


def test_with_mem_determinism(spark):
    """T10: equal inputs → equal fakes, across rows and runs."""
    df = spark.createDataFrame([("x",), ("x",), ("y",)], "v string")
    out = df.select(mq.random_string(F.col("v")).alias("f")).collect()
    assert out[0]["f"] == out[1]["f"]
    assert out[0]["f"] != out[2]["f"]


def test_random_uuid_shape(spark):
    v = _one(spark, mq.random_uuid(F.lit("seed-me")))
    assert re.fullmatch(r"[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-a[0-9a-f]{3}-[0-9a-f]{12}", v)


def test_null_propagation(spark):
    df = spark.createDataFrame([(None,)], "v string")
    r = df.select(
        mq.random_int(F.col("v")).alias("i"), mq.random_string(F.col("v")).alias("s")
    ).first()
    assert r["i"] is None and r["s"] is None


def test_random_format_template(spark):
    tpl = [("const", "user-"), ("number", 4), ("const", "@"), ("dict", ["a.com", "b.org"])]
    v = _one(spark, mq.random_format(F.lit("key1"), tpl))
    assert re.fullmatch(r"user-\d{4}@(a\.com|b\.org)", v)


def test_regex_and_apply_and_constant(spark):
    assert _one(spark, mq.regex_replace(F.lit("a1b2"), [("[0-9]", "#")])) == "a#b#"
    assert _one(spark, mq.apply_wrap(F.lit("x"), "p:", ":s")) == "p:x:s"
    assert _one(spark, mq.constant("K")) == "K"
    assert _one(spark, mq.null()) is None


def test_replace_null_and_max_length(spark):
    df = spark.createDataFrame([(None,), ("abcdef",)], "v string")
    out = df.select(
        mq.replace_null(F.col("v"), F.lit("filled")).alias("r"),
        mq.max_length(F.col("v"), 3).alias("m"),
    ).collect()
    assert out[0]["r"] == "filled"
    assert out[1]["m"] == "abc"


def test_unique_modifier(spark):
    df = spark.createDataFrame([("same",), ("same",), ("same",)], "v string")
    out = df.select(mq.unique(F.col("v"), F.lit("gen")).alias("u")).collect()
    assert len({r["u"] for r in out}) == 3


def test_apply_pipeline(customer):
    out = mq.apply_pipeline(
        customer,
        {
            "c_name": [("regex", {"pairs": [("Customer", "C")]}), ("apply", {"prefix": "m:"})],
            "c_mktsegment": [("constant", {"value": "X"})],
        },
    )
    r = out.first()
    assert r["c_name"].startswith("m:")
    assert r["c_mktsegment"] == "X"
