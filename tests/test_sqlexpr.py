"""Pin the sqlexpr SQL-text renderers bit-identical to the Column-builder
twins they replaced (r15: one F.expr parse instead of hundreds of py4j
round trips per literal-inlined expression)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mydumper_spark.sqlexpr import (
    cell_scores_sql,
    cosine_const_sql,
    darr,
    dlit,
    dot_sql,
    qcol,
)


def _vec(seed: int, dim: int = 8) -> list[float]:
    # awkward doubles: tiny, huge, negative, non-terminating binary
    return [
        ((seed * 31 + i) % 7 - 3) * (10.0 ** ((i % 9) - 4)) / 3.0
        for i in range(dim)
    ]


def test_double_literal_round_trip(spark):
    vals = [0.1, -0.0, 1e-300, 5e-324, 1.7976931348623157e308,
            2 / 3, -1.2345678901234567e-5, 123456789.123456789]
    row = spark.range(1).select(
        *[F.expr(dlit(v)).alias(f"c{i}") for i, v in enumerate(vals)]
    ).first()
    for i, v in enumerate(vals):
        got = row[i]
        assert got == v and math.copysign(1, got) == math.copysign(1, v)


def test_dot_and_cosine_sql_match_column_twins(spark, embeddings):
    from mydumper_spark.operators.similarity import cosine, dot

    q = _vec(3, 64)
    qarr = F.array(*[F.lit(float(x)) for x in q])
    col_form = embeddings.select(
        "vec_id",
        dot(F.col("embedding"), qarr).alias("d"),
        F.round(cosine(F.col("embedding"), qarr), 6).alias("c"),
    )
    sql_form = embeddings.select(
        "vec_id",
        F.expr(dot_sql(qcol("embedding"), q)).alias("d"),
        F.round(F.expr(cosine_const_sql(qcol("embedding"), q)), 6).alias("c"),
    )
    assert sorted(map(tuple, col_form.collect())) == sorted(
        map(tuple, sql_form.collect()))


def test_cell_scores_sql_matches_cell_score_column(spark, embeddings):
    from mydumper_spark.operators.similarity import _cell_score

    cents = [_vec(i, 64) for i in range(4)]
    col_scored = F.array(
        *[
            F.struct(
                _cell_score(F.col("embedding"), c).alias("d"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(cents)
        ]
    )
    col_form = embeddings.select(
        "vec_id", F.array_max(col_scored)["cell"].alias("cell"))
    sql_form = embeddings.select(
        "vec_id",
        F.array_max(F.expr(cell_scores_sql(qcol("embedding"), cents)))["cell"]
        .alias("cell"),
    )
    assert sorted(map(tuple, col_form.collect())) == sorted(
        map(tuple, sql_form.collect()))


def test_sig_sql_matches_column_signature(spark, embeddings):
    from mydumper_spark.operators.similarity import (
        _sig_sql,
        simhash_embedding_signature,
    )

    col_form = embeddings.select(
        "vec_id",
        simhash_embedding_signature(F.col("embedding"), 64, 16).alias("s"),
    )
    sql_form = embeddings.select(
        "vec_id", F.expr(_sig_sql(qcol("embedding"), 64, 16)).alias("s"))
    assert sorted(map(tuple, col_form.collect())) == sorted(
        map(tuple, sql_form.collect()))


def test_adc_total_matches_column_twin(spark, embeddings):
    from mydumper_spark.operators.similarity import _adc_total

    luts = [[float(v) for v in _vec(j, 4)] for j in range(2)]
    codes = spark.createDataFrame(
        [([0, 3],), ([1, 2],), ([3, 0],)], "pq_code array<bigint>")
    col_total = None
    for j, lut in enumerate(luts):
        term = F.element_at(
            F.array(*[F.lit(v) for v in lut]),
            (F.element_at(F.col("pq_code"), j + 1) + 1).cast("int"),
        )
        col_total = term if col_total is None else col_total + term
    a = [r[0] for r in codes.select(col_total).collect()]
    b = [r[0] for r in codes.select(_adc_total(luts)).collect()]
    assert a == b


def test_dlit_rejects_non_finite():
    import pytest

    for bad in (float("inf"), float("-inf"), float("nan")):
        with pytest.raises(ValueError):
            dlit(bad)


def test_darr_renders_hostile_names_safe(spark):
    df = spark.createDataFrame([([1.0, 2.0],)], "`we``ird` array<double>")
    got = df.select(
        F.expr(dot_sql(qcol("we`ird"), [2.0, 3.0])).alias("d")).first()["d"]
    assert got == 8.0
