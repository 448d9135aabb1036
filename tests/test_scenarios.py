"""Scenario coverage mirroring the reference's test corpus (SURVEY §5,
FIXTURES.md): weird identifiers (specific_16) and a miniature of the
648-combination dynamic roundtrip matrix (test_mydumper.sh:466-520) —
format × compression × rotation × masquerade, each proven by the same
oracle the reference uses: roundtrip checksum equality.
"""

from __future__ import annotations

import os

import pytest

from mydumper_spark.catalog import TableFilters
from mydumper_spark.engine import DumpConfig, dump, restore
from mydumper_spark.operators.transform import TableTransform
from mydumper_spark.sinks.writers import CsvFormat

SRC = "/root/testdata/sf0.001"


def test_weird_table_names_roundtrip(spark, tmp_path):
    """specific_16: `t%`, `t?`, dots and slashes in table names must dump to
    safe filenames and restore losslessly (filename encoding,
    mydumper_common.c:66-90)."""
    from mydumper_spark.sinks.exec_sink import FilenameRegistry

    reg = FilenameRegistry()
    weird = ["t%", "t*", "t?", "mydumper.aipk_uuid", "mydumper/aipk_uuid", "plain_t"]
    mapped = [reg.filename_for(t) for t in weird]
    # deterministic, memoized, filesystem-safe, collision-free
    assert mapped == [reg.filename_for(t) for t in weird]
    assert len(set(mapped)) == len(weird)
    assert all("/" not in m and "%" not in m and "*" not in m and "?" not in m for m in mapped)
    assert mapped[-1] == "plain_t"  # safe names pass through
    assert mapped[3].startswith("mydumper_")  # dot inside name → generated

    # end-to-end: a source parquet whose *table name* needs encoding
    srcdir = tmp_path / "src"
    spark.read.parquet(f"{SRC}/region.parquet").write.parquet(
        str(srcdir / "weird name @x.parquet")
    )
    out = str(tmp_path / "out")
    m = dump(spark, str(srcdir), DumpConfig(output_dir=out))
    assert "weird name @x" in m.tables
    results = restore(spark, out, str(tmp_path / "tgt"), parallelism=2)
    assert results["verify"]["weird name @x"] is True


@pytest.mark.parametrize("fmt", ["parquet", "csv"])
@pytest.mark.parametrize("compression", [None, "gzip"])
@pytest.mark.parametrize("rotate", [None, 40])
def test_dynamic_matrix_roundtrip(spark, tmp_path, fmt, compression, rotate):
    """Miniature of the reference's dynamic matrix: every combination must
    survive dump → restore → checksum verify (the --checksum=fail oracle)."""
    csv_fmt = CsvFormat()
    if compression:
        csv_fmt.compression = compression
    out = str(tmp_path / "out")
    cfg = DumpConfig(
        output_dir=out,
        filters=TableFilters(tables_list={"default.region", "default.nation"}),
        fmt=fmt,
        csv_format=csv_fmt,
        max_records_per_file=rotate,
    )
    dump(spark, SRC, cfg)
    results = restore(spark, out, str(tmp_path / "tgt"), parallelism=2)
    assert all(results["load"].values())
    assert all(results["verify"].values()), results["verify"]


def test_matrix_with_masquerade_and_where(spark, tmp_path):
    """Combination case: masquerade + global where + rotation together
    (the reference's specific_3 + specific_9 shapes composed)."""
    out = str(tmp_path / "out")
    cfg = DumpConfig(
        output_dir=out,
        filters=TableFilters(tables_list={"default.customer"}),
        global_where="c_custkey <= 100",
        per_table={
            "customer": TableTransform(
                select_replace={"c_name": "md5(c_name)"},
            )
        },
        max_records_per_file=32,
    )
    m = dump(spark, SRC, cfg)
    expected = (
        spark.read.parquet(f"{SRC}/customer.parquet").where("c_custkey <= 100").count()
    )
    assert m.tables["customer"].rows == expected  # P1 applied before the sink
    results = restore(spark, out, str(tmp_path / "tgt"), parallelism=2)
    assert results["verify"]["customer"] is True
