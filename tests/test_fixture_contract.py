"""Fixture-schema contract: fail loudly at pytest time if the driver
regenerates /root/testdata with different parquet schemas (this silently
broke round 3 when events.ts flipped from INT64-nanos to timestamp[us]).

Reads footers with pyarrow only — no Spark session needed, so this runs in
milliseconds and is safe to put first in CI order.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

# arrow-type strings per table; events.ts admits the encodings _events_us handles
EXPECTED: dict[str, dict[str, set[str]]] = {
    "region": {"r_regionkey": {"int32"}, "r_name": {"string", "large_string"}},
    "nation": {
        "n_nationkey": {"int32"},
        "n_name": {"string", "large_string"},
        "n_regionkey": {"int32"},
    },
    "customer": {
        "c_custkey": {"int64"},
        "c_name": {"string", "large_string"},
        "c_nationkey": {"int32"},
        "c_acctbal": {"double"},
        "c_mktsegment": {"string", "large_string"},
    },
    "supplier": {
        "s_suppkey": {"int64"},
        "s_name": {"string", "large_string"},
        "s_nationkey": {"int32"},
        "s_acctbal": {"double"},
    },
    "part": {
        "p_partkey": {"int64"},
        "p_name": {"string", "large_string"},
        "p_brand": {"string", "large_string"},
        "p_type": {"string", "large_string"},
        "p_size": {"int32"},
        "p_retailprice": {"double"},
    },
    "orders": {
        "o_orderkey": {"int64"},
        "o_custkey": {"int64"},
        "o_orderstatus": {"string", "large_string"},
        "o_totalprice": {"double"},
        # [us] ONLY: a TIMESTAMP(NANOS) regeneration would read as bigint
        # under nanosAsLong and silently break every date-literal filter —
        # that drift must fail here, loudly (events.ts is the one column
        # with a type-aware reader; these are not)
        "o_orderdate": {"timestamp[us]"},
        "o_orderpriority": {"string", "large_string"},
    },
    "lineitem": {
        "l_orderkey": {"int64"},
        "l_partkey": {"int64"},
        "l_suppkey": {"int64"},
        "l_linenumber": {"int32"},
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_tax": {"double"},
        "l_returnflag": {"string", "large_string"},
        "l_linestatus": {"string", "large_string"},
        "l_shipdate": {"timestamp[us]"},  # [us] ONLY — see o_orderdate
    },
    "events": {
        "event_id": {"int64"},
        # every encoding _events_us knows how to normalize to bigint µs
        "ts": {"timestamp[us]", "timestamp[ns]", "int64"},
        "user_id": {"int64"},
        "event_type": {"string", "large_string"},
        "value": {"double"},
        "props": {"string", "large_string"},
    },
    "documents": {
        "doc_id": {"int64"},
        "text": {"string", "large_string"},
        "lang": {"string", "large_string"},
        "source": {"string", "large_string"},
        "n_chars": {"int64"},
    },
    "embeddings": {
        "vec_id": {"int64"},
        "embedding": {"list<element: float>", "list<item: float>"},
        "label": {"int32"},
    },
}


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_fixture_schema(sf_dir: str, table: str) -> None:
    path = f"{sf_dir}/{table}.parquet"
    if not os.path.exists(path):
        pytest.skip(f"{path} absent")
    schema = pq.read_schema(path)
    got = {f.name: str(f.type) for f in schema}
    exp = EXPECTED[table]
    assert set(got) == set(exp), (
        f"{path}: column set drifted: got {sorted(got)}, expected {sorted(exp)}"
    )
    for col, allowed in exp.items():
        assert got[col] in allowed, (
            f"{path}.{col}: type {got[col]!r} not in allowed {sorted(allowed)} — "
            "fixture regenerated with a new encoding; update _events_us/"
            "_DUCK_FIELDS and this contract together"
        )
