"""Corpus-dedup scale rehearsal (VERDICT r5 task #7): measure — not argue —
how the sub-document dedup ladder scales as the corpus grows 30×
(10×/100×/300× replication of the sf0.1 documents fixture; a separate
1000× run extends the top rung to 1.6 GB — results in SCALE.md).

Builds replicated corpora from the sf0.1 documents fixture (each replica
gets perturbed doc ids and a replica-tagged first line so exact doc dedup
can't trivially collapse them, while plenty of duplicate lines/blocks
remain — the worst realistic shape for the ladder: heavy cross-document
overlap), then times each dedup operator at 1×, 3×, 10× and reports wall
time plus the measured shuffle payload (bytes of exploded units crossing
the exchange — by design each operator shuffles corpus bytes exactly once,
so this is also the check that nothing shuffles twice).

Usage: python tools/scale_rehearsal.py [sf_dir] [out_json]
Writes one JSON doc with per-(op, scale) rows; paste the table into
SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_corpus(spark, sf_dir: str, factor: int, path: str) -> None:
    """factor replicas of documents.parquet via one crossJoin with a
    replica-index range (NOT a factor-way union — that explodes the plan):
    ids offset per replica, first line replica-tagged (so exact doc dedup
    can't trivially collapse replicas) but every other line identical
    across replicas — maximal duplicate-line/block pressure, the worst
    realistic shape for the ladder."""
    from pyspark.sql import functions as F

    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    reps = (
        base.crossJoin(spark.range(factor).withColumnRenamed("id", "rep"))
        .select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
            F.concat(
                F.lit("replica "), F.col("rep"), F.lit(" header\n"), F.col("text")
            ).alias("text"),
        )
    )
    reps.repartition(32).write.mode("overwrite").parquet(path)


def measure(spark, path: str) -> dict:
    """Run each ladder rung over the corpus at `path`; wall time + the
    exploded-unit byte volume that crosses the one exchange."""
    from pyspark.sql import functions as F

    from mydumper_spark.operators.corpus import (
        dedup_lines_global,
        dedup_paragraphs_global,
        dedup_token_blocks_global,
        exact_substring_dedup,
    )
    from mydumper_spark.operators.dedup import exact_dedup

    df = spark.read.parquet(path)
    n_docs = df.count()
    corpus_bytes = df.select(F.sum(F.length("text"))).first()[0]
    out = {"docs": n_docs, "corpus_bytes": int(corpus_bytes), "ops": {}}
    ops = {
        "exact_doc": lambda d: exact_dedup(d).select("doc_id"),
        "lines": lambda d: dedup_lines_global(d).select("doc_id", "n_kept", "n_removed"),
        "paragraphs": lambda d: dedup_paragraphs_global(d).select("doc_id", "n_kept", "n_removed"),
        "blocks32": lambda d: dedup_token_blocks_global(d, block_tokens=32).select(
            "doc_id", "n_kept", "n_removed"),
        # sliding ExactSubstr at the replica corpus's near-total duplication
        # — the worst case for the covered-token expansion (k × nearly every
        # position); measures the hash-prejoin production path
        "substring8": lambda d: exact_substring_dedup(d, k=8).select(
            "doc_id", "n_tokens_kept", "n_tokens_removed"),
    }
    for name, fn in ops.items():
        # materialize through the noop sink: count() on a groupBy lets
        # Catalyst prune the window/agg expressions (only group cardinality
        # is needed) and under-reports by 10x+ — the bench harness learned
        # the same lesson
        t0 = time.time()
        res = fn(df)
        res.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        out["ops"][name] = {"wall_sec": round(wall, 2),
                            "out_rows": res.count()}
    # shuffle payload per rung = bytes of the exploded unit values (what the
    # single exchange carries); measured, not assumed
    lines = df.select(F.posexplode(F.split("text", "\n")).alias("p", "l"))
    out["ops"]["lines"]["shuffle_payload_bytes"] = int(
        lines.select(F.sum(F.length("l"))).first()[0]
    )
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_rehearsal.json"
    from mydumper_spark.session import get_session

    spark = get_session("scale-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    report = {}
    for factor in (10, 100, 300):
        path = f"/tmp/scale_corpus_{factor}x.parquet"
        build_corpus(spark, sf_dir, factor, path)
        report[f"{factor}x"] = measure(spark, path)
        print(f"{factor}x done: {report[f'{factor}x']}", flush=True)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
