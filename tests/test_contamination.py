"""Contamination detection + repetition filters (operators/contamination.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mydumper_spark.operators.contamination import (
    contamination_pairs,
    decontaminate,
    repetition_metrics,
)


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "the quick brown fox jumps over the lazy dog at dawn"),  # near-copy of 1
            (3, "completely unrelated text about spark execution engines"),
            (4, "short"),
        ],
        "doc_id long, text string",
    )


def _eval_set(spark):
    return spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
        "eval_id long, text string",
    )


def test_contamination_flags_copies_and_near_copies(spark):
    hits = contamination_pairs(_corpus(spark), _eval_set(spark), min_shared=3)
    got = {(r["doc_id"], r["eval_id"]) for r in hits.collect()}
    # doc 1 is an exact copy, doc 2 shares the 8-word prefix's shingles
    assert (1, 100) in got and (2, 100) in got
    assert all(d not in (3, 4) for d, _ in got)
    # exact copy shares every shingle
    n1 = {r["doc_id"]: r["n_shared"] for r in hits.collect()}[1]
    assert n1 == 8  # 10 tokens -> 8 trigram shingles, all shared


def test_decontaminate_removes_hits_only(spark):
    clean = decontaminate(_corpus(spark), _eval_set(spark), min_shared=3)
    assert {r["doc_id"] for r in clean.collect()} == {3, 4}


def test_contamination_plan_broadcasts_eval_side(spark):
    """The 100 TB contract: eval side broadcast, corpus side not exchanged
    before the join (the only exchange is the tiny post-join aggregate)."""
    plan = (
        contamination_pairs(_corpus(spark), _eval_set(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    head, _, tail = plan.partition("BroadcastHashJoin")
    # no shuffle below the join on the corpus (streamed) side
    assert "Exchange hashpartitioning" not in tail, plan


def test_repetition_metrics_planted(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),          # heavy 3-gram repetition
            (2, "one two three four five six"),  # all distinct
            (3, "x\nx\nx\ny"),                  # duplicated lines
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_metrics(df).collect()}
    # doc1: 7 trigrams, 3 distinct -> floor((1-3/7)*1e6) = 571428
    assert rows[1]["dup_3gram_ppm"] == 571428
    assert not rows[1]["passes_repetition"]
    assert rows[2]["dup_3gram_ppm"] == 0
    assert rows[2]["passes_repetition"]
    # doc3: 4 lines, 2 distinct -> 500000 ppm
    assert rows[3]["dup_line_ppm"] == 500000
    assert not rows[3]["passes_repetition"]


def test_repetition_keep_cols_passthrough(spark):
    """keep_cols carries payload columns through unchanged and leaves the
    metric values byte-identical to the plain form (the r14 x_text_curate
    gate-fusion contract)."""
    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b c", 9),
            (2, "one two three four five six", 6),
        ],
        "doc_id long, text string, n_tokens_kept long",
    )
    plain = {r["doc_id"]: r.asDict()
             for r in repetition_metrics(df).collect()}
    kept = {r["doc_id"]: r.asDict()
            for r in repetition_metrics(df, keep_cols=["n_tokens_kept"]).collect()}
    for i, n in ((1, 9), (2, 6)):
        assert kept[i].pop("n_tokens_kept") == n
        assert kept[i] == plain[i]


def test_repetition_empty_text_passes(spark):
    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    r = repetition_metrics(df).first()
    assert r["dup_3gram_ppm"] == 0 and r["dup_line_ppm"] == 0
    assert r["passes_repetition"]


def test_decontaminate_runs_in_streaming(spark, tmp_path, documents):
    """Decontamination in a streaming ingest composes via foreachBatch:
    the decision is per-document (each doc's shared-shingle count against
    the static broadcast eval side needs no cross-batch state), so running
    the batch operator per micro-batch is semantically exact — unlike a
    direct stream aggregation, which would demand a watermark for state it
    doesn't actually need. Output must equal the batch operator."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    corpus = documents.limit(60)
    ev = documents.where("doc_id % 20 = 0").selectExpr(
        "doc_id AS eval_id", "text"
    )
    corpus.write.parquet(src)
    stream = spark.readStream.schema(corpus.schema).parquet(src)

    def scrub(batch_df, _id):
        decontaminate(batch_df, ev, min_shared=3).write.mode("append").parquet(out)

    q = (
        stream.writeStream.foreachBatch(scrub)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    batch = {r["doc_id"] for r in decontaminate(corpus, ev, min_shared=3).collect()}
    assert got == batch
    assert len(got) < 60  # the planted eval docs themselves were scrubbed


def test_repetition_gate_runs_in_streaming(spark, tmp_path, documents):
    """The hygiene gates are stateless per-row expressions, so the same
    operator composes unchanged into a Structured Streaming pipeline —
    land parquet, stream it through repetition_metrics, availableNow."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    documents.limit(50).write.parquet(src)
    stream = spark.readStream.schema(documents.schema).parquet(src)
    gated = repetition_metrics(stream)
    q = (
        gated.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 50
    batch = {r["doc_id"]: r["dup_3gram_ppm"]
             for r in repetition_metrics(documents.limit(50)).collect()}
    for r in got.collect():
        assert batch[r["doc_id"]] == r["dup_3gram_ppm"]
