"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no stateful stream processing (its stream is a file
transport, SURVEY §2.8); these are the extension operators a continuous
training-data ingest needs. The canonical one: **cross-batch exact dedup** —
"emit each document fingerprint the first time it is ever seen", which no
stateless micro-batch pipeline can express because the "seen" set must
outlive the batch.

Scale shape: state is keyed by fingerprint, so it shards across executors
with the shuffle; per-key state is one long (first-seen count), bounded by
``GroupStateTimeout`` when the caller supplies a TTL. Arrow moves batches,
not rows.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    pass

#: output: one row per *newly seen* fingerprint, with its first payload
DEDUP_OUTPUT_SCHEMA = "fp string, doc_id bigint, n_duplicates bigint"
#: state: how many times this fingerprint has been seen so far
DEDUP_STATE_SCHEMA = "seen bigint"


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (fp,) = key
    seen = state.get[0] if state.exists else 0
    first_row = None
    batch_count = 0
    for pdf in pdfs:
        if first_row is None and len(pdf):
            first_row = pdf.iloc[0]
        batch_count += len(pdf)
    state.update((seen + batch_count,))
    if seen == 0 and first_row is not None:
        # first time ever seen → emit exactly once, with how many duplicates
        # arrived alongside it in this batch
        yield pd.DataFrame(
            {
                "fp": [fp],
                "doc_id": [int(first_row["doc_id"])],
                "n_duplicates": [batch_count - 1],
            }
        )


#: output of streaming line dedup: each surviving line occurrence
LINE_OUTPUT_SCHEMA = "line string, doc_id bigint, pos bigint, n_duplicates bigint"
LINE_STATE_SCHEMA = "seen bigint"


def _line_dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (line,) = key
    seen = state.get[0] if state.exists else 0
    first = None
    batch_count = 0
    for pdf in pdfs:
        for _, row in pdf.iterrows():
            cand = (int(row["doc_id"]), int(row["pos"]))
            if first is None or cand < first:
                first = cand
        batch_count += len(pdf)
    state.update((seen + batch_count,))
    if seen == 0 and first is not None:
        yield pd.DataFrame(
            {
                "line": [line],
                "doc_id": [first[0]],
                "pos": [first[1]],
                "n_duplicates": [batch_count - 1],
            }
        )


def streaming_line_dedup(stream: DataFrame, text_col: str = "text") -> DataFrame:
    """Streaming twin of
    :func:`mydumper_spark.operators.dedup_lines_global`'s arbitration
    stage: documents stream in, lines explode out, and each distinct line
    VALUE survives only the first micro-batch it ever appears in (within
    that batch, the smallest (doc_id, pos) wins — matching the batch
    arbiter when ids arrive in order). Duplicate lines in any later batch
    are swallowed by per-line state.

    Emits surviving (line, doc_id, pos) rows; document reassembly is a
    downstream batch concern (a streaming re-group would need a second
    stateful stage, which update-mode chains disallow). State shards by
    line value across executors exactly like the batch shuffle; per-key
    state is one long."""
    from pyspark.sql import functions as F

    lines = stream.select(
        F.col("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).where(F.trim(F.col("line")) != "")
    return lines.groupBy("line").applyInPandasWithState(
        _line_dedup_fn,
        outputStructType=LINE_OUTPUT_SCHEMA,
        stateStructType=LINE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_exact_dedup(stream: DataFrame, fp_col: str = "fp") -> DataFrame:
    """Cross-batch first-occurrence dedup over a fingerprint column.

    Input: a *streaming* DataFrame with (fp, doc_id). Output (update mode):
    one row per fingerprint the first micro-batch it appears in; duplicates
    in any later batch are swallowed by state. This is the streaming twin of
    :func:`mydumper_spark.operators.dedup.exact_dedup`."""
    return stream.groupBy(fp_col).applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


#: streaming MinHash-LSH intake: one row per (doc, band) bucket probe
MINHASH_OUTPUT_SCHEMA = (
    "band int, bucket string, doc_id bigint, prior_doc bigint"
)
MINHASH_STATE_SCHEMA = "first_doc bigint"


def _minhash_bucket_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    band, bucket = key
    prior = int(state.get[0]) if state.exists else None
    rows: list[int] = []
    for pdf in pdfs:  # vectorized: a hot bucket must not iterate rows
        if len(pdf):
            rows.extend(pdf["doc_id"].astype("int64").tolist())
    batch_min = min(rows) if rows else None
    if batch_min is not None:
        state.update((prior if prior is not None else batch_min,))
    if rows:
        # a doc's prior is the bucket's pre-batch holder; docs arriving in
        # the same batch as the holder see the in-batch minimum (matching
        # the batch LSH arbiter's smallest-id rule)
        yield pd.DataFrame(
            {
                "band": [int(band)] * len(rows),
                "bucket": [bucket] * len(rows),
                "doc_id": rows,
                "prior_doc": [
                    prior if prior is not None
                    else (batch_min if d != batch_min else None)
                    for d in rows
                ],
            }
        )


def streaming_minhash_buckets(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """Streaming near-dup intake: the cross-batch stateful half of the
    MinHash-LSH pipeline. Documents stream in; each emits ``bands`` bucket
    probes; per-(band, bucket) state remembers the earliest document ever
    to hold the bucket. Output rows carry ``prior_doc`` — the pre-existing
    holder (NULL when this doc opened the bucket, or the in-batch minimum
    for same-batch collisions). A document whose probes are all-NULL is
    NOVEL; any non-null row names its near-dup candidate, to be
    exact-verified downstream (the batch pipeline's verify stage —
    chaining a second stateful aggregation is disallowed in update mode,
    so the per-doc any() fold is a foreachBatch concern, same contract as
    streaming_line_dedup's reassembly).

    State shards by (band, bucket) exactly like the batch groupBy; per-key
    state is one long, so a hot boilerplate bucket costs 8 bytes, not
    memory."""
    from pyspark.sql import functions as F

    from mydumper_spark.operators.dedup import minhash_signature

    rows_per_band = num_hashes // bands
    sig = minhash_signature(F.col(text_col), num_hashes, k)
    banded = stream.select(
        F.col(id_col).alias("doc_id"), sig.alias("__sig")
    ).select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",",
                            F.slice("__sig", b * rows_per_band + 1, rows_per_band),
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    return banded.groupBy("band", "bucket").applyInPandasWithState(
        _minhash_bucket_fn,
        outputStructType=MINHASH_OUTPUT_SCHEMA,
        stateStructType=MINHASH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def exact_verify_candidates(
    candidates: DataFrame,
    store: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    jaccard_threshold: float = 0.6,
) -> DataFrame:
    """foreachBatch half of the streaming near-dup pipeline: LSH candidate
    rows from :func:`streaming_minhash_buckets` (``doc_id`` + non-null
    ``prior_doc``) → exactly-verified pairs ``(id_a, id_b, jaccard)`` with
    ``id_a < id_b`` — the SAME shingle-set Jaccard the batch
    ``minhash_lsh_pairs`` computes, so streaming and batch verdicts agree
    by construction on shared candidates. ``store`` is the document corpus
    accumulated so far. CONTRACT: the store must already contain every
    candidate id — guaranteed when the stream SOURCE is the landing zone
    itself (files are committed before a batch fires), NOT guaranteed when
    streaming from elsewhere and landing via a separate sink (that sink
    may commit after this verify). A violated contract raises rather than
    silently losing pairs: an unresolved id here is a real near-duplicate
    candidate that would otherwise vanish forever.

    LSH never affects correctness here, only which pairs are PROPOSED:
    per-bucket state keeps the earliest holder (8 bytes), so candidates
    are (arriving doc → earliest bucket holder) — the anchor shape. A
    later pair both colliding only *through* a shared earlier anchor is
    the documented streaming trade vs the batch all-pairs bucket join."""
    from pyspark.sql import functions as F

    from mydumper_spark.operators.dedup import shingles

    cand = (
        candidates.where(F.col("prior_doc").isNotNull()
                         # at-least-once redelivery: a doc re-probing a
                         # bucket it already anchors proposes ITSELF as
                         # prior_doc — a bogus (x, x, 1.0) "pair" that a
                         # downstream group-builder would read as the doc
                         # duplicating itself
                         & (F.col("prior_doc") != F.col("doc_id")))
        .select(
            F.least("doc_id", "prior_doc").alias("id_a"),
            F.greatest("doc_id", "prior_doc").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    sh = store.select(
        F.col(id_col).alias("id"),
        F.array_distinct(
            F.transform(shingles(F.col(text_col), k), lambda s: F.xxhash64(s))
        ).alias("sh"),
    )
    enriched = (
        cand.join(sh.select(F.col("id").alias("id_a"),
                            F.col("sh").alias("sh_a")), "id_a", "left")
        .join(sh.select(F.col("id").alias("id_b"),
                        F.col("sh").alias("sh_b")), "id_b", "left")
    )
    unresolved = enriched.where(
        F.col("sh_a").isNull() | F.col("sh_b").isNull())
    missing = [r.asDict() for r in unresolved.limit(5).collect()]
    if missing:
        raise ValueError(
            "exact_verify_candidates: candidate doc ids missing from the "
            f"store (first: {missing}) — the stream must be fed FROM the "
            "landing zone (or the landing write must commit before verify); "
            "proceeding would silently drop real near-duplicate pairs"
        )
    jac = (
        F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        / F.size(F.array_union("sh_a", "sh_b")).cast("double")
    )
    return (
        enriched.withColumn("jaccard", F.round(jac, 6))
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def streaming_minhash_pairs(
    stream: DataFrame,
    store,
    on_pairs,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    jaccard_threshold: float = 0.6,
):
    """End-to-end streaming near-dup pipeline: stateful LSH intake →
    per-batch exact verification → verified-pair sink. Returns a
    ``DataStreamWriter`` (caller adds checkpoint/trigger and ``start()``).

    - ``store``: zero-arg callable returning the corpus-so-far as a batch
      DataFrame (typically ``lambda: spark.read.parquet(landing)``).
    - ``on_pairs(pairs_df, batch_id)``: sink callback per micro-batch with
      the verified ``(id_a, id_b, jaccard)`` rows.

    This is the streaming twin of the batch ``minhash_lsh_pairs``: same
    shingle hashing, same banding arithmetic, same exact-Jaccard verify —
    only candidate generation differs (cross-batch bucket state instead of
    a bucket self-join). On corpora whose collisions are anchored at the
    earliest member of each dup group, the accumulated pairs equal the
    batch pipeline's output exactly (pytest-pinned)."""
    buckets = streaming_minhash_buckets(
        stream, text_col=text_col, id_col=id_col,
        num_hashes=num_hashes, bands=bands, k=k,
    )

    def _fb(batch_df, batch_id):
        pairs = exact_verify_candidates(
            batch_df, store(), text_col=text_col, id_col=id_col, k=k,
            jaccard_threshold=jaccard_threshold,
        )
        on_pairs(pairs, batch_id)

    return buckets.writeStream.foreachBatch(_fb).outputMode("update")
