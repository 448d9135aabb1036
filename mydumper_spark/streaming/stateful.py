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
