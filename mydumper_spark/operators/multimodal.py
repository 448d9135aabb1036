"""Multimodal (image/audio/video) column plumbing (north-star extension).

Media payloads are opaque ``binary`` columns with a typed metadata struct —
the schema contract a 100 TB multimodal pipeline needs: partitioning, batch
shapes, and UDF signatures are real and tested; the codec step itself is
stubbed because image/audio libraries are not in this container.

Design:
- decode/feature-extract run as ``mapInPandas`` (Arrow batches, not rows);
  batch size is governed by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  so executor memory is bounded regardless of media size.
- a deterministic fake decoder stands in for the real codec so the pipeline
  is end-to-end testable; the real implementation raises cleanly.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct attached to every media column
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image/audio/video
        T.StructField("format", T.StringType()),  # png/jpeg/wav/mp4/...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("size_bytes", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def attach_media_meta(df: DataFrame, binary_col: str, media_type: str, fmt: str) -> DataFrame:
    """Wrap a binary column with its typed metadata struct."""
    return df.withColumn(
        f"{binary_col}_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("bigint").alias("duration_ms"),
            F.length(F.col(binary_col)).cast("bigint").alias("size_bytes"),
        ),
    )


def real_decode(payload: bytes, fmt: str):  # pragma: no cover - container lacks codecs
    """The genuine codec hook. Swap in PIL / torchaudio / pyav here when the
    runtime image carries them."""
    raise NotImplementedError(
        "media codecs are not available in this container; "
        "use deterministic_fake_decode for plumbing tests"
    )


def deterministic_fake_decode(payload: bytes, feature_dim: int = 8) -> list[float]:
    """Stand-in decoder: derives a stable feature vector from the payload's
    sha256 — same payload → same feature, so downstream tests are exact."""
    h = hashlib.sha256(payload or b"").digest()
    return [h[i] / 255.0 for i in range(feature_dim)]


def extract_features(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    feature_dim: int = 8,
    use_fake_decoder: bool = True,
) -> DataFrame:
    """Arrow-batched feature extraction over a binary media column.

    The mapInPandas shape here is the production shape: iterator of pandas
    batches in, iterator out, nothing row-at-a-time, no driver involvement.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, hashes, oks = [], [], []
            for payload in pdf[binary_col]:
                raw = bytes(payload) if payload is not None else b""
                hashes.append(hashlib.sha256(raw).hexdigest())
                if use_fake_decoder:
                    feats.append(deterministic_fake_decode(raw, feature_dim))
                    oks.append(True)
                else:  # pragma: no cover
                    try:
                        feats.append(real_decode(raw, "unknown"))
                        oks.append(True)
                    except NotImplementedError:
                        feats.append(None)
                        oks.append(False)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "content_hash": hashes,
                    "feature": feats,
                    "decode_ok": oks,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resize_ok", T.BooleanType()),
    ]
)


def deterministic_fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Stand-in resize: maps the payload to exactly width*height bytes by
    cycling it (same payload+dims → same bytes). Keeps the contract that a
    resize changes the payload *and* is deterministic for tests."""
    target = max(1, width * height)
    if not payload:
        return bytes(target)
    reps = (target // len(payload)) + 1
    return (payload * reps)[:target]


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    use_fake_codec: bool = True,
) -> DataFrame:
    """Arrow-batched media resize over a binary column.

    Same mapInPandas shape as :func:`extract_features` — the production
    contract (batch in/out, bounded by arrow.maxRecordsPerBatch, no driver
    hop). The pixel work is the stub; swap :func:`real_decode`-based
    resampling in when codecs exist in the runtime image."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads, oks = [], []
            for payload in pdf[binary_col]:
                raw = bytes(payload) if payload is not None else b""
                if use_fake_codec:
                    out_payloads.append(deterministic_fake_resize(raw, width, height))
                    oks.append(True)
                else:  # pragma: no cover
                    try:
                        real_decode(raw, "unknown")
                        oks.append(True)
                        out_payloads.append(raw)
                    except NotImplementedError:
                        out_payloads.append(None)
                        oks.append(False)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": out_payloads,
                    "width": width,
                    "height": height,
                    "resize_ok": oks,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame, binary_col: str = "payload", id_col: str = "doc_id", every_n_bytes: int = 256
) -> DataFrame:
    """Frame-sampling plumbing: emits one row per sampled "frame" (byte-range
    stand-in). The explode pattern — one media row fanning out to N frame
    rows — is the real shape; the frame boundaries come from the stub."""
    n_frames = F.greatest(
        (F.length(F.col(binary_col)) / every_n_bytes).cast("int"), F.lit(1)
    )
    exploded = df.select(
        F.col(id_col),
        F.col(binary_col),
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "frame_no"),
    )
    return exploded.select(
        id_col,
        "frame_idx",
        F.substring(
            F.col(binary_col), F.col("frame_no") * every_n_bytes + 1, F.lit(every_n_bytes)
        ).alias("frame_bytes"),
    )
