"""Trained byte-pair-encoding tokenizer (Sennrich et al. 2016) — the real
sub-word path behind the engine's token accounting (`bpe_ish_token_count`
is the regex pre-tokenizer stand-in; this module learns actual merges).

Spark-first split of the algorithm, same pattern as the trained PQ
codebooks (`similarity.py:train_pq_codebooks`):

- **Training is driver-plane on a bounded aggregate** — BPE learns from a
  WORD-FREQUENCY table, not from raw text, so the driver never sees the
  corpus: Spark computes (word, count) with a `vocab_top` cap (one
  shuffle, map-side partials), the driver runs the classic merge loop on
  that ≤`vocab_top`-row dict. At 100 TB the frequency table of a capped
  vocabulary is KBs; the corpus never moves.
- **Encoding is distributed and Arrow-batched** — merges broadcast in the
  task closure as a rank dict; `mapInPandas` applies them per word with a
  word→tokens memo per batch (Zipf makes the memo hit rate ~99%). No
  row-at-a-time Python, no shuffle: encode is a scan-side map.

Determinism: merge ties on frequency break lexicographically, so the
learned merge table is identical across runs/partitionings — the engine's
reproducibility rule. Not SQL-expressible (the merge loop is inherently
iterative), so the registry entry is rows-only by necessity; correctness
is pytest-pinned on planted corpora instead.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: end-of-word marker (the classic BPE convention: lets merges distinguish
#: "est</w>" in "finest" from "est" in "establish")
EOW = "</w>"


def word_frequencies(
    df: DataFrame, text_col: str = "text", vocab_top: int = 50_000
) -> list[tuple[str, int]]:
    """The bounded driver-plane aggregate BPE trains on: top-`vocab_top`
    (word, count) pairs, frequency-desc then lexicographic — deterministic
    under any partitioning. One shuffle with map-side combine; the collect
    is capped at `vocab_top` rows (driver-plane metadata, same class as
    chunk boundaries / PQ codebooks)."""
    from mydumper_spark.operators.dedup import tokens

    rows = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(int(vocab_top))
        .collect()
    )
    return [(r["w"], int(r["c"])) for r in rows]


def train_bpe_merges(
    word_freqs: list[tuple[str, int]], num_merges: int = 200
) -> list[tuple[str, str]]:
    """Classic BPE merge training over a word-frequency dict: start from
    characters (+ EOW), repeatedly merge the most frequent adjacent pair.
    Ties break lexicographically for cross-run determinism. Pure driver
    CPU on ≤vocab_top entries — each merge round rescans the sequences, so
    cost is O(num_merges × total_word_chars); at the vocab_top=50k cap
    that is ≲10⁸ dict ops, a few driver seconds, and independent of corpus
    size (the frequency dict absorbed it)."""
    seqs: list[list[str]] = [list(w) + [EOW] for w, _ in word_freqs]
    counts = [c for _, c in word_freqs]
    merges: list[tuple[str, str]] = []
    for _ in range(int(num_merges)):
        pair_counts: dict[tuple[str, str], int] = {}
        for seq, c in zip(seqs, counts):
            for a, b in zip(seq, seq[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
        if not pair_counts:
            break
        best = max(pair_counts.items(), key=lambda kv: (kv[1], kv[0]))
        if best[1] < 2:  # nothing repeats — further merges are noise
            break
        (a, b), _n = best
        merges.append((a, b))
        ab = a + b
        for seq in seqs:
            i = 0
            while i < len(seq) - 1:
                if seq[i] == a and seq[i + 1] == b:
                    seq[i:i + 2] = [ab]
                else:
                    i += 1
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    seq = list(word) + [EOW]
    while len(seq) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(seq, seq[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        seq[best_i:best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distributed BPE encode: (id, bpe_tokens array<string>, n_bpe) via
    `mapInPandas` — merges ship in the closure as a rank dict (KBs), each
    Arrow batch keeps a word→tokens memo so the merge loop runs once per
    DISTINCT word per batch, not per occurrence. Scan-side map: zero
    shuffles, output rows = input rows."""
    from pyspark.sql import types as T

    ranks = {pair: i for i, pair in enumerate(merges)}
    schema = T.StructType([
        df.schema[id_col],
        T.StructField("bpe_tokens", T.ArrayType(T.StringType())),
        T.StructField("n_bpe", T.LongType()),
    ])
    src = df.select(id_col, F.coalesce(F.col(text_col), F.lit("")).alias("__t"))

    def encode(batches: Iterator) -> Iterator:
        import re as _re

        import pandas as pd

        # EXACTLY the training-side tokenization (dedup.tokens: lower →
        # trim → Java \s+, which is ASCII-only whitespace): a Unicode-aware
        # str.split() would segment U+00A0-joined words the merge table
        # never saw, silently diverging from the trained statistics
        ascii_ws = _re.compile(r"\s+", _re.ASCII)

        memo: dict[str, list[str]] = {}

        def enc_text(t: str) -> list[str]:
            out: list[str] = []
            # strip(" "): Spark's trim removes 0x20 only — Python's bare
            # strip() would also eat exotic Unicode whitespace
            for w in ascii_ws.split(t.lower().strip(" ")):
                if not w:
                    continue
                got = memo.get(w)
                if got is None:
                    got = memo[w] = _encode_word(w, ranks)
                out.extend(got)
            return out

        for pdf in batches:
            toks = pdf["__t"].map(enc_text)
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "bpe_tokens": toks,
                "n_bpe": toks.map(len).astype("int64"),
            })

    return src.mapInPandas(encode, schema)


def fit_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    vocab_top: int = 50_000,
) -> list[tuple[str, str]]:
    """Convenience: frequency aggregate → driver merge training."""
    return train_bpe_merges(word_frequencies(df, text_col, vocab_top),
                            num_merges)


def save_bpe(merges: list[tuple[str, str]], path: str) -> None:
    """Persist a trained merge list — the tokenizer artifact is ~KBs of
    string pairs, the same persistence story as IVF centroids / PQ
    codebooks / the SQ8 scale: train once, version the artifact, encode
    any corpus against it forever (training-corpus drift must not change
    a frozen tokenizer)."""
    import json

    with open(path, "w") as f:
        json.dump([list(m) for m in merges], f)


def load_bpe(path: str) -> list[tuple[str, str]]:
    """Inverse of :func:`save_bpe`; the loaded list drives
    :func:`bpe_encode` identically to the freshly-trained one."""
    import json

    with open(path) as f:
        return [tuple(m) for m in json.load(f)]
