"""Text-analysis operators for training-data pipelines (north-star extension
beyond reference parity — SURVEY §7.9).

All expressions are built from native pyspark.sql.functions so they run inside
whole-stage codegen; every function also has an ANSI-SQL twin used by the
DuckDB oracle (kept textually in __spark_entry__.py — the two must evolve
together).

Operators:
- token / char / punctuation counting (BPE-ish regex tokenizer variant)
- language ID via stopword-occurrence scoring (n-gram heuristic)
- quality scoring (length / punct / stopword ratios)
- document fingerprinting (normalized-text hash; rolling-hash shingles live
  in operators/dedup.py)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: ASCII punctuation — same set as Java \p{Punct} and RE2 [[:punct:]], so the
#: Spark and DuckDB counts agree.
PUNCT_RE = r"\p{Punct}"

#: language → discriminative stopwords. Scored by total occurrence count in
#: the lowercased text; ties broken by this dict's order (en first).
STOPWORDS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to ", " is "],
    "de": [" der ", " und ", " die ", " ist ", " das "],
    "fr": [" le ", " et ", " la ", " est ", " les "],
    "es": [" el ", " y ", " la ", " es ", " los "],
}


def token_count(col: Column) -> Column:
    """Whitespace token count; empty/blank → 0."""
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("int")


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token count: splits on whitespace AND word/punct/digit
    boundaries (the regex stand-in for a BPE tokenizer's pre-tokenizer)."""
    t = F.trim(col)
    pieces = F.regexp_extract_all(t, F.lit(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"), 0)
    return F.size(pieces).cast("int")


def punct_count(col: Column) -> Column:
    return (F.length(col) - F.length(F.regexp_replace(col, PUNCT_RE, ""))).cast("int")


def digit_count(col: Column) -> Column:
    return (F.length(col) - F.length(F.regexp_replace(col, r"[0-9]", ""))).cast("int")


def upper_count(col: Column) -> Column:
    return (F.length(col) - F.length(F.regexp_replace(col, r"[A-Z]", ""))).cast("int")


def whitespace_count(col: Column) -> Column:
    return (F.length(col) - F.length(F.regexp_replace(col, r"\s", ""))).cast("int")


def _occurrences(lower_padded: Column, needle: str) -> Column:
    return (
        (F.length(lower_padded) - F.length(F.replace(lower_padded, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("int")


def lang_scores(col: Column) -> dict[str, Column]:
    """Occurrence-count score per language over the lowercased, space-padded
    text. Pure string ops — no regex, no UDF."""
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    return {
        lang: sum((_occurrences(padded, w) for w in words), start=F.lit(0)).cast("int")
        for lang, words in STOPWORDS.items()
    }


def language_id(col: Column) -> Column:
    """Argmax over :func:`lang_scores` with dict-order tie-break; 'und' when
    every score is 0 (mirrors a fastText-style open-set reject)."""
    scores = lang_scores(col)
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # reverse order so earlier languages win ties via later .when override
    for lang in reversed(list(scores)):
        out = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(out)
    return out


def add_text_stats(df: DataFrame, col_name: str = "text") -> DataFrame:
    """Per-document stats projection — one codegen stage, no shuffle."""
    c = F.col(col_name)
    return df.withColumns(
        {
            "n_chars_calc": F.length(c).cast("int"),
            "n_tokens": token_count(c),
            "n_bpe_tokens": bpe_ish_token_count(c),
            "n_punct": punct_count(c),
            "n_digits": digit_count(c),
            "n_upper": upper_count(c),
            "n_spaces": whitespace_count(c),
        }
    )


def quality_score(df: DataFrame, col_name: str = "text") -> DataFrame:
    """Heuristic quality components + a composite score.

    All ratios are carried as integer parts-per-million and the composite is
    pure integer arithmetic — deliberately: a float composite of rounded
    ratios lands on exact .5 rounding ties systematically, and engines break
    those ties differently. Integer math is tie-free and bit-identical
    everywhere; the final division by a power of ten is exact in IEEE double
    for these magnitudes."""
    c = F.col(col_name)
    n = F.length(c).cast("double")
    toks = token_count(c).cast("double")
    punct_ppm = F.round(punct_count(c) / F.greatest(n, F.lit(1.0)) * 1_000_000).cast("bigint")
    space_ppm = F.round(
        whitespace_count(c) / F.greatest(n, F.lit(1.0)) * 1_000_000
    ).cast("bigint")
    mtl_ppm = F.round(
        F.length(F.regexp_replace(c, r"\s", "")).cast("double")
        / F.greatest(toks, F.lit(1.0))
        * 1_000_000
    ).cast("bigint")
    len_ok = ((F.length(c) >= 50) & (F.length(c) <= 100_000)).cast("bigint")
    q_e7 = (
        len_ok * 4_000_000
        + (F.lit(1_000_000) - F.least(punct_ppm * 5, F.lit(1_000_000))) * 3
        + F.least(space_ppm * 5, F.lit(1_000_000)) * 3
    )
    return df.withColumns(
        {
            "len_ok": len_ok.cast("int"),
            "punct_ratio": punct_ppm / F.lit(1_000_000.0),
            "space_ratio": space_ppm / F.lit(1_000_000.0),
            "mean_token_len": mtl_ppm / F.lit(1_000_000.0),
            "quality": q_e7 / F.lit(10_000_000.0),
        }
    )


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text —
    the exact-dedup key. (Shingle rolling-hash fingerprints for near-dup are
    in operators/dedup.py.)"""
    norm = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.md5(norm)
