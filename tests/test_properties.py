"""Property-based tests (hypothesis) for driver-side planner/protocol logic.

The chunk-planner's contract — every row matches exactly one predicate — is
checked here against DuckDB over arbitrary integer multisets (including
NULLs and duplicates), independently of Spark. The reference proves the same
property indirectly via roundtrip checksums (test_mydumper.sh:248-249).
"""

from __future__ import annotations

import io

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from mydumper_spark.planner.chunks import _ranges_to_predicates


@st.composite
def values_and_bounds(draw):
    vals = draw(
        st.lists(
            st.one_of(st.integers(-10_000, 10_000), st.none()),
            min_size=1,
            max_size=200,
        )
    )
    nonnull = sorted({v for v in vals if v is not None})
    if len(nonnull) < 2:
        return vals, []
    n_bounds = draw(st.integers(0, 6))
    idxs = {
        draw(st.integers(0, len(nonnull) - 1), label=f"bound{i}")
        for i in range(n_bounds)
    }
    idxs |= {0, len(nonnull) - 1}
    bounds = sorted({nonnull[i] for i in idxs})
    return vals, bounds


@settings(max_examples=200, deadline=None)
@given(values_and_bounds())
def test_chunk_predicates_partition_exactly(vb):
    vals, bounds = vb
    if len(bounds) < 2:
        return
    has_null = any(v is None for v in vals)
    preds = _ranges_to_predicates("c", bounds, include_null_first=has_null)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(c INTEGER)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    total = con.execute("SELECT count(*) FROM t").fetchone()[0]
    per_chunk = [
        con.execute(f"SELECT count(*) FROM t WHERE {p}").fetchone()[0] for p in preds
    ]
    # disjoint AND covering: counts add up to the table size exactly
    assert sum(per_chunk) == total == len(vals)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(
                alphabet="abcdefXYZ0123456789_.-% ü",
                min_size=1,
                max_size=40,
            ),
            st.binary(max_size=2048),
        ),
        max_size=8,
        unique_by=lambda t: t[0],
    )
)
def test_stream_protocol_roundtrip(frames):
    from mydumper_spark.streaming.protocol import read_frames, write_frame

    buf = io.BytesIO()
    for name, payload in frames:
        write_frame(buf, name, payload)
    buf.seek(0)
    assert list(read_frames(buf)) == [(n, p) for n, p in frames]


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(-(2**63), 2**63 - 1), min_size=1, max_size=64))
def test_checksum_fold_order_independent(hashes):
    """The manifest checksum must be invariant under any row order — xor fold
    modeled directly."""
    import random

    fold = 0
    for h in hashes:
        fold ^= h
    shuffled = list(hashes)
    random.shuffle(shuffled)
    fold2 = 0
    for h in shuffled:
        fold2 ^= h
    assert fold == fold2


# -- INSERT-dump parser: escape→parse inversion ------------------------------

_ESCAPES = (
    ("\\", "\\\\"), ("'", "\\'"), ("\x00", "\\0"),
    ("\n", "\\n"), ("\r", "\\r"), ("\x1a", "\\Z"),
)


def _mysql_escape(s: str) -> str:
    """mysql_real_escape_string forward map (the writer's matrix,
    sinks/writers.py:_sql_literal)."""
    for raw, esc in _ESCAPES:
        s = s.replace(raw, esc)
    return s


@st.composite
def insert_rows(draw):
    width = draw(st.integers(1, 5))
    cell = st.one_of(
        st.none(),
        st.integers(-(10**9), 10**9),
        st.text(max_size=40),  # arbitrary unicode incl. quotes/commas/parens
    )
    rows = draw(st.lists(st.lists(cell, min_size=width, max_size=width),
                         min_size=1, max_size=6))
    return rows


@settings(max_examples=300, deadline=None)
@given(insert_rows())
def test_insert_parser_inverts_escaping(rows):
    """For ANY cell values, writer-style escaping → parse_tuples recovers
    them exactly: the parser must invert the escaping matrix, tolerate
    quotes/commas/parens inside strings, and keep NULL vs '' distinct."""
    from mydumper_spark.sources.insert_parser import parse_tuples

    def lit(v):
        if v is None:
            return "NULL"
        if isinstance(v, int):
            return str(v)
        return "'" + _mysql_escape(v) + "'"

    stmt = (
        "INSERT INTO `t` VALUES "
        + ",".join("(" + ",".join(lit(v) for v in row) + ")" for row in rows)
        + ";"
    )
    assert "\n" not in stmt  # the line-parallelism invariant itself
    got = parse_tuples(stmt)
    want = [[v if v is None else str(v) for v in row] for row in rows]
    assert got == want

    # the with_quoted variant is the same parse plus a flag — stripping
    # the flags must reproduce the default output exactly, and the flag
    # must be True iff the literal was rendered quoted (strings; ints
    # and NULL are bare)
    flagged = parse_tuples(stmt, with_quoted=True)
    assert [[v for v, _ in tup] for tup in flagged] == want
    for row, tup in zip(rows, flagged):
        for v, (_, q) in zip(row, tup):
            assert q == isinstance(v, str)


# -- corpus chunking/packing boundary arithmetic ------------------------------
#
# The Spark expressions in operators/corpus.py are pure integer arithmetic
# over (n, max_tokens, overlap, budget); these properties check the same
# formulas across the whole parameter space, Spark-free. Both round-5 bug
# classes lived exactly here: a start past n-1-overlap emitted a
# pure-overlap duplicate chunk, and the packing fill-level claim was
# asymmetric in the wrong direction.


def _chunk_spans(n: int, max_tokens: int, overlap: int) -> list[tuple[int, int]]:
    """Mirror of chunk_documents' start sequence: [start, end) spans."""
    stride = max_tokens - overlap
    upper = max(n - 1 - overlap, 0)
    starts = list(range(0, upper + 1, stride))
    return [(s, min(s + max_tokens, n)) for s in starts]


@given(
    st.integers(1, 500),
    st.integers(2, 64),
    st.integers(0, 62),
)
@settings(max_examples=300, deadline=None)
def test_chunk_spans_cover_exactly_once_with_overlap(n, max_tokens, overlap):
    if overlap >= max_tokens:
        overlap = max_tokens - 1
    spans = _chunk_spans(n, max_tokens, overlap)
    # coverage: dropping each non-first span's overlap prefix tiles [0, n)
    rebuilt = []
    for i, (s, e) in enumerate(spans):
        lo = s if i == 0 else s + overlap
        assert lo < e, (n, max_tokens, overlap, spans)  # no pure-overlap chunk
        rebuilt.extend(range(lo, e))
    assert rebuilt == list(range(n)), (n, max_tokens, overlap, spans)
    # every span is a genuine window: ≤ max_tokens tokens, > 0
    assert all(0 < e - s <= max_tokens for s, e in spans)


@given(
    st.lists(st.integers(1, 64), min_size=1, max_size=300),
    st.integers(8, 4096),
)
@settings(max_examples=300, deadline=None)
def test_pack_binning_fill_bounds_and_conservation(sizes, budget):
    max_chunk = max(sizes)
    pre = 0
    bins: dict[int, int] = {}
    for sz in sizes:
        b = pre // budget
        bins[b] = bins.get(b, 0) + sz
        pre += sz
    # conservation
    assert sum(bins.values()) == sum(sizes)
    # bin ids are contiguous from 0 (no empty bins skipped... except when a
    # single chunk is larger than the budget, which may jump bins)
    if max_chunk <= budget:
        assert sorted(bins) == list(range(len(bins)))
    # fill bounds: every non-last bin within one chunk of the budget
    last = max(bins)
    for b, total in bins.items():
        if b != last and max_chunk <= budget:
            assert budget - max_chunk < total < budget + max_chunk, (
                b, total, budget, max_chunk)


# -- DDL mapping round-trip (restore-side CREATE <-> dump-side schema parse) --

_DDL_TYPES = {
    "tinyint": None, "smallint": None, "int": None, "bigint": None,
    "float": None, "double": None, "string": None, "binary": None,
    "timestamp": None, "date": None, "decimal(12,2)": None,
    "decimal(38,0)": None,
}


def _mk_type(name):
    from pyspark.sql import types as T

    simple = {
        "tinyint": T.ByteType(), "smallint": T.ShortType(),
        "int": T.IntegerType(), "bigint": T.LongType(),
        "float": T.FloatType(), "double": T.DoubleType(),
        "string": T.StringType(), "binary": T.BinaryType(),
        "timestamp": T.TimestampType(), "date": T.DateType(),
    }
    if name in simple:
        return simple[name]
    p, s = name[len("decimal("):-1].split(",")
    return T.DecimalType(int(p), int(s))


@given(
    st.lists(
        st.tuples(
            st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True),
            st.sampled_from(sorted(_DDL_TYPES)),
        ),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=60, deadline=None)
def test_create_table_ddl_roundtrips_through_schema_parser(cols):
    """create_table_ddl(mysql) output must parse back to the same Spark
    types via schema_from_create_table -- the dump-side parser and the
    restore-side generator are inverse maps on the common type set (the
    parser maps MySQL FLOAT->float, TEXT->string, LONGBLOB->binary,
    DATETIME->timestamp, DECIMAL(p,s) verbatim)."""
    from pyspark.sql.types import StructField, StructType

    from mydumper_spark.plans.ddl import create_table_ddl, schema_from_create_table

    schema = StructType([StructField(n, _mk_type(t), True) for n, t in cols])
    ddl = create_table_ddl("t", schema, dialect="mysql")
    parsed = schema_from_create_table(ddl)
    got = {}
    for part in parsed.split(", "):
        name, typ = part.split("` ", 1)
        got[name.lstrip("`")] = typ
    assert got == dict(cols), (ddl, parsed)


# --- round 7: driver-side BPE merge-loop properties (no Spark needed) ---

_words = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=8),
    min_size=1, max_size=30,
)


@given(_words)
@settings(max_examples=60, deadline=None)
def test_bpe_encode_is_lossless_and_deterministic(words):
    """For ANY corpus: encoding then stripping the end-of-word marker
    reconstructs the words exactly (BPE merges only ever concatenate
    adjacent units), and training is a pure function of the frequency
    dict."""
    from collections import Counter

    from mydumper_spark.operators.tokenizer import (
        EOW, _encode_word, train_bpe_merges,
    )

    freqs = sorted(Counter(words).items(), key=lambda kv: (-kv[1], kv[0]))
    merges = train_bpe_merges(freqs, num_merges=20)
    assert merges == train_bpe_merges(list(freqs), num_merges=20)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in set(words):
        toks = _encode_word(w, ranks)
        assert "".join(toks) == w + EOW      # lossless
        assert all(t for t in toks)          # no empty units


@st.composite
def _corpus(draw):
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]
    docs = draw(st.lists(
        st.lists(st.sampled_from(vocab), min_size=0, max_size=25),
        min_size=1, max_size=12))
    return [" ".join(d) for d in docs]


@given(_corpus())
@settings(max_examples=15, deadline=None)
def test_substring_dedup_conservation_properties(texts):
    """For ANY corpus: per doc, kept + removed == total tokens; surviving
    tokens are a subsequence of the original; the globally-first
    occurrence of every duplicated k-gram is never excised (some doc
    retains each gram's text); and token mass never grows."""
    from mydumper_spark.operators.corpus import exact_substring_dedup
    from mydumper_spark.session import get_session

    spark = get_session("tests", master="local[*]", shuffle_partitions=32)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in exact_substring_dedup(df, k=3).collect()}
    assert set(out) == set(range(len(texts)))
    for i, t in enumerate(texts):
        orig = t.split()
        kept = out[i]["clean_text"].split()
        assert out[i]["n_tokens_kept"] + out[i]["n_tokens_removed"] == len(orig)
        assert len(kept) == out[i]["n_tokens_kept"]
        # subsequence check
        it = iter(orig)
        assert all(any(o == k for o in it) for k in kept)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.floats(-1e6, 1e6, allow_nan=False, width=32),
             min_size=1, max_size=64),
    st.floats(1e-6, 1e6, allow_nan=False),
)
def test_sq8_quantize_properties(vec, scale):
    """The SQ8 quantizer (the Python query-side twin the cross-engine
    exactness hinges on): codes stay in [-127,127]; quantization is
    monotone per component; signs are preserved; inside the clamp region
    the reconstruction error is at most half a bucket; near-odd symmetry
    holds (round-half-up differs from odd symmetry by at most one code)."""
    from mydumper_spark.operators.similarity import sq8_quantize

    codes = sq8_quantize(vec, scale)
    assert all(-127 <= c <= 127 for c in codes)
    for v, c in zip(vec, codes):
        if v > 0:
            assert c >= 0
        if v < 0:
            assert c <= 0
        if abs(v) <= scale:  # un-clamped region: half-bucket error bound
            assert abs(c - v * 127.0 / scale) <= 0.5 + 1e-9
    neg = sq8_quantize([-v for v in vec], scale)
    assert all(abs(c + n) <= 1 for c, n in zip(codes, neg))
    # monotone: sorting the inputs sorts the codes
    s = sorted(vec)
    cs = sq8_quantize(s, scale)
    assert cs == sorted(cs)
    # degenerate scale: all zeros
    assert sq8_quantize(vec, 0.0) == [0] * len(vec)


@settings(max_examples=200, deadline=None)
@given(
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=120),
    st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True),
    st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True),
)
def test_retarget_database_properties(body, old, new):
    """The -B DDL rewrite: idempotent (retargeting twice = once), total
    (never raises), and complete — no word-boundary `old.` qualifier
    survives in the output when old is not a prefix-free collision with
    the replacement."""
    import re

    from mydumper_spark.plans.ddl import retarget_database

    if old == new or old in new:
        return  # replacement containing the needle re-introduces matches
    out = retarget_database(body, old, new, "ansi")
    assert retarget_database(out, old, new, "ansi") == out  # idempotent
    # completeness: no unquoted word-boundary old. remains
    assert not re.search(rf'(?<![\w`"]){re.escape(old)}\.', out)
    assert f"`{old}`." not in out and f'"{old}".' not in out


# -- LoaderDag retry/resume invariants under random failure injection --------


def test_loader_dag_randomized_retry_resume_invariants():
    """Seeded random DAGs with injected failures: a job that fails more
    times than its retry budget must end failed (never falsely ok), one
    within budget must end ok; the persisted resume log must make a
    second run re-execute EXACTLY the failures (completed jobs never
    re-run, failed jobs never skipped)."""
    import random
    import threading

    from mydumper_spark.plans.loader_dag import LoadJob, LoaderDag, Phase

    rng = random.Random(11)
    for _ in range(60):
        tables = [f"t{i}" for i in range(rng.randint(1, 10))]
        fail_counts: dict = {}
        always_failed: set = set()
        lock = threading.Lock()

        def make_action(key, always):
            def action():
                with lock:
                    rem = fail_counts.get(key, 0)
                    if always or rem > 0:
                        if rem > 0:
                            fail_counts[key] = rem - 1
                        raise RuntimeError(f"boom {key}")
            return action

        dag = LoaderDag(parallelism=rng.choice([1, 2, 4]))
        for t in tables:
            for ph in (Phase.SCHEMA, Phase.DATA):
                key = (t, ph.name)
                k, r = rng.choice([0, 0, 0, 1, 2, 3]), rng.randint(0, 2)
                always = rng.random() < 0.08
                fail_counts[key] = 0 if always else k
                if always or k > r:
                    always_failed.add(key)
                dag.add(LoadJob(table=t, phase=ph,
                                action=make_action(key, always), retries=r))
        results = dag.run(fail_fast=False)
        for t in tables:
            for ph in (Phase.SCHEMA, Phase.DATA):
                if ph == Phase.DATA and (t, "SCHEMA") in always_failed:
                    continue  # dependent job — its own verdict is moot
                res = results[(t, ph)]
                assert res.ok == ((t, ph.name) not in always_failed), (
                    t, ph, res.error)
        # resume: only failures re-run
        log = set(dag.resume_log)
        reran: dict = {}
        dag2 = LoaderDag(resume_log=set(log))
        for t in tables:
            for ph in (Phase.SCHEMA, Phase.DATA):
                dag2.add(LoadJob(
                    table=t, phase=ph,
                    action=(lambda k=(t, ph.name):
                            reran.__setitem__(k, reran.get(k, 0) + 1))))
        dag2.run(fail_fast=False)
        for (t, phn), cnt in reran.items():
            assert f"{t}:{phn}" not in log, (t, phn)  # completed never re-ran
        for t in tables:
            for phn in ("SCHEMA", "DATA"):
                if f"{t}:{phn}" not in log:
                    assert (t, phn) in reran, (t, phn)  # failures always re-ran


# -- stream protocol: frame roundtrip under hostile payloads/names -----------


def test_stream_protocol_randomized_roundtrip(tmp_path):
    """Seeded random directories (binary payloads — including ones that
    embed fake frame markers — unicode/space/hidden filenames) must
    stream → read_frames → restore_directory byte-identically, with the
    INI metadata file framed dead last (the reference's dump-complete
    signal)."""
    import io
    import os
    import random

    from mydumper_spark.streaming.protocol import (
        read_frames,
        restore_directory,
        stream_directory,
    )

    rng = random.Random(13)
    for trial in range(8):
        src = tmp_path / f"src{trial}"
        src.mkdir()
        names = set()
        for i in range(rng.randint(1, 8)):
            name = rng.choice([
                f"db.t{i}.{i:05d}.sql", f"t{i}.parquet", "metadata",
                f"weird name {i}.sql", f"uni_ключ_{i}.dat",
                f"a-b_{i}.sql.gz", f".hidden{i}",
            ])
            if name in names:
                continue
            names.add(name)
            payload = bytes(rng.getrandbits(8)
                            for _ in range(rng.randint(0, 4000)))
            if rng.random() < 0.5:  # embed a fake frame marker
                payload += b"\n-- fakefile 123\n" + payload
            (src / name).write_bytes(payload)
        buf = io.BytesIO()
        stream_directory(buf, str(src))
        buf.seek(0)
        frames = list(read_frames(buf))
        got = [n for n, _ in frames]
        assert set(got) == names
        if "metadata" in names:
            assert got[-1] == "metadata", got
        for n, payload in frames:
            assert payload == (src / n).read_bytes(), n
        buf.seek(0)
        tgt = tmp_path / f"tgt{trial}"
        restore_directory(buf, str(tgt))
        for n in names:
            assert (tgt / n).read_bytes() == (src / n).read_bytes(), n
