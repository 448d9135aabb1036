"""INSERT-statement dump parser (SURVEY §2.1 S12) — restore a reference-style
``.sql`` dump (multi-row ``INSERT INTO … VALUES (…),(…);``) into a DataFrame.

The reference streams each dump file and executes its INSERT statements
against MySQL (/root/reference/src/myloader/myloader_restore.c:193-199;
filename routing myloader_process_filename.c). Spark-first re-expression:
the dump is *data*, not statements — parse the VALUES tuples back into rows
and let any sink re-emit them.

Scale shape: ``spark.read.text`` splits the dump across tasks by line, and
the MySQL escaping matrix (mysql_real_escape_string — our writer mirrors it
in sinks/writers.py:_sql_literal) guarantees ``\\n``/``\\r`` inside values
are backslash-escaped, so a tuple never spans physical lines and line-level
parallelism is safe. Parsing is a character-level state machine (quoted
strings, doubled quotes, backslash escapes, NULL, 0x binary) that SQL
built-ins can't express, so it runs as Arrow-batched ``mapInPandas`` —
the sanctioned Python path — and everything after it (type casts, unhex)
is back in codegen.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: MySQL backslash-escape map (mysql_real_escape_string inverse)
_UNESCAPE = {
    "0": "\x00",
    "n": "\n",
    "t": "\t",
    "r": "\r",
    "b": "\b",
    "Z": "\x1a",
    "'": "'",
    '"': '"',
    "\\": "\\",
}


def _find_values_kw(s: str) -> int:
    """Index just past the VALUES keyword, scanning outside quoted/backticked
    regions (a table or column named `values` must not trigger)."""
    in_bt = in_sq = False
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if in_sq:
            if ch == "\\":
                i += 2
                continue
            if ch == "'":
                in_sq = False
        elif in_bt:
            if ch == "`":
                in_bt = False
        else:
            if ch == "'":
                in_sq = True
            elif ch == "`":
                in_bt = True
            elif (
                s[i : i + 6].upper() == "VALUES"
                and (i + 6 >= n or not (s[i + 6].isalnum() or s[i + 6] == "_"))
                and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_"))
            ):
                return i + 6
        i += 1
    return -1


def parse_tuples(line: str) -> list[list[str | None]]:
    """Parse every ``(v1, v2, …)`` tuple on one physical line.

    Accepts full statements (``INSERT … VALUES (…),(…);``), reference-style
    continuation lines that start at ``(``, and returns [] for anything else
    (comments, SET, DDL). Values come back as strings, with ``None`` for the
    unquoted NULL literal; unquoted tokens (numbers, 0xHEX) are passed
    through verbatim for the typed cast to interpret."""
    s = line.strip()
    if not s or s.startswith(("/*", "--", "#")):
        return []
    head = s[:8].upper()
    if head.startswith(("INSERT", "REPLACE")):
        start = _find_values_kw(s)
        if start < 0:
            return []
    elif s[0] == "(":
        start = 0
    else:
        return []

    out: list[list[str | None]] = []
    i, n = start, len(s)
    while i < n:
        while i < n and s[i] != "(":
            i += 1
        if i >= n:
            break
        i += 1
        vals: list[str | None] = []
        buf: list[str] = []
        quoted = False
        in_str = False
        while i < n:
            ch = s[i]
            if in_str:
                if ch == "\\" and i + 1 < n:
                    buf.append(_UNESCAPE.get(s[i + 1], s[i + 1]))
                    i += 2
                    continue
                if ch == "'":
                    if i + 1 < n and s[i + 1] == "'":  # doubled-quote escape
                        buf.append("'")
                        i += 2
                        continue
                    in_str = False
                    i += 1
                    continue
                buf.append(ch)
                i += 1
                continue
            if ch == "'":
                # drop a charset-introducer prefix (`_binary 'x'`,
                # `_utf8mb4'x'` — mydumper_write.c:698-699 emits the
                # _binary form without --hex-blob): MySQL grammar allows
                # only an introducer or whitespace before a quoted
                # literal, and leaking it into the value corrupts it
                if buf and "".join(buf).strip().startswith("_"):
                    buf = []
                in_str = True
                quoted = True
                i += 1
                continue
            if ch in ",)":
                if quoted:
                    vals.append("".join(buf))
                else:
                    tok = "".join(buf).strip()
                    vals.append(None if tok.upper() == "NULL" else tok)
                buf = []
                quoted = False
                i += 1
                if ch == ")":
                    out.append(vals)
                    break
                continue
            if not quoted:
                buf.append(ch)
            # after a closing quote, anything before the separator is
            # insignificant whitespace — drop it
            i += 1
    return out


def _as_struct(schema: T.StructType | str) -> T.StructType:
    if isinstance(schema, T.StructType):
        return schema
    return T.StructType.fromDDL(schema)


def typed_from_strings(df: DataFrame, schema: T.StructType | str) -> DataFrame:
    """Cast the all-strings parse output to the target schema — plain
    Catalyst casts; binary columns decode the reference's 0xHEX form."""
    schema = _as_struct(schema)
    cols = []
    for f in schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, T.BinaryType):
            # two wire forms (mydumper_write.c:386-388, 684-699):
            # --hex-blob 0xHEX decodes exactly; the quoted `_binary '…'`
            # form re-encodes the unescaped string's codepoints as
            # latin-1 bytes — exact for the escape-matrix output as long
            # as the dump's raw bytes survived the utf-8 text read (a
            # quoted binary value with bytes >0x7F is already lossy at
            # spark.read.text; --hex-blob is the fidelity path, which is
            # why our own sql-format writer always hex-encodes binary).
            # Treating EVERY value as hex corrupted quoted forms to
            # NULL/garbage. Residual ambiguity (accepted): a QUOTED
            # binary value whose bytes spell a complete 0xHEX token
            # ('0x41' as literal text) still decodes as hex — quoting is
            # erased by parse_tuples before typing. Unreachable from our
            # own dumps (the sql writer always hex-encodes binary) and
            # vanishingly rare in foreign ones.
            hexish = c.rlike("^0[xX][0-9A-Fa-f]*$")
            cols.append(
                F.when(c.isNull(), F.lit(None).cast("binary"))
                .when(hexish, F.unhex(F.regexp_replace(c, "^0[xX]", "")))
                .otherwise(F.encode(c, "ISO-8859-1"))
                .alias(f.name))
        else:
            cols.append(c.cast(f.dataType).alias(f.name))
    return df.select(*cols)


def read_insert_sql(
    spark: SparkSession, path: str | list[str], schema: T.StructType | str
) -> DataFrame:
    """Read a ``.sql`` INSERT dump (file, directory, glob, or list of paths)
    into a typed DataFrame. ``schema`` is required — in a reference dump it
    lives in the sibling ``db.table-schema.sql`` file, not the data file."""
    import pandas as pd

    schema = _as_struct(schema)
    names = [f.name for f in schema.fields]
    n_cols = len(names)
    str_schema = T.StructType([T.StructField(nm, T.StringType(), True) for nm in names])

    def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[list[str | None]] = []
            for line in pdf["value"]:
                for tup in parse_tuples(line):
                    if len(tup) != n_cols:
                        raise ValueError(
                            f"INSERT tuple has {len(tup)} values, schema has "
                            f"{n_cols}: {line[:120]!r}"
                        )
                    rows.append(tup)
            yield pd.DataFrame(rows, columns=names, dtype=object)

    raw = spark.read.text(path)
    parsed = raw.mapInPandas(parse_batches, schema=str_schema)
    return typed_from_strings(parsed, schema)
