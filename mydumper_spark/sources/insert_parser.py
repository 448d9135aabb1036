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

Binary fidelity: when the target schema has binary columns the file is
read byte-faithfully (latin-1 line reader — bytes↔codepoints 1:1), so a
stock reference dump's quoted ``_binary '…'`` values with raw bytes >0x7F
(mydumper_write.c:684-699, the default without --hex-blob) round-trip
exactly, and parse_tuples' was-quoted bit guarantees a quoted literal
``'0x41'`` is never mistaken for the hex wire form.
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


def parse_tuples(line: str, with_quoted: bool = False) -> list:
    """Parse every ``(v1, v2, …)`` tuple on one physical line.

    Accepts full statements (``INSERT … VALUES (…),(…);``), reference-style
    continuation lines that start at ``(``, and returns [] for anything else
    (comments, SET, DDL). Values come back as strings, with ``None`` for the
    unquoted NULL literal; unquoted tokens (numbers, 0xHEX) are passed
    through verbatim for the typed cast to interpret.

    With ``with_quoted=True`` each value is a ``(value, was_quoted)`` pair so
    the typed cast can distinguish the reference's two binary wire forms
    without guessing: an UNQUOTED ``0xHEX`` token (--hex-blob,
    mydumper_write.c:386-388) hex-decodes, while a QUOTED value is always
    literal bytes — even when it happens to spell ``'0x41'``."""
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
                    val = "".join(buf)
                else:
                    tok = "".join(buf).strip()
                    val = None if tok.upper() == "NULL" else tok
                vals.append((val, quoted) if with_quoted else val)
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


def typed_from_strings(
    df: DataFrame,
    schema: T.StructType | str,
    quoted_cols: dict[str, str] | None = None,
    latin1_text: bool = False,
) -> DataFrame:
    """Cast the all-strings parse output to the target schema — plain
    Catalyst casts; binary columns decode the reference's two wire forms
    (mydumper_write.c:386-388 ``0xHEX`` under --hex-blob, :684-699 quoted
    ``_binary '…'`` by default).

    ``quoted_cols`` maps a binary field name to the boolean column carrying
    parse_tuples' was-quoted bit: with it, a QUOTED value is always literal
    bytes (a foreign dump's ``'0x41'`` stays the four characters ``0x41``)
    and only an UNQUOTED ``0xHEX`` token hex-decodes — no guessing. Without
    it (legacy callers) the old heuristic applies: values that spell a
    complete ``0xHEX`` token decode as hex.

    ``latin1_text=True`` says the source file was read byte-faithfully as
    latin-1 (read_insert_sql does this whenever the schema has binary
    columns): binary columns re-encode to their exact original bytes, and
    string columns re-decode those bytes as the UTF-8 the dump actually
    contains."""
    schema = _as_struct(schema)
    quoted_cols = quoted_cols or {}
    cols = []
    for f in schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, T.BinaryType):
            as_bytes = F.encode(c, "ISO-8859-1")
            hexish = c.rlike("^0[xX][0-9A-Fa-f]*$")
            unhexed = F.unhex(F.regexp_replace(c, "^0[xX]", ""))
            if f.name in quoted_cols:
                q = F.col(quoted_cols[f.name])
                cols.append(
                    F.when(c.isNull(), F.lit(None).cast("binary"))
                    .when(q, as_bytes)
                    .when(hexish, unhexed)
                    .otherwise(as_bytes)
                    .alias(f.name))
            else:
                # legacy heuristic (no quoted bit): hex-looking values
                # decode as hex — ambiguous for a quoted literal '0x41'
                cols.append(
                    F.when(c.isNull(), F.lit(None).cast("binary"))
                    .when(hexish, unhexed)
                    .otherwise(as_bytes)
                    .alias(f.name))
        elif latin1_text and isinstance(f.dataType, T.StringType):
            cols.append(
                F.decode(F.encode(c, "ISO-8859-1"), "UTF-8").alias(f.name))
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
    bin_idx = [i for i, f in enumerate(schema.fields)
               if isinstance(f.dataType, T.BinaryType)]
    quoted_cols = {names[i]: f"__q_{names[i]}" for i in bin_idx}
    out_names = names + [quoted_cols[names[i]] for i in bin_idx]
    str_schema = T.StructType(
        [T.StructField(nm, T.StringType(), True) for nm in names]
        + [T.StructField(quoted_cols[names[i]], T.BooleanType(), True)
           for i in bin_idx])

    def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[list] = []
            for line in pdf["value"]:
                for tup in parse_tuples(line, with_quoted=True):
                    if len(tup) != n_cols:
                        raise ValueError(
                            f"INSERT tuple has {len(tup)} values, schema has "
                            f"{n_cols}: {line[:120]!r}"
                        )
                    rows.append([v for v, _ in tup]
                                + [tup[i][1] for i in bin_idx])
            yield pd.DataFrame(rows, columns=out_names, dtype=object)

    if bin_idx:
        # byte-faithful read: a stock reference dump (no --hex-blob) emits
        # binary as quoted `_binary '…'` with raw bytes >0x7F on the wire
        # (mydumper_write.c:684-699) — spark.read.text would mangle them
        # through UTF-8. Latin-1 maps bytes↔codepoints 1:1 (reversible);
        # the separator/quote bytes below are in mysql_real_escape_string's
        # always-escaped set, so they never appear raw in a dump line and
        # each physical line surfaces as exactly one row. String columns
        # are re-decoded as UTF-8 in typed_from_strings.
        raw = (spark.read.format("csv")
               .option("sep", "\x1a")
               .option("quote", "\x00")
               .option("encoding", "ISO-8859-1")
               .option("ignoreLeadingWhiteSpace", "false")
               .option("ignoreTrailingWhiteSpace", "false")
               .schema("value string").load(path))
    else:
        raw = spark.read.text(path)
    parsed = raw.mapInPandas(parse_batches, schema=str_schema)
    return typed_from_strings(parsed, schema, quoted_cols=quoted_cols,
                              latin1_text=bool(bin_idx))
