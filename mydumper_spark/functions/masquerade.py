"""Masquerade — the reference's scalar-function / anonymization surface.

Reference: per-column chainable function pipelines, dispatched by name prefix
(/root/reference/src/mydumper/mydumper_masquerade.c:627-696, applied per row
in mydumper_write.c:709-771). Re-expressed as Column→Column combinators built
from native pyspark.sql.functions so the whole pipeline stays inside
whole-stage codegen — no Python in the row path.

Design deviations, on purpose:
- **Determinism.** The reference draws from ``g_random_int`` at dump time, so
  two runs differ. Every "random" function here is seeded from a key column
  (or an explicit seed) via ``xxhash64``, which makes runs reproducible,
  testable, and — crucially — makes ``WITH_MEM`` (equal inputs → equal fakes,
  masquerade.c:99-149) a *stateless* property instead of a shared memo table.
  A hash-keyed generator is the only version of WITH_MEM that works on 1000
  executors without coordination.
- **UNIQUE** (masquerade.c:118-123: reject collisions and retry) becomes
  "salt with an unconditionally unique value" — collision-free by
  construction, no retry loop, no global state.

Functions (SURVEY §2.4): T1 identity, T2 random_int, T3 random_string,
T4 random_uuid, T5 random_format, T6 regex, T7 apply, T8 constant, T9 null,
T10 WITH_MEM, T11 UNIQUE, T12 REPLACE_NULL/MAX_LENGTH.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ALPHABET = "abcdefghijklmnopqrstuvwxyz"


def _hash01(col: Column, seed: int = 0) -> Column:
    """Deterministic uniform [0,1) derived from the input value — the keyed
    entropy source behind every masquerade function (gives WITH_MEM/T10
    semantics for free)."""
    h = F.xxhash64(col.cast("string"), F.lit(seed))
    return (F.pmod(h, F.lit(1_000_000_007)).cast("double")) / F.lit(1_000_000_007.0)


def identity(col: Column) -> Column:
    """T1 — masquerade.c:87-93."""
    return col


def random_int(col: Column, seed: int = 0) -> Column:
    """T2: random digits of the same length as the input value
    (masquerade.c:152-161). Length-preserving, deterministic per input."""
    n = F.length(col.cast("string"))
    h = F.lpad(
        F.pmod(F.xxhash64(col.cast("string"), F.lit(seed)), F.lit(10**18)).cast("string"),
        18,
        "0",
    )
    digits = F.concat(h, h, h)  # covers lengths up to 54; reference caps at MAX_LENGTH
    return F.when(col.isNull(), F.lit(None)).otherwise(F.substring(digits, F.lit(1), n))


def random_string(col: Column, seed: int = 0) -> Column:
    """T3: random [a-z] string of the input's length (masquerade.c:163-178).

    Built JVM-side: hash → digit stream across three independent draws,
    translated into letters (stays inside whole-stage codegen)."""
    src = F.concat_ws(
        "",
        *[
            F.lpad(
                F.pmod(F.xxhash64(col.cast("string"), F.lit(seed + i)), F.lit(10**18)).cast(
                    "string"
                ),
                18,
                "0",
            )
            for i in range(3)
        ],
    )
    letters = F.translate(src, "0123456789", "abcdefghij")
    n = F.length(col.cast("string"))
    return F.when(col.isNull(), F.lit(None)).otherwise(F.substring(letters, F.lit(1), n))


def random_uuid(col: Column, seed: int = 0) -> Column:
    """T4: v4-shaped uuid (masquerade.c:180-205), deterministic per input."""
    h1 = F.lower(F.hex(F.xxhash64(col.cast("string"), F.lit(seed))))
    h2 = F.lower(F.hex(F.xxhash64(col.cast("string"), F.lit(seed + 1))))
    hx = F.rpad(F.concat(h1, h2), 32, "0")
    return F.concat_ws(
        "-",
        F.substring(hx, 1, 8),
        F.substring(hx, 9, 4),
        F.concat(F.lit("4"), F.substring(hx, 14, 3)),
        F.concat(F.lit("a"), F.substring(hx, 18, 3)),
        F.substring(hx, 21, 12),
    )


def random_format(col: Column, template: list, seed: int = 0) -> Column:
    """T5: template engine (masquerade.c:207-282, parser :473-623).

    ``template`` is a list of parts:
      ("const", "text")          — literal (reference: quoted constants)
      ("string", n)              — n random lowercase chars   (<string N>)
      ("number", n)              — n random digits            (<number N>)
      ("dict", [values...])      — pick from a dictionary     (<file path>)
    The reference streams dictionary files into memory per thread
    (masquerade.c:215-221, a string-length-keyed lookup-table semijoin); here
    small dictionaries are inlined into the plan (array + element_at), large
    ones should go through :func:`dict_lookup` (broadcast join).
    """
    parts: list[Column] = []
    for i, (kind, arg) in enumerate(template):
        if kind == "const":
            parts.append(F.lit(arg))
        elif kind == "string":
            parts.append(random_string(F.concat(col.cast("string"), F.lit(f"#{i}")), seed + i))
            parts[-1] = F.substring(F.rpad(parts[-1], int(arg), "x"), 1, int(arg))
        elif kind == "number":
            parts.append(
                F.lpad(
                    F.pmod(
                        F.xxhash64(col.cast("string"), F.lit(seed + i)), F.lit(10 ** int(arg))
                    ).cast("string"),
                    int(arg),
                    "0",
                )
            )
        elif kind == "dict":
            arr = F.array(*[F.lit(v) for v in arg])
            idx = F.pmod(F.xxhash64(col.cast("string"), F.lit(seed + i)), F.lit(len(arg))) + 1
            parts.append(F.element_at(arr, idx.cast("int")))
        else:
            raise ValueError(f"unknown template part: {kind}")
    return F.concat(*parts)


def dict_lookup(df: DataFrame, col_name: str, dictionary: DataFrame, out_col: str) -> DataFrame:
    """T5 at scale: the <file> dictionary as a broadcast hash join instead of
    a per-thread in-memory array (reference semantics: pick a replacement
    keyed by the input, masquerade.c:215-221). ``dictionary`` has columns
    (bucket, value); rows are matched by hash bucket of the input."""
    n_buckets = dictionary.select("bucket").distinct().count()
    keyed = df.withColumn(
        "__bucket", F.pmod(F.xxhash64(F.col(col_name).cast("string")), F.lit(n_buckets))
    )
    joined = keyed.join(
        F.broadcast(dictionary.withColumnRenamed("value", out_col)),
        keyed["__bucket"] == dictionary["bucket"],
        "left",
    )
    return joined.drop("bucket", "__bucket")


def regex_replace(col: Column, pairs: list[tuple[str, str]]) -> Column:
    """T6: chained global PCRE substitutions (masquerade.c:284-309)."""
    out = col
    for pattern, replacement in pairs:
        out = F.regexp_replace(out, pattern, replacement)
    return out


def apply_wrap(col: Column, prefix: str = "", suffix: str = "") -> Column:
    """T7: prefix || value [|| suffix] (masquerade.c:311-318)."""
    return F.concat(F.lit(prefix), col.cast("string"), F.lit(suffix))


def constant(value) -> Column:
    """T8 — masquerade.c:320-325."""
    return F.lit(value)


def null() -> Column:
    """T9 — masquerade.c:327-335."""
    return F.lit(None)


def with_mem(fn, col: Column, **kw) -> Column:
    """T10: equal inputs → equal outputs across rows *and tables*
    (masquerade.c:99-149). Our generators are hash-keyed on the input, so
    WITH_MEM is the default behavior; this wrapper exists for API parity."""
    return fn(col, **kw)


def unique(col: Column, generated: Column) -> Column:
    """T11: collision-free fakes (masquerade.c:118-123, 384-385). Instead of
    the reference's retry loop we append a salt that is unique by
    construction. Deterministic given a stable sort key is not required by
    the reference (its retries aren't either)."""
    return F.concat(generated.cast("string"), F.lit("-"), F.monotonically_increasing_id())


def replace_null(col: Column, generated: Column) -> Column:
    """T12 REPLACE_NULL (masquerade.c:369-383)."""
    return F.coalesce(col, generated)


def max_length(col: Column, n: int) -> Column:
    """T12 MAX_LENGTH (masquerade.c:386-397)."""
    return F.substring(col.cast("string"), 1, n)


#: name → builder registry, mirroring identify_function_type_2
#: (masquerade.c:627-659)
REGISTRY = {
    "identity": identity,
    "random_int": random_int,
    "random_string": random_string,
    "random_uuid": random_uuid,
    "random_format": random_format,
    "regex": regex_replace,
    "apply": apply_wrap,
    "constant": lambda col, value=None: constant(value),
    "null": lambda col: null(),
}


def apply_pipeline(df: DataFrame, column_pipelines: dict[str, list]) -> DataFrame:
    """Apply per-column masquerade pipelines (the reference's per-table
    function array, mydumper_write.c:449-456).

    ``column_pipelines`` maps column name → list of (fn_name, kwargs)."""
    out = df
    for col_name, steps in column_pipelines.items():
        c: Column = F.col(col_name)
        for fn_name, kwargs in steps:
            c = REGISTRY[fn_name](c, **kwargs)
        out = out.withColumn(col_name, c.cast(dict(df.dtypes).get(col_name, "string")))
    return out
