"""mysqldump-format intake (myloader --mysqldump analogue).

The reference loader accepts a mysqldump-format stream alongside its own
layout (/root/reference/src/myloader/myloader_arguments.c:151 --mysqldump;
intake routing myloader_stream.c). A mysqldump file is ONE .sql script:
per-database ``CREATE DATABASE``/``USE`` headers, multi-line ``CREATE
TABLE`` DDL, single-line extended ``INSERT`` statements, ``DELIMITER``-
wrapped triggers/routines/events, and ``/*!NNNNN ... */`` version-gated
statements (view stand-in tables + the real ``CREATE VIEW``).

Spark-first re-expression: the file is a single-node artifact (mysqldump
itself is single-threaded), so SPLITTING it is a one-pass driver-side
stream — but everything after the split is distributed: the splitter
re-emits the reference's own dump layout (``db.table-schema.sql`` +
``db.table.00000.sql`` + object artifacts), whose data chunks then load
through the line-parallel INSERT parser (sources/insert_parser.py) on
executors. mysqldump escapes ``\\n``/``\\r`` inside values, so INSERT
statements never span physical lines and the split stays line-streamed
(bounded memory regardless of dump size).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

#: strip MySQL version-gated comment wrappers /*!NNNNN ... */ for ROUTING
#: decisions (the raw text is preserved in artifacts)
_VERSION_GATE = re.compile(r"/\*!\d{5}\s?|\s?\*/\s*$")

_RE_CREATE_DB = re.compile(
    r"^CREATE\s+DATABASE\s+(?:/\*!\d+\s+IF\s+NOT\s+EXISTS\s*\*/\s*|IF\s+NOT"
    r"\s+EXISTS\s+)?`?([^`\s]+)`?", re.I)
_RE_USE = re.compile(r"^USE\s+`?([^`;\s]+)`?", re.I)
_RE_CREATE_TABLE = re.compile(r"^CREATE\s+TABLE\s+`?([^`\s(]+)`?", re.I)
_RE_INSERT = re.compile(
    r"^(?:INSERT|REPLACE)\s+(?:IGNORE\s+)?INTO\s+`?([^`\s(]+)`?", re.I)
#: strict clause order (MySQL grammar) — a table COLUMN named `view`
#: must not route CREATE TABLE into the view branch
_RE_VIEW = re.compile(
    r"^CREATE\s+(?:OR\s+REPLACE\s+)?(?:ALGORITHM=\S+\s+)?"
    r"(?:DEFINER=\S+\s+)?(?:SQL\s+SECURITY\s+\w+\s+)?"
    r"VIEW\s+`?([^`\s(]+)`?", re.I)
_RE_OBJ = re.compile(
    r"^CREATE\b.*?\b(TRIGGER|PROCEDURE|FUNCTION|EVENT)\s+`?([^`\s(]+)`?",
    re.I | re.S)
#: statements that are session plumbing, not content
_SKIP_PREFIXES = ("SET ", "LOCK TABLES", "UNLOCK TABLES", "DROP TABLE",
                  "DROP VIEW", "DROP DATABASE", "ALTER TABLE", "START ",
                  "COMMIT", "BEGIN", "FLUSH ", "CHANGE MASTER",
                  "CHANGE REPLICATION")


def _ungate(s: str) -> str:
    """Remove the residual ``*/`` closers of interleaved version gates
    (``/*!50003 CREATE*/ /*!50017 DEFINER=…*/ /*!50003 TRIGGER …``) from
    an object's replayable DDL — the openers are already stripped."""
    return re.sub(r"\s?\*/", "", s)


@dataclass
class SplitResult:
    """What one mysqldump file contained, re-laid-out into ``out_dir``."""

    #: manifest key → {database, name, schema_path|None, data_path|None,
    #:                 create_sql|None}
    tables: dict[str, dict] = field(default_factory=dict)
    #: [{kind, database, name, raw_sql, table|None}]
    objects: list[dict] = field(default_factory=list)
    databases: list[str] = field(default_factory=list)
    skipped_statements: int = 0
    multi_db: bool = False
    #: INSERT statements that SPANNED physical lines and were flattened to
    #: one line for the line-parallel parser. mysqldump's own escaping
    #: makes this safe (\n inside values is backslash-escaped, so a real
    #: newline is always formatting), but a nonzero count means the input
    #: was post-processed (e.g. pretty-printed) — surfaced via warning.
    flattened_inserts: int = 0


def _statements(lines) -> "list[tuple[str, str]]":
    """Yield (raw_statement, first_line) pairs from a line stream,
    honoring quote state (a ``;`` inside a string literal does not end a
    statement) and ``DELIMITER`` switches (trigger/routine bodies contain
    bare ``;``)."""
    delim = ";"
    buf: list[str] = []
    in_sq = in_dq = in_bt = False
    for line in lines:
        stripped = line.strip()
        if not buf:
            if not stripped or stripped.startswith("--") or stripped == "\n":
                continue
            m = re.match(r"^DELIMITER\s+(\S+)", stripped, re.I)
            if m:
                delim = m.group(1)
                continue
        buf.append(line.rstrip("\n"))
        # advance quote state across the line (backslash escapes honored)
        i, n = 0, len(line)
        while i < n:
            ch = line[i]
            if in_sq:
                if ch == "\\":
                    i += 2
                    continue
                if ch == "'":
                    in_sq = False
            elif in_dq:
                if ch == "\\":
                    i += 2
                    continue
                if ch == '"':
                    in_dq = False
            elif in_bt:
                if ch == "`":
                    in_bt = False
            elif ch == "'":
                in_sq = True
            elif ch == '"':
                in_dq = True
            elif ch == "`":
                in_bt = True
            i += 1
        if in_sq or in_dq or in_bt:
            continue  # the statement terminator can't be on this line
        tail = line.rstrip()
        if tail.endswith(delim):
            stmt = "\n".join(buf)
            # drop the trailing delimiter (either ; or a custom one)
            stmt = stmt.rstrip()[: -len(delim)].rstrip()
            yield stmt, buf[0]
            buf = []
    if buf:  # unterminated trailing statement — surface, don't swallow
        yield "\n".join(buf), buf[0]


def _flatten_statement(raw: str) -> str:
    """One-statement-per-line rewrite for the line-parallel parser.
    mysqldump's own output never has in-value newlines (they're escaped
    at dump time), but hand-written/third-party SQL can: a physical
    newline INSIDE a quoted value is re-escaped to ``\\n`` (the exact
    form the INSERT parser unescapes back to a real newline — value
    fidelity preserved), while newlines outside quotes are pure
    formatting and become spaces."""
    out: list[str] = []
    in_sq = in_dq = in_bt = False
    i, n = 0, len(raw)
    while i < n:
        ch = raw[i]
        if in_sq or in_dq:
            q = "'" if in_sq else '"'
            if ch == "\\" and i + 1 < n:
                out.append(raw[i:i + 2])
                i += 2
                continue
            if ch == q:
                in_sq = in_dq = False
            elif ch == "\n":
                out.append("\\n")
                i += 1
                continue
            elif ch == "\r":
                out.append("\\r")
                i += 1
                continue
        elif in_bt:
            if ch == "`":
                in_bt = False
            elif ch == "\n":  # newline in an identifier: pathological;
                out.append(" ")  # space keeps the line-parse invariant
                i += 1
                continue
        elif ch == "'":
            in_sq = True
        elif ch == '"':
            in_dq = True
        elif ch == "`":
            in_bt = True
        elif ch == "\n":
            out.append(" ")
            i += 1
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def split_mysqldump(path: str, out_dir: str) -> SplitResult:
    """One streaming pass: route every statement of a mysqldump file into
    the reference dump layout under ``out_dir``. Data INSERT lines are
    appended verbatim to ``{db.}table.00000.sql`` (the INSERT parser reads
    them as-is); CREATE TABLE goes to ``{db.}table-schema.sql``; views/
    triggers/routines/events are returned for object-artifact synthesis.

    View stand-ins (mysqldump's ``/*!50001 CREATE TABLE ...*/`` temporary
    definitions) are recognized by their version gate and dropped — the
    real ``CREATE VIEW`` replaces them."""
    os.makedirs(out_dir, exist_ok=True)
    res = SplitResult()
    current_db: str | None = None
    # key → open data-chunk handle, LRU-capped: a 10k-table dump must not
    # hold 10k descriptors (mysqldump groups a table's INSERTs contiguously,
    # so evicted handles reopen in append mode at most once per table in
    # practice)
    data_fh: dict[str, object] = {}
    _FH_CAP = 128

    def _handle(key: str, path: str):
        fh = data_fh.pop(key, None)
        if fh is None:
            if len(data_fh) >= _FH_CAP:
                oldest = next(iter(data_fh))
                data_fh.pop(oldest).close()
            # explicit utf-8: the locale-default encoding (C/POSIX in
            # containers/cron) would raise UnicodeEncodeError mid-split on
            # non-ASCII INSERT data. surrogateescape pairs with the input
            # read below so raw binary bytes (a dump taken without
            # --hex-blob emits quoted binary verbatim) pass through the
            # split byte-for-byte instead of collapsing to U+FFFD
            fh = open(path, "a", encoding="utf-8",
                      errors="surrogateescape")
        data_fh[key] = fh  # re-insert = most recent (dict order)
        return fh

    def key_for(name: str) -> tuple[str, str | None, str]:
        """(manifest_key, database, bare_name) honoring `db`.`t` spellings."""
        name = name.strip("`")
        if "." in name:
            db, bare = name.split(".", 1)
            db, bare = db.strip("`"), bare.strip("`")
        else:
            db, bare = current_db, name
        key = f"{db}.{bare}" if db else bare
        return key, db, bare

    try:
        with open(path, encoding="utf-8",
                  errors="surrogateescape") as fh:
            for raw, first_line in _statements(fh):
                gated = raw.lstrip().startswith("/*!")
                # routing copy: strip every gate opener AND residual
                # closer (`CREATE DATABASE /*!32312 IF NOT EXISTS*/ …`
                # leaves a mid-statement ``*/``); data INSERTs are written
                # from ``raw``, so a ``*/`` inside a value is untouched
                s = _ungate(_VERSION_GATE.sub("", raw)).strip()
                m = _RE_USE.match(s)
                if m:
                    current_db = m.group(1)
                    if current_db not in res.databases:
                        res.databases.append(current_db)
                    continue
                m = _RE_CREATE_DB.match(s)
                if m:
                    db = m.group(1)
                    if db not in res.databases:
                        res.databases.append(db)
                    with open(os.path.join(out_dir,
                                           f"{db}-schema-create.sql"),
                              "w", encoding="utf-8",
                              errors="surrogateescape") as f:
                        f.write(s + ";\n")  # gate-free, replayable form
                    continue
                m = _RE_INSERT.match(s)
                if m:
                    key, db, bare = key_for(m.group(1))
                    entry = res.tables.setdefault(
                        key, {"database": db, "name": bare,
                              "schema_path": None, "data_path": None,
                              "create_sql": None})
                    if entry["data_path"] is None:
                        entry["data_path"] = os.path.join(
                            out_dir, f"{key}.00000.sql")
                        open(entry["data_path"], "w",
                             encoding="utf-8",
                             errors="surrogateescape").close()  # truncate
                    # verbatim when single-line (the mysqldump norm: its
                    # escaping guarantees one statement per line). A
                    # statement that SPANS lines (pretty-printed input, or
                    # hand-written SQL with a real newline inside a quoted
                    # value) flattens quote-aware: formatting newlines
                    # become spaces, in-value newlines re-escape to \n so
                    # the parser restores them exactly — counted, never
                    # silently rewritten
                    if "\n" in raw:
                        res.flattened_inserts += 1
                        raw = _flatten_statement(raw)
                    _handle(key, entry["data_path"]).write(raw + ";\n")
                    continue
                m = _RE_CREATE_TABLE.match(s)
                if m:
                    if gated:
                        # /*!50001 CREATE TABLE — a view stand-in, not a
                        # real table; the CREATE VIEW arrives later
                        res.skipped_statements += 1
                        continue
                    key, db, bare = key_for(m.group(1))
                    entry = res.tables.setdefault(
                        key, {"database": db, "name": bare,
                              "schema_path": None, "data_path": None,
                              "create_sql": None})
                    entry["create_sql"] = raw.rstrip() + ";"
                    entry["schema_path"] = os.path.join(
                        out_dir, f"{key}-schema.sql")
                    with open(entry["schema_path"], "w",
                              encoding="utf-8",
                              errors="surrogateescape") as f:
                        f.write(entry["create_sql"] + "\n")
                    continue
                mv = _RE_VIEW.match(s)
                if mv:
                    key, db, bare = key_for(mv.group(1))
                    # the real view supersedes any /*!50001 stand-in table
                    res.tables.pop(key, None)
                    res.objects.append({"kind": "view", "database": db,
                                        "name": bare,
                                        "raw_sql": _ungate(s) + ";",
                                        "table": None})
                    continue
                mo = _RE_OBJ.match(s)
                if mo:
                    kind_raw, name = mo.group(1).upper(), mo.group(2)
                    kind = {"TRIGGER": "trigger", "PROCEDURE": "routine",
                            "FUNCTION": "routine", "EVENT": "event"}[kind_raw]
                    _, db, bare = key_for(name)
                    res.objects.append({"kind": kind, "database": db,
                                        "name": bare,
                                        "raw_sql": _ungate(s) + ";",
                                        "table": None})
                    continue
                up = s.upper()
                if not s or up.startswith(_SKIP_PREFIXES) or gated:
                    res.skipped_statements += 1
                    continue
                res.skipped_statements += 1
    finally:
        for f in data_fh.values():
            f.close()
    res.multi_db = len({e["database"] for e in res.tables.values()}) > 1
    if res.flattened_inserts:
        import warnings

        warnings.warn(
            f"mysqldump import: {res.flattened_inserts} INSERT "
            "statement(s) spanned physical lines and were flattened "
            "(in-value newlines re-escaped, formatting newlines "
            "spaced) — the input looks post-processed "
            "(pretty-printed / re-wrapped)",
            stacklevel=2)
    return res
