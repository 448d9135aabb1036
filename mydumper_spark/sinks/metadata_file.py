"""Reference-format ``metadata`` file — byte-level dump-dir interop.

myloader refuses a directory without a ``metadata`` file
(/root/reference/src/myloader/myloader.c:162-164), so a dump our engine
writes is only restorable by the reference if we emit its exact format:
a GKeyFile/INI body wrapped in ``# Started/Finished dump at:`` comment
lines, with one ``[`db`.`table`]`` section per table
(print_dbt_on_metadata_gstring, mydumper_start_dump.c:774-797), a
``[config]`` header (mydumper_start_dump.c:1176-1183) and an optional
``[source]`` replication section (write_source_info,
mydumper_working_thread.c:535-548). This module writes and parses that
format; the JSON manifest (sinks/manifest.py) remains the richer
Spark-native catalog — this file is the compatibility artifact.

Driver-plane only (one tiny text file per dump) — no DataFrames involved.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class TableMeta:
    database: str
    table: str
    rows: int
    real_table_name: str | None = None
    data_checksum: str | None = None
    schema_checksum: str | None = None
    is_sequence: bool = False
    is_view: bool = False


@dataclass
class DumpMetadata:
    started_at: str
    finished_at: str | None = None
    quote_character: str = "BACKTICK"
    local_infile: bool = False
    sql_mode: str | None = None
    #: [source]: executed_gtid_set / SOURCE_LOG_FILE / SOURCE_LOG_POS
    source: dict[str, str] = field(default_factory=dict)
    tables: list[TableMeta] = field(default_factory=list)


def format_metadata(meta: DumpMetadata, compact: bool = False) -> str:
    """Render the reference's metadata file text.

    ``compact`` (mydumper_arguments.c:226) is accepted for signature
    stability but is a NO-OP here: the reference's flag only suppresses
    the per-chunk ``SET SQL_MODE`` header inside SQL files
    (mydumper_common.c:411,422) — the metadata file's Started/Finished
    lines and ``[myloader_session_variables]`` section are written
    unconditionally (mydumper_start_dump.c:1161,1181,1717), and trimming
    them here made foreign myloader silently lose SQL_MODE session
    restoration. Our SQL chunks carry no per-file SQL_MODE header, so
    compact changes no artifact; it is still recorded in the manifest
    config for parity."""
    del compact
    out = [f"# Started dump at: {meta.started_at}"]
    out.append(f"[config]\nquote-character = {meta.quote_character}")
    if meta.local_infile:
        out.append("local-infile = 1")
    if meta.sql_mode is not None:
        out.append(f"\n[myloader_session_variables]\nSQL_MODE={meta.sql_mode} /*!40101")
    if meta.source:
        out.append("\n[source]")
        out.append("# Channel_Name = '' # It can be use to setup replication FOR CHANNEL")
        if meta.source.get("executed_gtid_set"):
            out.append(f"# executed_gtid_set = \"{meta.source['executed_gtid_set']}\"")
        if meta.source.get("file"):
            out.append(
                f"# SOURCE_LOG_FILE = \"{meta.source['file']}\"\n"
                f"# SOURCE_LOG_POS = {meta.source.get('pos', '4')}"
            )
    for t in meta.tables:
        out.append(f"\n[`{t.database}`.`{t.table}`]")
        out.append(f"real_table_name={t.real_table_name or t.table}")
        out.append(f"rows = {t.rows}")
        if t.is_sequence:
            out.append("is_sequence = 1")
        if t.is_view:
            out.append("is_view = 1")
        if t.data_checksum is not None:
            out.append(f"data_checksum = {t.data_checksum}")
        if t.schema_checksum is not None:
            out.append(f"schema_checksum = {t.schema_checksum}")
    if meta.finished_at:
        out.append(f"\n# Finished dump at: {meta.finished_at}")
    return "\n".join(out) + "\n"


def write_metadata(path: str, meta: DumpMetadata) -> None:
    # surrogateescape: table names may carry byte-faithful non-UTF-8
    # (hostile real_table_name intake) — mirror every artifact write
    with open(path, "w", encoding="utf-8",
              errors="surrogateescape") as f:
        f.write(format_metadata(meta))


_SECTION_RE = re.compile(r"^\[(?P<name>.+)\]$")
#: table sections quote identifiers with the dump's quote character —
#: backtick by default, double-quote under --identifier-quote-character
#: AQI / ANSI_QUOTES sql_mode (the reference writes whichever it used);
#: both spellings must parse or an AQI dump silently loses every
#: per-table flag (rows cross-check, is_view, real_table_name)
_TABLE_SECTION_RE = re.compile(r"^`(?P<db>[^`]+)`\.`(?P<table>[^`]+)`$")
_TABLE_SECTION_AQ_RE = re.compile(
    r'^"(?P<db>[^"]+)"\."(?P<table>[^"]+)"$')
_STARTED_RE = re.compile(r"^# Started dump at: (?P<ts>.+)$")
_FINISHED_RE = re.compile(r"^# Finished dump at: (?P<ts>.+)$")
#: the [source] block keeps its values in comment lines unless replication
#: restore was requested — parse both spellings
_SOURCE_KV_RE = re.compile(
    r"^#?\s*(?P<key>executed_gtid_set|SOURCE_LOG_FILE|SOURCE_LOG_POS)\s*=\s*(?P<val>.+)$"
)


def parse_metadata(text: str) -> DumpMetadata:
    """Parse a reference metadata file (ours or a genuine mydumper one)."""
    meta = DumpMetadata(started_at="")
    section: str | None = None
    current: TableMeta | None = None
    for raw in text.splitlines():
        line = raw.strip()
        if not line:
            continue
        if m := _STARTED_RE.match(line):
            meta.started_at = m["ts"]
            continue
        if m := _FINISHED_RE.match(line):
            meta.finished_at = m["ts"]
            continue
        if m := _SECTION_RE.match(line):
            section = m["name"]
            current = None
            if tm := (_TABLE_SECTION_RE.match(section)
                      or _TABLE_SECTION_AQ_RE.match(section)):
                current = TableMeta(database=tm["db"], table=tm["table"], rows=0)
                meta.tables.append(current)
            continue
        if section == "source":
            if m := _SOURCE_KV_RE.match(line):
                key = {"SOURCE_LOG_FILE": "file", "SOURCE_LOG_POS": "pos"}.get(
                    m["key"], m["key"]
                )
                meta.source[key] = m["val"].strip().strip('"')
            continue
        if line.startswith("#"):
            continue
        if section == "config":
            k, _, v = line.partition("=")
            k, v = k.strip(), v.strip()
            if k == "quote-character":
                meta.quote_character = v
            elif k == "local-infile":
                meta.local_infile = v == "1"
            continue
        if section == "myloader_session_variables" and line.startswith("SQL_MODE"):
            meta.sql_mode = line.partition("=")[2].replace("/*!40101", "").strip()
            continue
        if current is not None:
            k, _, v = line.partition("=")
            k, v = k.strip(), v.strip()
            if k == "rows":
                current.rows = int(v)
            elif k == "real_table_name":
                current.real_table_name = v
            elif k == "data_checksum":
                current.data_checksum = v
            elif k == "schema_checksum":
                current.schema_checksum = v
            elif k == "is_sequence":
                current.is_sequence = v == "1"
            elif k == "is_view":
                current.is_view = v == "1"
    return meta


def read_metadata(path: str) -> DumpMetadata:
    with open(path, encoding="utf-8") as f:
        return parse_metadata(f.read())
