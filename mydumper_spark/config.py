"""Defaults-file / config parsing — the reference's query language.

mydumper's entire "query surface" is CLI options + an INI defaults file with
per-table sections (/root/reference/src/common.c:199-280, keys common.h:58-68):

    [mydumper]
    where = id > 5
    regex = ^prod\\.
    [`db`.`table`]
    where = created_at > '2024-01-01'
    limit = 1000
    columns_on_select = id,name
    columns_on_select_replace = email:md5(email)

This module parses that shape into the engine's typed config
(TableFilters + per-table TableTransform + DumpConfig), so a reference user
can bring their defaults file across unchanged in spirit.
"""

from __future__ import annotations

import configparser
import re

from mydumper_spark.catalog import TableFilters
from mydumper_spark.operators.transform import TableTransform

_TABLE_SECTION = re.compile(r"^`?(?P<db>[^`.]+)`?\.`?(?P<table>[^`.]+)`?$")


def parse_defaults_file(path: str) -> dict:
    """Returns {"filters": TableFilters, "global_where": str|None,
    "per_table": {table: TableTransform}, "options": {raw global opts}}."""
    cp = configparser.ConfigParser()
    # mydumper sections contain backticks and dots; keep keys case-sensitive
    cp.optionxform = str
    cp.read(path)

    filters = TableFilters()
    global_where = None
    options: dict[str, str] = {}
    per_table: dict[str, TableTransform] = {}

    for section in cp.sections():
        m = _TABLE_SECTION.match(section)
        if section in ("mydumper", "myloader", "spark_dump"):
            for k, v in cp[section].items():
                options[k] = v
            if "where" in cp[section]:
                global_where = cp[section]["where"]
            if "regex" in cp[section]:
                filters.regex = cp[section]["regex"]
            if "ignore-engines" in cp[section]:
                filters.ignore_engines = set(cp[section]["ignore-engines"].split(","))
            if "tables-list" in cp[section]:
                filters.tables_list = set(cp[section]["tables-list"].split(","))
            if "database" in cp[section]:
                filters.databases = set(cp[section]["database"].split(","))
        elif m:
            tt = parse_table_section(dict(cp[section]))
            per_table[m.group("table")] = tt
    return {
        "filters": filters,
        "global_where": global_where,
        "per_table": per_table,
        "options": options,
    }


def parse_table_section(kv: dict[str, str]) -> TableTransform:
    """Per-table keys, mirroring conf_per_table (common.h:58-68)."""
    tt = TableTransform()
    if "where" in kv:
        tt.where = kv["where"]
    if "limit" in kv:
        tt.limit = int(kv["limit"])
    if "columns_on_select" in kv:
        tt.select_columns = [c.strip() for c in kv["columns_on_select"].split(",")]
    if "columns_on_select_replace" in kv:
        # col:expr pairs separated by ; (expr may contain commas)
        for pair in kv["columns_on_select_replace"].split(";"):
            col, expr = pair.split(":", 1)
            tt.select_replace[col.strip()] = expr.strip()
    if "object_to_export" in kv:  # P11
        tt.object_scope = {s.strip().upper() for s in kv["object_to_export"].split(",")}
    if "order_by_primary" in kv:
        tt.order_by_primary = kv["order_by_primary"].lower() in ("1", "true", "yes")
    if "masquerade" in kv:
        # col=fn[:json-kwargs] pairs separated by ;
        import json

        for pair in kv["masquerade"].split(";"):
            col, spec = pair.split("=", 1)
            if ":" in spec:
                fn, kwargs = spec.split(":", 1)
                tt.masquerade[col.strip()] = [(fn.strip(), json.loads(kwargs))]
            else:
                tt.masquerade[col.strip()] = [(spec.strip(), {})]
    return tt


def parse_skiplist_file(path: str) -> set[str]:
    """--omit-from-file (P7): one `db` or `db.table` per line
    (/root/reference/src/tables_skiplist.c:35-89)."""
    out = set()
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                out.add(line.replace("`", ""))
    return out
