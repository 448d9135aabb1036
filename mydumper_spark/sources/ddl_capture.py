"""Dump-side source-DDL capture (SURVEY §2.9 L6/L7 inputs; reference
schema-artifact dump).

The reference dumps each table's full DDL as a ``db.table-schema.sql``
artifact — ``SHOW CREATE TABLE`` verbatim (/root/reference/src/mydumper/
mydumper_jobs.c:128-344, write_table_definition_into_file) — and myloader
replays it phase-ordered, deferring secondary indexes until after the data
load (``--optimize-keys``, /root/reference/src/common.c:1440-1509,
src/myloader/myloader_worker_index.c:107-171). Without this, a DB→dump→DB
round-trip produces bare column-typed tables: no PKs, no indexes, no
constraints.

Spark-first re-expression: capture is driver-plane metadata work (a handful
of catalog queries per table — never row data), producing TWO artifacts:

- ``raw_sql``: the server's own DDL text (``SHOW CREATE TABLE`` when a
  direct connection exists; the engine's catalog ``sql`` columns on DuckDB;
  composed from the descriptor otherwise) — the reference-parity
  ``-schema.sql`` file, checksummed into the manifest (A5).
- ``descriptor``: the machine-readable key/constraint summary
  (plans/ddl.py contract) recorded in the manifest entry itself — what
  ``engine.restore`` turns back into phase-ordered DDL on ANY target
  dialect, instead of replaying source-dialect text verbatim.

Catalog queries run through the same Spark JDBC reader the data scan uses
(``query`` = JdbcCatalog._q(...).collect()), so capture needs no extra
driver besides the optional ``SHOW CREATE TABLE`` connection.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from mydumper_spark.sources.server_detect import ServerProduct


@dataclass
class SchemaArtifact:
    database: str
    table: str
    raw_sql: str
    descriptor: dict = field(default_factory=dict)


def _lit(s: str) -> str:
    """SQL string literal for catalog WHERE clauses (identifier VALUES, not
    identifiers-in-position — quoting is doubling the single quote)."""
    return "'" + s.replace("'", "''") + "'"


def _bt(name: str) -> str:
    """Backtick-quoted identifier with doubling — a table/db named a`b (or
    a crafted x`.`y) must neither break the statement nor read a DIFFERENT
    object's DDL."""
    return "`" + str(name).replace("`", "``") + "`"


def _get(row, *names):
    """Field access across engines that return different cases for
    information_schema column names through JDBC."""
    d = row.asDict() if hasattr(row, "asDict") else dict(row)
    lowered = {k.lower(): v for k, v in d.items()}
    for n in names:
        if n.lower() in lowered:
            return lowered[n.lower()]
    raise KeyError(f"{names} not in {list(d)}")


def _information_schema_keys(query, db: str, table: str) -> dict:
    """PK + UNIQUE columns from the ANSI pair ``table_constraints`` ⋈
    ``key_column_usage`` — present in MySQL, MariaDB, TiDB and DuckDB, so
    one query shape serves every dialect we probe."""
    rows = query(
        "SELECT tc.constraint_name AS cname, tc.constraint_type AS ctype, "
        "kcu.column_name AS col, kcu.ordinal_position AS pos "
        "FROM information_schema.table_constraints tc "
        "JOIN information_schema.key_column_usage kcu "
        "ON tc.constraint_name = kcu.constraint_name "
        "AND tc.table_schema = kcu.table_schema "
        "AND tc.table_name = kcu.table_name "
        f"WHERE tc.table_schema = {_lit(db)} "
        f"AND tc.table_name = {_lit(table)} "
        "AND tc.constraint_type IN ('PRIMARY KEY', 'UNIQUE')"
    )
    pk: list[tuple[int, str]] = []
    uniques: dict[str, list[tuple[int, str]]] = {}
    for r in rows:
        item = (int(_get(r, "pos")), _get(r, "col"))
        if _get(r, "ctype") == "PRIMARY KEY":
            pk.append(item)
        else:
            uniques.setdefault(_get(r, "cname"), []).append(item)
    return {
        "primary_key": [c for _, c in sorted(pk)],
        "uniques": [
            {"name": n, "columns": [c for _, c in sorted(cols)]}
            for n, cols in sorted(uniques.items())
        ],
        "indexes": [],
        "foreign_keys": [],
        "checks": [],
    }


def _mysql_foreign_keys(query, db: str, table: str) -> list[dict]:
    """FKs from MySQL's key_column_usage referenced_* columns (these are a
    MySQL extension — absent from the ANSI shape, probed only there), plus
    the referential actions from ``referential_constraints`` — ON DELETE
    CASCADE silently degrading to RESTRICT on a round-trip is a data-loss
    semantics change, not a cosmetic one."""
    rows = query(
        "SELECT constraint_name AS cname, column_name AS col, "
        "ordinal_position AS pos, referenced_table_schema AS rschema, "
        "referenced_table_name AS rtable, "
        "referenced_column_name AS rcol "
        "FROM information_schema.key_column_usage "
        f"WHERE table_schema = {_lit(db)} AND table_name = {_lit(table)} "
        "AND referenced_table_name IS NOT NULL"
    )
    rules: dict[str, dict] = {}
    try:
        for r in query(
            "SELECT constraint_name AS cname, update_rule AS ur, "
            "delete_rule AS dr FROM information_schema.referential_constraints "
            f"WHERE constraint_schema = {_lit(db)} "
            f"AND table_name = {_lit(table)}"
        ):
            rules[_get(r, "cname")] = {"on_update": _get(r, "ur"),
                                       "on_delete": _get(r, "dr")}
    except Exception:
        rules = {}  # engines without the view: actions default server-side
    fks: dict[str, dict] = {}
    for r in rows:
        # CROSS-database FK: qualify ref_table with its schema whenever it
        # differs from the table's own — an unqualified REFERENCES would
        # bind to a same-named table in the WRONG database on restore
        try:
            rschema = _get(r, "rschema")
        except KeyError:
            rschema = None  # engines without the referenced_* extension
        rtable = _get(r, "rtable")
        ref = f"{rschema}.{rtable}" if rschema and rschema != db else rtable
        fk = fks.setdefault(_get(r, "cname"), {
            "name": _get(r, "cname"), "columns": [],
            "ref_table": ref, "ref_columns": [],
        })
        fk["columns"].append((int(_get(r, "pos")), _get(r, "col")))
        fk["ref_columns"].append((int(_get(r, "pos")), _get(r, "rcol")))
    out = []
    for fk in sorted(fks.values(), key=lambda f: f["name"]):
        fk["columns"] = [c for _, c in sorted(fk["columns"])]
        fk["ref_columns"] = [c for _, c in sorted(fk["ref_columns"])]
        rule = rules.get(fk["name"], {})
        # record only non-default actions (RESTRICT/NO ACTION are the
        # server defaults — rendering them adds noise, omitting is exact)
        for k in ("on_delete", "on_update"):
            v = (rule.get(k) or "").upper()
            if v and v not in ("RESTRICT", "NO ACTION"):
                fk[k] = v
        out.append(fk)
    return out


def _mysql_secondary_indexes(query, db: str, table: str,
                             skip_names: set[str]) -> list[dict]:
    """Secondary indexes from ``information_schema.statistics`` — the same
    source the reference's index-cardinality chunk pick reads
    (mydumper_table.c:181-239). PRIMARY and constraint-backed uniques are
    excluded (they arrive via table_constraints)."""
    rows = query(
        "SELECT index_name AS iname, non_unique AS nu, "
        "seq_in_index AS pos, column_name AS col, "
        "sub_part AS subp, index_type AS itype "
        "FROM information_schema.statistics "
        f"WHERE table_schema = {_lit(db)} AND table_name = {_lit(table)}"
    )
    by_name: dict[str, dict] = {}
    for r in rows:
        name = _get(r, "iname")
        if name == "PRIMARY" or name in skip_names:
            continue
        itype = (_get(r, "itype") or "").upper()
        ix = by_name.setdefault(name, {"name": name, "columns": [],
                                       "unique": not int(_get(r, "nu"))})
        # BTREE is the default; FULLTEXT/SPATIAL/HASH change semantics and
        # must survive the round-trip (a FULLTEXT re-created as BTREE is a
        # silent behavior change, error 1170 territory on TEXT columns)
        if itype and itype != "BTREE":
            ix["type"] = itype
        subp = _get(r, "subp")
        ix["columns"].append(
            (int(_get(r, "pos")), _get(r, "col"),
             int(subp) if subp is not None else None))
    out = []
    for ix in sorted(by_name.values(), key=lambda i: i["name"]):
        triples = sorted(ix["columns"])
        ix["columns"] = [c for _, c, _sp in triples]
        if any(sp is not None for _, _, sp in triples):
            # prefix index (KEY `k` (`txt`(32))): without the length the
            # restore emits an un-creatable index on BLOB/TEXT
            ix["sub_parts"] = [sp for _, _, sp in triples]
        out.append(ix)
    return out


_DUCK_INDEX_COLS = re.compile(r"\(([^)]*)\)\s*;?\s*$")


def _capture_duckdb(query, db: str, table: str) -> SchemaArtifact:
    """DuckDB (the live test engine): the catalog stores full DDL text —
    ``duckdb_tables().sql`` / ``duckdb_indexes().sql`` — so the raw
    artifact is server-native verbatim, like SHOW CREATE TABLE on MySQL."""
    desc = _information_schema_keys(query, db, table)
    tbl_rows = query(
        "SELECT sql FROM duckdb_tables() "
        f"WHERE schema_name = {_lit(db)} AND table_name = {_lit(table)}"
    )
    idx_rows = query(
        "SELECT index_name AS iname, is_unique AS uq, sql "
        "FROM duckdb_indexes() "
        f"WHERE schema_name = {_lit(db)} AND table_name = {_lit(table)}"
    )
    raw = [_get(r, "sql") for r in tbl_rows if _get(r, "sql")]
    for r in sorted(idx_rows, key=lambda r: _get(r, "iname")):
        sql = _get(r, "sql") or ""
        raw.append(sql if sql.rstrip().endswith(";") else sql + ";")
        m = _DUCK_INDEX_COLS.search(sql)
        cols = [c.strip().strip('"') for c in m.group(1).split(",")] if m else []
        desc["indexes"].append({
            "name": _get(r, "iname"),
            "columns": cols,
            "unique": bool(_get(r, "uq")),
        })
    return SchemaArtifact(db, table, "\n".join(raw), desc)


def _compose_raw(db: str, table: str, descriptor: dict,
                 column_lines: list[str] | None = None) -> str:
    """Render a descriptor in the reference's ``-schema.sql`` shape (the
    mydumper CREATE TABLE format that plans/ddl.py's parsers read back) —
    the raw artifact when no server-native DDL text is obtainable."""
    lines = list(column_lines or [])
    if descriptor.get("primary_key"):
        cols = ",".join(_bt(c) for c in descriptor["primary_key"])
        lines.append(f"PRIMARY KEY ({cols})")
    for u in descriptor.get("uniques", []):
        cols = ",".join(_bt(c) for c in u["columns"])
        lines.append(f"UNIQUE KEY {_bt(u['name'])} ({cols})")
    for ix in descriptor.get("indexes", []):
        subs = ix.get("sub_parts") or [None] * len(ix["columns"])
        cols = ",".join(
            f"{_bt(c)}({sp})" if sp is not None else _bt(c)
            for c, sp in zip(ix["columns"], subs))
        kind = ("UNIQUE KEY" if ix.get("unique")
                else f"{ix['type']} KEY" if ix.get("type")
                else "KEY")
        lines.append(f"{kind} {_bt(ix['name'])} ({cols})")
    for fk in descriptor.get("foreign_keys", []):
        cols = ",".join(_bt(c) for c in fk["columns"])
        rcols = ",".join(_bt(c) for c in fk["ref_columns"])
        # ref_table may be schema-qualified (cross-database FK)
        rt = ".".join(_bt(p_) for p_ in str(fk["ref_table"]).split("."))
        fkl = (f"CONSTRAINT {_bt(fk['name'])} FOREIGN KEY ({cols}) "
               f"REFERENCES {rt} ({rcols})")
        if fk.get("on_delete"):
            fkl += f" ON DELETE {fk['on_delete']}"
        if fk.get("on_update"):
            fkl += f" ON UPDATE {fk['on_update']}"
        lines.append(fkl)
    body = ",\n  ".join(lines)
    return f"CREATE TABLE {_bt(table)} (\n  {body}\n);"


def _capture_mysql(query, db: str, table: str, conn=None) -> SchemaArtifact:
    """MySQL family: descriptor from information_schema (statistics +
    constraints + key_column_usage, all reachable through the Spark JDBC
    reader); raw DDL verbatim via ``SHOW CREATE TABLE`` when a direct
    connection exists (SHOW statements can't run as JDBC subqueries),
    composed from the descriptor otherwise."""
    desc = _information_schema_keys(query, db, table)
    skip = {u["name"] for u in desc["uniques"]}
    desc["indexes"] = _mysql_secondary_indexes(query, db, table, skip)
    desc["foreign_keys"] = _mysql_foreign_keys(query, db, table)
    raw = None
    if conn is not None:
        try:
            rows = conn.execute(
                f"SHOW CREATE TABLE {_bt(db)}.{_bt(table)}")
            if rows:
                raw = rows[0][1]
        except Exception:
            raw = None  # server without SHOW support — compose below
    if raw is None:
        raw = _compose_raw(db, table, desc)
    return SchemaArtifact(db, table, raw, desc)


def _capture_ansi(query, db: str, table: str) -> SchemaArtifact:
    """Generic fallback: PK/UNIQUE from the ANSI information_schema pair;
    secondary-index catalogs are engine-specific and not probed."""
    desc = _information_schema_keys(query, db, table)
    return SchemaArtifact(db, table, _compose_raw(db, table, desc), desc)


def capture_table_ddl(query, product: ServerProduct, db: str, table: str,
                      conn=None) -> SchemaArtifact | None:
    """Capture one table's DDL artifact, routed by server product. Returns
    None when the engine's catalog can't be probed (capture must never
    fail a dump — the reference degrades the same way on PERMISSION
    errors: data without schema beats no dump)."""
    try:
        if product is ServerProduct.DUCKDB:
            return _capture_duckdb(query, db, table)
        if product in (ServerProduct.MYSQL, ServerProduct.PERCONA,
                       ServerProduct.MARIADB, ServerProduct.TIDB,
                       ServerProduct.DOLT, ServerProduct.RDS,
                       ServerProduct.GOOGLE):
            return _capture_mysql(query, db, table, conn=conn)
        return _capture_ansi(query, db, table)
    except Exception:
        return None
