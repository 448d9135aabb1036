"""Non-table schema-object capture: views, triggers, routines, events.

The reference dumps these as their own DDL artifacts — views as
``db.table-schema-view.sql`` (write_view_definition_into_file,
/root/reference/src/mydumper/mydumper_jobs.c:392-520), triggers as
``db.table-schema-triggers.sql`` (mydumper_jobs.c:522-574), routines and
events into ``db-schema-post.sql`` (mydumper_jobs.c:576-620, the -R/-E
flags) — and myloader routes every one of them into the POST worker queue
AFTER data and indexes (myloader_process_file_type.c,
myloader_worker_post.c:1-129): a view can reference any table, a trigger
must not fire during the bulk load.

Spark-first re-expression: capture is driver-plane catalog metadata (a few
tiny queries per database through the same Spark JDBC reader the data scan
uses, plus optional SHOW CREATE statements on a direct connection), routed
by server product exactly like table-DDL capture (sources/ddl_capture.py).
Every capture degrades to "absent" instead of failing the dump — data
without views beats no dump, the reference's PERMISSION-error posture.
"""

from __future__ import annotations

from dataclasses import dataclass

from mydumper_spark.sources.ddl_capture import _get, _lit
from mydumper_spark.sources.server_detect import ServerProduct

_MYSQL_FAMILY = (
    ServerProduct.MYSQL, ServerProduct.PERCONA, ServerProduct.MARIADB,
    ServerProduct.TIDB, ServerProduct.DOLT, ServerProduct.RDS,
    ServerProduct.GOOGLE,
)


@dataclass
class SchemaObject:
    kind: str  # view | trigger | routine | event | sequence
    database: str
    name: str
    #: server-native DDL text — the artifact body (reference file content)
    raw_sql: str
    #: for triggers: the base table they attach to (filter admission joins
    #: the trigger's fate to its table's, like the reference's per-table
    #: trigger files)
    table: str | None = None
    #: for views: [(column_name, data_type)] for the stand-in dependency
    #: table (--table-engine-for-view-dependency, mydumper_jobs.c:520-540)
    columns: list | None = None


def _show_one(conn, stmt: str, col: int):
    """One SHOW CREATE … row → DDL text, or None (SHOW statements cannot
    run as JDBC subqueries, so they need the direct connection)."""
    if conn is None:
        return None
    try:
        rows = conn.execute(stmt)
        return rows[0][col] if rows else None
    except Exception:
        return None


def _capture_views(query, product: ServerProduct, conn=None) -> list[SchemaObject]:
    if product is ServerProduct.DUCKDB:
        rows = query(
            "SELECT schema_name AS db, view_name AS name, sql "
            "FROM duckdb_views() WHERE NOT internal"
        )
        return [
            SchemaObject("view", _get(r, "db"), _get(r, "name"),
                         (_get(r, "sql") or "").strip())
            for r in sorted(rows, key=lambda r: (_get(r, "db"), _get(r, "name")))
        ]
    # MySQL family + ANSI: information_schema.views carries the SELECT body;
    # SHOW CREATE VIEW (direct connection) upgrades it to the server's own
    # full text (algorithm/definer clauses — skip_definer strips those on
    # replay, the reference --skip-definer)
    rows = query(
        "SELECT table_schema AS db, table_name AS name, "
        "view_definition AS body FROM information_schema.views"
    )
    out = []
    for r in sorted(rows, key=lambda r: (_get(r, "db"), _get(r, "name"))):
        db, name = _get(r, "db"), _get(r, "name")
        raw = _show_one(conn, f"SHOW CREATE VIEW {_bt(db)}.{_bt(name)}", 1)
        if raw is None:
            raw = f"CREATE VIEW {_bt(name)} AS {(_get(r, 'body') or '').strip()};"
        out.append(SchemaObject("view", db, name, raw.strip()))
    return out


def _capture_triggers(query, conn=None) -> list[SchemaObject]:
    """MySQL-family triggers from ``information_schema.triggers`` (the ANSI
    shape MySQL implements; engines without triggers — DuckDB — simply have
    no such catalog and degrade to absent)."""
    rows = query(
        "SELECT trigger_schema AS db, trigger_name AS name, "
        "action_timing AS timing, event_manipulation AS ev, "
        "event_object_table AS tbl, action_statement AS body "
        "FROM information_schema.triggers"
    )
    out = []
    for r in sorted(rows, key=lambda r: (_get(r, "db"), _get(r, "name"))):
        db, name = _get(r, "db"), _get(r, "name")
        raw = _show_one(conn, f"SHOW CREATE TRIGGER {_bt(db)}.{_bt(name)}", 2)
        if raw is None:
            raw = (
                f"CREATE TRIGGER {_bt(name)} {_get(r, 'timing')} {_get(r, 'ev')} "
                f"ON {_bt(_get(r, 'tbl'))} FOR EACH ROW {_get(r, 'body')};"
            )
        out.append(SchemaObject("trigger", db, name, raw.strip(),
                                table=_get(r, "tbl")))
    return out


def _routine_params(query, db: str, name: str) -> str:
    """Parameter list from ``information_schema.parameters`` (ordinal 0 is a
    FUNCTION's return slot and is skipped) — information_schema.routines has
    the body but not the signature, the reason mydumper uses SHOW CREATE."""
    try:
        # dtd_identifier carries the FULL type text ("varchar(64)") —
        # data_type alone ("varchar") composes an invalid parameter list
        # for length-typed params on replay
        rows = query(
            "SELECT ordinal_position AS pos, parameter_mode AS mode, "
            "parameter_name AS pname, dtd_identifier AS dt "
            "FROM information_schema.parameters "
            f"WHERE specific_schema = {_lit(db)} "
            f"AND specific_name = {_lit(name)}"
        )
    except Exception:
        try:  # engines without DTD_IDENTIFIER: bare data_type beats nothing
            rows = query(
                "SELECT ordinal_position AS pos, parameter_mode AS mode, "
                "parameter_name AS pname, data_type AS dt "
                "FROM information_schema.parameters "
                f"WHERE specific_schema = {_lit(db)} "
                f"AND specific_name = {_lit(name)}"
            )
        except Exception:
            return ""
    parts = []
    for r in sorted(rows, key=lambda r: int(_get(r, "pos"))):
        if not int(_get(r, "pos")):  # position 0: function RETURNS slot
            continue
        mode = _get(r, "mode") or "IN"
        parts.append(f"{mode} {_bt(_get(r, 'pname'))} {_get(r, 'dt')}")
    return ", ".join(parts)


def _capture_routines(query, conn=None) -> list[SchemaObject]:
    try:
        # dtd_identifier: the full RETURNS type text ("varchar(64)"),
        # same rationale as _routine_params
        rows = query(
            "SELECT routine_schema AS db, routine_name AS name, "
            "routine_type AS rtype, routine_definition AS body, "
            "dtd_identifier AS ret FROM information_schema.routines"
        )
    except Exception:
        rows = query(
            "SELECT routine_schema AS db, routine_name AS name, "
            "routine_type AS rtype, routine_definition AS body, "
            "data_type AS ret FROM information_schema.routines"
        )
    out = []
    for r in sorted(rows, key=lambda r: (_get(r, "db"), _get(r, "name"))):
        db, name, rtype = _get(r, "db"), _get(r, "name"), _get(r, "rtype")
        raw = _show_one(conn, f"SHOW CREATE {rtype} {_bt(db)}.{_bt(name)}", 2)
        if raw is None:
            params = _routine_params(query, db, name)
            returns = (f" RETURNS {_get(r, 'ret')}"
                       if rtype == "FUNCTION" and _get(r, "ret") else "")
            raw = (f"CREATE {rtype} {_bt(name)}({params}){returns}\n"
                   f"{(_get(r, 'body') or '').strip()};")
        out.append(SchemaObject("routine", db, name, raw.strip()))
    return out


def _capture_events(query, conn=None) -> list[SchemaObject]:
    rows = query(
        "SELECT event_schema AS db, event_name AS name, "
        "event_definition AS body, event_type AS etype, "
        "interval_value AS iv, interval_field AS ifld, "
        "execute_at AS at FROM information_schema.events"
    )
    out = []
    for r in sorted(rows, key=lambda r: (_get(r, "db"), _get(r, "name"))):
        db, name = _get(r, "db"), _get(r, "name")
        raw = _show_one(conn, f"SHOW CREATE EVENT {_bt(db)}.{_bt(name)}", 3)
        if raw is None:
            if _get(r, "etype") == "RECURRING":
                sched = f"EVERY {_get(r, 'iv')} {_get(r, 'ifld')}"
            else:
                sched = f"AT '{_get(r, 'at')}'"
            raw = (f"CREATE EVENT {_bt(name)} ON SCHEDULE {sched} DO "
                   f"{(_get(r, 'body') or '').strip()};")
        out.append(SchemaObject("event", db, name, raw.strip()))
    return out


def capture_schema_objects(query, product: ServerProduct,
                           conn=None, dialect=None) -> list[SchemaObject]:
    """All non-table schema objects the source exposes, product-routed.
    Each object family degrades independently (an engine without the
    catalog — or a user without the privilege — loses that family, never
    the dump): views everywhere, triggers/routines/events only where an
    information_schema for them exists (the MySQL family; DuckDB has
    none); general InnoDB tablespaces only where ``dialect`` says the
    server version supports them."""
    out: list[SchemaObject] = []
    for fn in (
        lambda: _capture_views(query, product, conn),
        *((lambda: _capture_triggers(query, conn),
           lambda: _capture_routines(query, conn),
           lambda: _capture_events(query, conn))
          if product in _MYSQL_FAMILY else ()),
        # sequences are a MariaDB feature (discovered as TABLE_TYPE=
        # 'SEQUENCE'; harmless empty result elsewhere in the family)
        *((lambda: _capture_sequences(query, conn),)
          if product is ServerProduct.MARIADB else ()),
        *((lambda: _capture_tablespaces(query, dialect),)
          if dialect is not None and dialect.supports_tablespaces else ()),
    ):
        try:
            out.extend(fn())
        except Exception:
            continue
    return out


def _capture_tablespaces(query, dialect) -> list[SchemaObject]:
    """General InnoDB tablespaces (the reference's all-schema-create-
    tablespace.sql, mydumper_jobs.c:127-182): catalog names differ by
    version — 5.7 uses INNODB_SYS_TABLESPACES/INNODB_SYS_DATAFILES, 8.x
    INNODB_TABLESPACES/INNODB_DATAFILES — and the artifact is the composed
    ``CREATE TABLESPACE … ADD DATAFILE … FILE_BLOCK_SIZE = … ENGINE=INNODB``
    statement, one per General tablespace. myloader-parity on restore:
    the reference IGNORES this file with an import-manually warning
    (myloader_process_file_type.c:139-140), so ours lands in the restore
    report's skipped_objects, never silently dropped and never replayed
    against a foreign server's filesystem paths."""
    if dialect.major == 5 and dialect.secondary == 7:
        rows = query(
            "SELECT NAME AS name, PATH AS path, FS_BLOCK_SIZE AS bs "
            "FROM information_schema.INNODB_SYS_TABLESPACES "
            "JOIN information_schema.INNODB_SYS_DATAFILES USING (space) "
            "WHERE SPACE_TYPE='General' AND NAME != 'mysql'"
        )
    elif dialect.major >= 8:
        rows = query(
            "SELECT NAME AS name, PATH AS path, FS_BLOCK_SIZE AS bs "
            "FROM information_schema.INNODB_TABLESPACES "
            "JOIN information_schema.INNODB_DATAFILES USING (space) "
            "WHERE SPACE_TYPE='General' AND NAME != 'mysql'"
        )
    else:
        return []
    out = []
    for r in sorted(rows, key=lambda r: _get(r, "name")):
        name = _get(r, "name")
        out.append(SchemaObject(
            "tablespace", "", name,
            f"CREATE TABLESPACE {_bt(name)} "
            f"ADD DATAFILE '{_get(r, 'path')}' "
            f"FILE_BLOCK_SIZE = {_get(r, 'bs')} ENGINE=INNODB;"))
    return out


def _bt(name: str) -> str:
    """Backtick-quoted identifier for MySQL-family catalog statements."""
    return "`" + name.replace("`", "``") + "`"


def _capture_sequences(query, conn=None) -> list[SchemaObject]:
    """MariaDB sequences (the reference dumps SHOW CREATE SEQUENCE plus a
    ``DO SETVAL(seq, next_not_cached_value, 0)`` so the restored sequence
    RESUMES, not restarts — mydumper_jobs.c:640-690, do_JOB_SEQUENCE:965):
    discovery via information_schema.tables TABLE_TYPE='SEQUENCE' (how the
    reference's working thread classifies them, mydumper_working_thread.c:
    334-363); DDL verbatim via SHOW CREATE SEQUENCE on a direct
    connection, composed from the sequence's own state row otherwise (a
    MariaDB sequence is SELECTable and exposes start/min/max/increment/
    cache/cycle — reachable through the plain JDBC reader). The position
    statement rides in the same artifact after ``;\\n``."""
    rows = query(
        "SELECT table_schema AS db, table_name AS name "
        "FROM information_schema.tables WHERE table_type = 'SEQUENCE'"
    )
    out: list[SchemaObject] = []
    for r in rows:
        db, name = _get(r, "db"), _get(r, "name")
        raw = _show_one(
            conn, f"SHOW CREATE SEQUENCE {_bt(db)}.{_bt(name)}", 1)
        state = None
        try:
            srows = query(
                "SELECT next_not_cached_value AS nv, minimum_value AS minv, "
                "maximum_value AS maxv, start_value AS sv, increment AS inc, "
                "cache_size AS cs, cycle_option AS cyc "
                f"FROM {_bt(db)}.{_bt(name)}"
            )
            state = srows[0] if srows else None
        except Exception:
            state = None
        if raw is None and state is not None:
            raw = (
                f"CREATE SEQUENCE {_bt(name)} "
                f"START WITH {_get(state, 'sv')} "
                f"MINVALUE {_get(state, 'minv')} "
                f"MAXVALUE {_get(state, 'maxv')} "
                f"INCREMENT BY {_get(state, 'inc')} "
                f"CACHE {_get(state, 'cs')} "
                + ("CYCLE" if int(_get(state, "cyc")) else "NOCYCLE")
            )
        if raw is None:
            continue
        stmts = raw.rstrip().rstrip(";")
        if state is not None:
            stmts += f";\nDO SETVAL({_bt(name)}, {_get(state, 'nv')}, 0)"
        out.append(SchemaObject("sequence", db, name, stmts))
    return out
