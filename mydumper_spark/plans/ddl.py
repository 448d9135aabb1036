"""DDL text transforms (SURVEY §2.4 T15/T16, §2.9 schema objects).

The reference treats schema objects (views, triggers, routines, events,
sequences) as DDL text artifacts and rewrites them in flight:
- T15 DEFINER strip/replace: ``--skip-definer`` / ``--replace-definer``
  (/root/reference/src/mydumper/mydumper_jobs.c:116-117, 383, 596;
  update_definer in src/common.c)
- T16 MariaDB sequence ↔ CREATE TABLE fixup
  (/root/reference/src/mydumper/mydumper_jobs.c:284-291)

Driver-side string transforms — no cluster involvement, same as the
reference (these run once per object, not per row).
"""

from __future__ import annotations

import re

_DEFINER = re.compile(r"\sDEFINER\s*=\s*(`[^`]*`|[^\s`]+)@(`[^`]*`|[^\s`]+)", re.IGNORECASE)
_AUTO_INC = re.compile(r"\s+AUTO_INCREMENT=\d+", re.IGNORECASE)


def skip_definer(ddl: str) -> str:
    """T15: remove DEFINER=user@host clauses."""
    return _DEFINER.sub("", ddl)


def replace_definer(ddl: str, user: str, host: str = "%") -> str:
    """T15: rewrite DEFINER to a target principal."""
    return _DEFINER.sub(f" DEFINER=`{user}`@`{host}`", ddl)


def strip_auto_increment(ddl: str) -> str:
    """Drop AUTO_INCREMENT counters so restored tables restart cleanly
    (mydumper's schema normalization on dump)."""
    return _AUTO_INC.sub("", ddl)


def sequence_to_create(ddl: str) -> str:
    """T16: MariaDB `CREATE SEQUENCE` emitted from its backing-table DDL —
    the reference swaps the CREATE TABLE form for CREATE SEQUENCE when the
    engine reports a sequence (filter_sequence_schemas)."""
    m = re.match(r"\s*CREATE\s+TABLE\s+(`?[\w.]+`?)", ddl, re.IGNORECASE)
    if not m:
        return ddl
    return f"CREATE SEQUENCE {m.group(1)};"


def is_view_ddl(ddl: str) -> bool:
    """View-vs-table detection by DDL text, NOT by comments — the reference
    has an explicit regression test for a table whose COMMENT is 'VIEW'
    (test/specific_16): only the statement head decides."""
    return bool(re.match(r"\s*CREATE\s+(OR\s+REPLACE\s+)?(ALGORITHM=\S+\s+)?(DEFINER=\S+\s+)?(SQL\s+SECURITY\s+\w+\s+)?VIEW\b", ddl, re.IGNORECASE))
