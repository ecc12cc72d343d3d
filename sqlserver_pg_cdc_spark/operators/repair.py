"""Repair-SQL generation (reference O1/F12, row_level/repair.py:19-203).

Turns a collected discrepancy set into a transactional SQL script:
INSERTs for MISSING rows, DELETEs for EXTRA rows, UPDATEs touching only
the modified columns, dialect-aware identifier quoting and literal
rendering, BEGIN/COMMIT wrapper.

Spark posture: the diff itself stays distributed (operators/diff.py);
only the final — presumed small — discrepancy set is collected here. For
repair-at-scale, prefer applying the diff directly with a keyed MERGE
(streaming/apply.py) instead of SQL text.
"""

from __future__ import annotations

import datetime as _dt
import re
from typing import Any, Iterable

from pyspark.sql import DataFrame

_IDENT_RE = re.compile(r"^[a-zA-Z_][a-zA-Z0-9_]*$")

POSTGRESQL = "postgresql"
SQLSERVER = "sqlserver"


def validate_identifier(name: str) -> str:
    """Reference sql_safety.py:12-108 — reject anything that isn't a plain
    identifier before it reaches generated SQL."""
    if not _IDENT_RE.match(name or ""):
        raise ValueError(f"invalid SQL identifier: {name!r}")
    return name


def quote_identifier(name: str, dialect: str = POSTGRESQL) -> str:
    validate_identifier(name)
    return f'"{name}"' if dialect == POSTGRESQL else f"[{name}]"


def format_value(value: Any, dialect: str = POSTGRESQL) -> str:
    """Value -> SQL literal (reference repair.py:177-203)."""
    if value is None:
        return "NULL"
    if isinstance(value, bool):  # before int: bool is an int subclass
        if dialect == POSTGRESQL:
            return "TRUE" if value else "FALSE"
        return "1" if value else "0"
    if isinstance(value, str):
        return "'" + value.replace("'", "''") + "'"
    if isinstance(value, float):
        import math

        # NaN/Infinity: bare 'nan'/'inf' is invalid SQL. PostgreSQL
        # accepts the quoted spellings for float columns; SQL Server has
        # no representable NaN -> NULL.
        if math.isnan(value) or math.isinf(value):
            if dialect == POSTGRESQL:
                if math.isnan(value):
                    return "'NaN'"
                return "'Infinity'" if value > 0 else "'-Infinity'"
            return "NULL"
        return str(value)
    if isinstance(value, int):
        return str(value)
    if isinstance(value, _dt.datetime):
        if dialect == POSTGRESQL:
            return f"'{value.isoformat()}'"
        return f"'{value.strftime('%Y-%m-%d %H:%M:%S')}'"
    return "'" + str(value).replace("'", "''") + "'"


def _where(pk: dict[str, Any], dialect: str) -> str:
    return " AND ".join(
        f"{quote_identifier(k, dialect)} = {format_value(v, dialect)}" for k, v in pk.items()
    )


def insert_sql(table: str, data: dict[str, Any], dialect: str = POSTGRESQL) -> str:
    cols = ", ".join(quote_identifier(c, dialect) for c in data)
    vals = ", ".join(format_value(v, dialect) for v in data.values())
    return f"INSERT INTO {quote_identifier(table, dialect)} ({cols}) VALUES ({vals});"


def delete_sql(table: str, pk: dict[str, Any], dialect: str = POSTGRESQL) -> str:
    return f"DELETE FROM {quote_identifier(table, dialect)} WHERE {_where(pk, dialect)};"


def update_sql(
    table: str,
    pk: dict[str, Any],
    data: dict[str, Any],
    modified_cols: Iterable[str],
    dialect: str = POSTGRESQL,
) -> str:
    sets = ", ".join(
        f"{quote_identifier(c, dialect)} = {format_value(data[c], dialect)}"
        for c in modified_cols
    )
    return (
        f"UPDATE {quote_identifier(table, dialect)} SET {sets} "
        f"WHERE {_where(pk, dialect)};"
    )


def generate_repair_script(
    diff_with_values: DataFrame,
    pk_cols: list[str],
    target_table: str,
    dialect: str = POSTGRESQL,
    max_statements: int = 100_000,
) -> str:
    """Repair script from a ``diff_tables(..., include_values=True)`` result.

    MISSING -> INSERT of pk+source values, EXTRA -> DELETE by pk,
    MODIFIED -> UPDATE of only the modified columns. ``max_statements``
    bounds driver memory — a diff larger than that should be repaired via
    MERGE, not a SQL file.
    """
    validate_identifier(target_table)
    rows = diff_with_values.limit(max_statements + 1).collect()
    if len(rows) > max_statements:
        raise ValueError(
            f"diff exceeds max_statements={max_statements}; use a MERGE-based repair"
        )

    missing = [r for r in rows if r["diff_type"] == "MISSING"]
    extra = [r for r in rows if r["diff_type"] == "EXTRA"]
    modified = [r for r in rows if r["diff_type"] == "MODIFIED"]

    lines = [
        f"-- Repair script for {target_table}",
        f"-- Generated: {_dt.datetime.now(_dt.timezone.utc).isoformat()}",
        f"-- Total discrepancies: {len(rows)}",
        f"-- Database type: {dialect}",
        "",
        "BEGIN;" if dialect == POSTGRESQL else "BEGIN TRANSACTION;",
        "",
    ]

    def _pk(r) -> dict[str, Any]:
        return {c: r[c] for c in pk_cols}

    if missing:
        lines.append(f"-- Insert {len(missing)} missing rows")
        for r in missing:
            data = {**_pk(r), **r["source_data"].asDict()}
            lines.append(insert_sql(target_table, data, dialect))
        lines.append("")
    if extra:
        lines.append(f"-- Delete {len(extra)} extra rows")
        for r in extra:
            lines.append(delete_sql(target_table, _pk(r), dialect))
        lines.append("")
    if modified:
        lines.append(f"-- Update {len(modified)} modified rows")
        for r in modified:
            cols = [c for c in r["modified_columns"].split(",") if c]
            lines.append(
                update_sql(target_table, _pk(r), r["source_data"].asDict(), cols, dialect)
            )
        lines.append("")

    lines.append("COMMIT;")
    return "\n".join(lines)
