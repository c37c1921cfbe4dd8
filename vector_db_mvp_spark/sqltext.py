"""Safe string-literal embedding for generated oracle SQL.

The oracle_sql() builders assemble ANSI SQL for DuckDB by f-string. Any
user-supplied STRING VALUE (query terms, query ids, marker words) must go
through :func:`sql_str` so an embedded single quote can neither break the
statement nor alter it (classic quote-escape injection). Identifiers
(table/column names) come from internal callers and stay interpolated
as-is; they are not user data on any current path.
"""

from __future__ import annotations


def sql_str(value: str) -> str:
    """Render ``value`` as a single-quoted ANSI SQL string literal,
    doubling embedded quotes (``O'Brien`` -> ``'O''Brien'``)."""
    return "'" + str(value).replace("'", "''") + "'"
