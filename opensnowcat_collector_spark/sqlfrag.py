"""Spark-SQL fragment helpers for hot construction paths.

py4j round-trips cost ~3 ms each on this VM and a Column-API expression
tree pays one per operator; parsing the same tree from ONE SQL string
costs ~0.5 ms total (optimization r14, the guide §7.3 driver-overhead
class).  The parsed expression is operator-identical to the Column-built
one — both produce the same unresolved Catalyst tree — so plans and
results cannot change; only driver-side construction gets cheaper.

These helpers make embedding Python literals into fragments safe.
"""

from __future__ import annotations


def sql_str(s: str) -> str:
    """``s`` as a single-quoted Spark-SQL string literal.

    Escapes for the DEFAULT parser mode (escapedStringLiterals=false),
    where backslash is an escape character inside literals.

    Raises on ``${``: SQL variable substitution
    (spark.sql.variable.substitute, on by default) rewrites ``${...}``
    even INSIDE string literals before parsing, silently corrupting the
    value — callers embedding text that may contain it must use a
    Column literal (``F.lit``) instead.
    """
    if "${" in s:
        raise ValueError(
            "sql_str cannot safely embed text containing '${' "
            "(SQL variable substitution rewrites it); use F.lit"
        )
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def sql_str_list(items) -> str:
    """Comma-joined literal list (for IN (...) / array(...))."""
    return ", ".join(sql_str(x) for x in items)
