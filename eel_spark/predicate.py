"""Predicate DSL — the reference's source-level pushdown predicates
(eel-core Predicate.scala:1, PredicateBuilder.scala:1) re-expressed for
Catalyst.

The reference builds predicate trees (equals/gt/lt/and/or/not) that each
source compiles to its format's filter API (parquet row-group stats,
ORC SearchArguments, JDBC WHERE). On Spark there is exactly ONE correct
compilation target: a ``Column`` expression attached before the scan —
Catalyst turns it into PushedFilters / partition pruning / JDBC WHERE
for every V2 source uniformly, which is the whole point of declaring
the plan instead of hand-compiling per format.

The tree is still first-class (not just a Column) for reference parity:
``fields()`` feeds column pruning, ``to_column()`` compiles, and
``to_sql()`` renders a WHERE fragment for engines addressed by string
(JdbcSource subqueries, partition_filter strings).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F


class Predicate:
    """Base predicate tree node (Predicate.scala:1)."""

    def fields(self) -> list[str]:
        raise NotImplementedError

    def to_column(self) -> Column:
        raise NotImplementedError

    def to_sql(self, quote_all: bool = False, quote: str = '"') -> str:
        """Render a WHERE fragment. ``quote_all=True`` quotes every
        identifier — required against tables Spark's JDBC writer created
        (quoted, case-sensitive columns); leave False for hand-DDL tables
        whose unquoted names the engine case-folds.

        ``quote`` picks the identifier-quoting dialect: ``'"'`` (SQL
        standard — Derby/Postgres/Oracle/H2), ``'`'`` (MySQL/MariaDB
        default sql_mode, where ``"col"`` is a STRING LITERAL and a
        double-quoted identifier silently compares a constant), or
        ``'['`` (SQL Server brackets). ``JdbcSource`` derives this from
        the JDBC URL scheme automatically."""
        raise NotImplementedError

    # combinators, so trees compose fluently like the reference object's
    def __and__(self, other: "Predicate") -> "Predicate":
        return AndPredicate(self, other)

    def __or__(self, other: "Predicate") -> "Predicate":
        return OrPredicate(self, other)

    def __invert__(self) -> "Predicate":
        return NotPredicate(self)


def _sql_lit(value: Any) -> str:
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, float):
        import math

        if not math.isfinite(value):
            # repr(inf)/repr(nan) are not SQL literals; a silent 'inf'
            # token would fail (or worse, parse as a column) downstream
            raise ValueError(f"non-finite float {value!r} has no SQL literal")
        return repr(value)
    if isinstance(value, int):
        return repr(value)
    return "'" + str(value).replace("'", "''") + "'"


def _sql_ident(name: str, quote_all: bool = False, quote: str = '"') -> str:
    """Identifier for a WHERE fragment. Unless ``quote_all``, standard-
    shaped names pass through verbatim so engines that case-fold unquoted
    identifiers (Derby/Oracle uppercase, Postgres lowercase) resolve them
    as the caller's DDL did; anything else (spaces, dashes, dots, quotes)
    is quoted in the requested dialect — ``'"'`` standard double quotes
    ('""' escaping), ``'`'`` MySQL backticks ('``' escaping), ``'['``
    SQL Server brackets (']]' escaping)."""
    import re

    if not quote_all and re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
        return name
    if quote == "`":
        return "`" + name.replace("`", "``") + "`"
    if quote == "[":
        return "[" + name.replace("]", "]]") + "]"
    return '"' + name.replace('"', '""') + '"'


@dataclass(frozen=True)
class _Comparison(Predicate):
    name: str
    value: Any
    op: str = "="

    def fields(self) -> list[str]:
        return [self.name]

    def __post_init__(self):
        if self.value is None and self.op not in ("=", "!="):
            raise ValueError(
                f"NULL only supports equals/not_equals (IS [NOT] NULL), "
                f"not {self.op!r} — SQL NULL comparisons never match"
            )

    def to_column(self) -> Column:
        c = F.col(self.name)
        if self.value is None:
            # col == lit(NULL) is NULL (matches nothing) — the reference
            # semantics for an equals-null predicate is IS NULL
            return c.isNull() if self.op == "=" else c.isNotNull()
        return {
            "=": c == self.value,
            "!=": c != self.value,
            "<": c < self.value,
            "<=": c <= self.value,
            ">": c > self.value,
            ">=": c >= self.value,
        }[self.op]

    def to_sql(self, quote_all: bool = False, quote: str = '"') -> str:
        ident = _sql_ident(self.name, quote_all, quote)
        if self.value is None:
            return f"{ident} IS NULL" if self.op == "=" else f"{ident} IS NOT NULL"
        sql_op = "<>" if self.op == "!=" else self.op
        return f"{ident} {sql_op} {_sql_lit(self.value)}"


@dataclass(frozen=True)
class NotPredicate(Predicate):
    inner: Predicate

    def fields(self) -> list[str]:
        return self.inner.fields()

    def to_column(self) -> Column:
        return ~self.inner.to_column()

    def to_sql(self, quote_all: bool = False, quote: str = '"') -> str:
        return f"NOT ({self.inner.to_sql(quote_all, quote)})"


class _Composite(Predicate):
    def __init__(self, *predicates: Predicate):
        if not predicates:
            raise ValueError(
                f"{type(self).__name__} needs at least one predicate "
                "(an empty combinator has no defined truth value and "
                "would render invalid SQL)"
            )
        self.predicates = list(predicates)

    def fields(self) -> list[str]:
        out: list[str] = []
        for p in self.predicates:
            for f in p.fields():
                if f not in out:
                    out.append(f)
        return out


class AndPredicate(_Composite):
    def to_column(self) -> Column:
        col = self.predicates[0].to_column()
        for p in self.predicates[1:]:
            col = col & p.to_column()
        return col

    def to_sql(self, quote_all: bool = False, quote: str = '"') -> str:
        return "(" + " AND ".join(
            p.to_sql(quote_all, quote) for p in self.predicates
        ) + ")"


class OrPredicate(_Composite):
    def to_column(self) -> Column:
        col = self.predicates[0].to_column()
        for p in self.predicates[1:]:
            col = col | p.to_column()
        return col

    def to_sql(self, quote_all: bool = False, quote: str = '"') -> str:
        return "(" + " OR ".join(
            p.to_sql(quote_all, quote) for p in self.predicates
        ) + ")"


# factory surface mirroring object Predicate (Predicate.scala:94)
def equals(name: str, value: Any) -> Predicate:
    return _Comparison(name, value, "=")


def not_equals(name: str, value: Any) -> Predicate:
    return _Comparison(name, value, "!=")


def lt(name: str, value: Any) -> Predicate:
    return _Comparison(name, value, "<")


def lte(name: str, value: Any) -> Predicate:
    return _Comparison(name, value, "<=")


def gt(name: str, value: Any) -> Predicate:
    return _Comparison(name, value, ">")


def gte(name: str, value: Any) -> Predicate:
    return _Comparison(name, value, ">=")


def and_(*predicates: Predicate) -> Predicate:
    return AndPredicate(*predicates)


def or_(*predicates: Predicate) -> Predicate:
    return OrPredicate(*predicates)


def not_(predicate: Predicate) -> Predicate:
    return NotPredicate(predicate)
