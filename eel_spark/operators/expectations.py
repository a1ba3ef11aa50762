"""One-pass data-quality validation (Deequ-style, public Amazon
technique): declare expectations over a DataFrame, verify them all in
ONE aggregation job.

Every check contributes aggregate columns to a single ``agg`` — Spark
computes them in one scan with map-side partials, so a 40-check suite
on 100 TB costs exactly one pass (plus one extra pass per EXACT
uniqueness check, which needs its own shuffle; the default is the
approximate HLL form). The collected result is one driver row,
bounded by the number of checks, never by data size.

Usage::

    from eel_spark.operators import expectations as E
    ok, report = E.validate(df, [
        E.row_count_between(1000),
        E.not_null("doc_id"),
        E.unique("doc_id"),
        E.in_range("n_chars", 0, 1_000_000),
        E.matches("lang", r"^[a-z]{2}$"),
        E.mean_between("value", 0, 500),
    ])

``report`` is a list of (name, passed, observed) rows; ``validate``
optionally raises on failure — the CI gate shape.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One expectation: named aggregate metrics + a verdict function
    over the collected metric values."""

    name: str
    metrics: dict[str, Column]
    verdict: Callable[[dict], tuple[bool, str]]


def _n() -> Column:
    return F.count(F.lit(1))


def row_count_between(lo: int = 0, hi: int | None = None) -> Check:
    def v(m):
        n = m["__rows"]
        ok = n >= lo and (hi is None or n <= hi)
        return ok, f"rows={n}"

    return Check(f"row_count_between({lo},{hi})", {"__rows": _n()}, v)


def not_null(col: str, max_null_fraction: float = 0.0) -> Check:
    k = f"__nulls_{col}"

    def v(m):
        n, nulls = m["__rows"], m[k]
        frac = (nulls / n) if n else 0.0
        return frac <= max_null_fraction, f"null_fraction={frac:.6f}"

    return Check(
        f"not_null({col})",
        {k: F.sum(F.col(col).isNull().cast("long")), "__rows": _n()},
        v,
    )


def _param_key(prefix: str, col: str, *params) -> str:
    """Metric key carrying the metric-affecting parameters — two checks
    on the same column with different parameters must NOT share a
    metric (merged-dict dedup would make the first check read the
    second's expression). md5 of the params, not hash(): stable across
    processes."""
    import hashlib

    tag = hashlib.md5(repr(params).encode()).hexdigest()[:8]
    return f"__{prefix}_{col}_{tag}"


def unique(col: str, exact: bool = False, rsd: float = 0.01) -> Check:
    """Values of ``col`` are unique (ignoring NULLs). Default uses
    ``approx_count_distinct`` (same single pass, rsd-tolerant verdict);
    ``exact=True`` uses a real COUNT DISTINCT — its own shuffle, the
    one check family that costs more than the shared scan."""
    k = _param_key("distinct", col, exact, rsd)
    kn = f"__nonnull_{col}"
    d = (
        F.countDistinct(F.col(col))
        if exact
        else F.approx_count_distinct(F.col(col), rsd)
    )

    def v(m):
        nn, dist = m[kn], m[k]
        tol = 0 if exact else max(4, int(rsd * 3 * nn))
        return dist >= nn - tol, f"non_null={nn} distinct~{dist}"

    return Check(
        f"unique({col}{',exact' if exact else ''})",
        {k: d, kn: F.sum(F.col(col).isNotNull().cast("long"))},
        v,
    )


def in_range(col: str, lo=None, hi=None) -> Check:
    kmin, kmax = f"__min_{col}", f"__max_{col}"

    def v(m):
        mn, mx = m[kmin], m[kmax]
        ok = (mn is None) or (
            (lo is None or mn >= lo) and (hi is None or mx <= hi)
        )
        return ok, f"min={mn} max={mx}"

    return Check(
        f"in_range({col},{lo},{hi})",
        {kmin: F.min(col), kmax: F.max(col)},
        v,
    )


def matches(col: str, pattern: str, min_fraction: float = 1.0) -> Check:
    """At least ``min_fraction`` of NON-NULL values match ``pattern``."""
    k = _param_key("match", col, pattern)
    kn = f"__nonnull_{col}"

    def v(m):
        nn, hits = m[kn], m[k]
        frac = (hits / nn) if nn else 1.0
        return frac >= min_fraction, f"match_fraction={frac:.6f}"

    return Check(
        f"matches({col},{pattern!r})",
        {
            k: F.sum(F.col(col).rlike(pattern).cast("long")),
            kn: F.sum(F.col(col).isNotNull().cast("long")),
        },
        v,
    )


def mean_between(col: str, lo: float, hi: float) -> Check:
    k = f"__mean_{col}"

    def v(m):
        mn = m[k]
        return (mn is None) or (lo <= mn <= hi), f"mean={mn}"

    return Check(f"mean_between({col},{lo},{hi})", {k: F.avg(col)}, v)


def quantile_between(
    col: str, q: float, lo: float, hi: float, accuracy: int = 10_000
) -> Check:
    k = _param_key("q", col, q, accuracy)

    def v(m):
        qv = m[k]
        return (qv is None) or (lo <= qv <= hi), f"p{int(q*100)}={qv}"

    return Check(
        f"quantile_between({col},{q},{lo},{hi})",
        {k: F.percentile_approx(col, q, accuracy)},
        v,
    )


def satisfies(name: str, condition: Column, min_fraction: float = 1.0) -> Check:
    """Generic row-level predicate: at least ``min_fraction`` of ALL
    rows satisfy ``condition`` (NULL condition counts as failing)."""
    # the CONDITION is part of the key: two satisfies() sharing a name
    # but differing in condition must not share a metric (str(Column)
    # renders the expression deterministically within a session)
    k = _param_key("sat", "", name, str(condition))

    def v(m):
        n, hits = m["__rows"], m[k]
        frac = (hits / n) if n else 1.0
        return frac >= min_fraction, f"satisfied_fraction={frac:.6f}"

    return Check(
        f"satisfies({name})",
        {k: F.sum(F.coalesce(condition.cast("long"), F.lit(0))), "__rows": _n()},
        v,
    )


def custom(name: str, metrics: dict[str, Column], verdict) -> Check:
    """Escape hatch: any aggregate metrics + any verdict function."""
    return Check(name, metrics, verdict)


def validate(
    df: DataFrame,
    checks: list[Check],
    raise_on_failure: bool = False,
) -> tuple[bool, list[dict]]:
    """Run every check in ONE aggregation pass. Returns
    ``(all_passed, report)`` where report rows are
    ``{"check", "passed", "observed"}``. With ``raise_on_failure``,
    raises ``ValueError`` listing every failed expectation — the CI /
    pre-publish gate shape.

    Metric columns with the same name are computed once and shared
    across checks (e.g. ``__rows``).
    """
    if not checks:
        raise ValueError("no checks given — an empty suite would "
                         "vacuously pass and hide wiring bugs")
    merged: dict[str, Column] = {}
    for c in checks:
        merged.update(c.metrics)
    row = df.agg(*[c.alias(k) for k, c in merged.items()]).collect()[0]
    m = row.asDict()
    report, ok = [], True
    for c in checks:
        passed, observed = c.verdict(m)
        ok &= passed
        report.append({"check": c.name, "passed": passed, "observed": observed})
    if raise_on_failure and not ok:
        failed = "; ".join(
            f"{r['check']} ({r['observed']})" for r in report if not r["passed"]
        )
        raise ValueError(f"data quality validation failed: {failed}")
    return ok, report
