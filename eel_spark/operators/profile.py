"""One-pass column profiling: the "what is this table" report that
precedes writing expectations (Deequ's ColumnProfiler shape, public).

Every column's metrics — counts, null fraction, approximate distinct
(HLL), min/max, mean/stddev for numerics, approximate top-k values
(``approx_top_k`` sketch) — are computed in ONE aggregation job over
one scan, map-side partials throughout. The collected result is a
single driver row bounded by columns × metrics, never by data size.

Complex-typed columns (arrays/maps/structs) profile counts and null
fraction only — ordering and sketching aren't defined for them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)
_ORDERABLE = _NUMERIC + (
    T.StringType, T.DateType, T.TimestampType, T.TimestampNTZType,
    T.BooleanType,
)


def profile(
    df: DataFrame,
    cols: list[str] | None = None,
    top_k: int = 5,
    rsd: float = 0.05,
) -> list[dict]:
    """Profile ``cols`` (default: every column) in one aggregation.

    Returns one dict per column: ``name, type, rows, nulls,
    null_fraction, distinct_approx`` always; ``min, max, top`` (list of
    {value, count}) for orderable scalars; ``mean, stddev`` for
    numerics. ``top`` counts are themselves approximate (sketch) — use
    them to spot dominants, not to reconcile sums.
    """
    names = cols or df.columns
    fields = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in names if c not in fields]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    row = df.agg(*build_profile_aggs(names, fields, top_k, rsd)).first().asDict()
    return _report_from_row(row, names, fields)


def build_profile_aggs(names, fields, top_k: int = 5, rsd: float = 0.05):
    """The full metric list as aggregate Columns — exposed so callers
    (and the plan test) can assert the one-aggregate property on
    ``df.agg(*build_profile_aggs(...))`` directly."""
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in names:
        t = fields[c]
        # never bare F.col(c)/df[c]: both PARSE the name, so a legal
        # column containing a backtick breaks every string-named
        # metric; quote the identifier with doubled backticks instead
        safe = c.replace("`", "``")
        ref = F.col(f"`{safe}`")
        aggs.append(F.sum(ref.isNull().cast("long")).alias(f"__null_{c}"))
        if isinstance(t, _ORDERABLE):
            aggs.append(
                F.approx_count_distinct(ref, rsd).alias(f"__dist_{c}")
            )
            aggs.append(F.min(ref).alias(f"__min_{c}"))
            aggs.append(F.max(ref).alias(f"__max_{c}"))
            # approx_top_k has no DSL function; same quoting for the
            # one metric built via SQL text
            aggs.append(
                F.expr(f"approx_top_k(`{safe}`, {int(top_k)})").alias(f"__top_{c}")
            )
        if isinstance(t, _NUMERIC):
            aggs.append(F.avg(ref).alias(f"__mean_{c}"))
            aggs.append(F.stddev(ref).alias(f"__std_{c}"))
    return aggs


def _report_from_row(row: dict, names, fields) -> list[dict]:
    out = []
    rows = row["__rows"]
    for c in names:
        t = fields[c]
        rec = {
            "name": c,
            "type": t.simpleString(),
            "rows": rows,
            "nulls": row[f"__null_{c}"],
            "null_fraction": (row[f"__null_{c}"] / rows) if rows else 0.0,
        }
        if isinstance(t, _ORDERABLE):
            rec["distinct_approx"] = row[f"__dist_{c}"]
            rec["min"] = row[f"__min_{c}"]
            rec["max"] = row[f"__max_{c}"]
            rec["top"] = [
                {"value": e["item"], "count": e["count"]}
                for e in (row[f"__top_{c}"] or [])
            ]
        if isinstance(t, _NUMERIC):
            rec["mean"] = row[f"__mean_{c}"]
            rec["stddev"] = row[f"__std_{c}"]
        out.append(rec)
    return out
