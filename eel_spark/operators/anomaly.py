"""Robust anomaly detection over grouped / time-bucketed measures.

The modified z-score of Iglewicz & Hoaglin ("How to Detect and Handle
Outliers", ASQC 1993 — public): ``M = c·(x − median) / MAD`` with
``MAD = median(|x − median|)`` and ``c = 0.6745`` (Φ⁻¹(0.75), so M ≈ a
standard z-score under normality); ``|M| > 3.5`` flags an outlier.
Median/MAD resist the very outliers they hunt — a mean/stddev z-score
lets one huge spike inflate σ and mask itself (and its neighbors).

The pipeline use: ingest monitoring. Bucket an event stream per
(source, hour), run :func:`timeseries_anomalies` on the bucket counts,
and a crawler that went dark (count collapses) or a feed that
duplicated itself (count spikes) surfaces with a score attached —
before the corpus downstream inherits the gap or the dup wave.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def robust_outliers(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    cutoff: float = 3.5,
    c: float = 0.6745,
    exact: bool = False,
    z_col: str = "mod_z",
    flag_col: str = "is_outlier",
) -> DataFrame:
    """Append median / MAD / modified z-score / outlier flag, computed
    within each ``by`` group (global when empty).

    Two grouped aggregates (median of x, then median of |x − median|),
    each one exchange, each joined back to the rows (AQE broadcasts the
    group tables when the group count is small). The DEFAULT
    ``exact=False`` uses ``percentile_approx`` — a fixed-size sketch
    per group, safe at ANY group cardinality (the 100 TB caller who
    forgets the kwarg gets the bounded-memory plan; the flag becomes
    approximate near the cutoff boundary — the approx path agrees with
    exact on clear spikes, tested). ``exact=True`` opts into
    ``percentile`` — exact interpolated order statistics whose
    aggregation buffers each group's values, right for BOUNDED groups
    only (bucketed time series: thousands of rows per group — fine;
    that is the contract the gated oracle query pins with an explicit
    ``exact=True``). Default flipped from exact in r12 (r11 verdict
    #6: unbounded-group callers must not buffer by default).

    Degenerate groups: ``MAD = 0`` (over half the group identical)
    makes the score infinite for ANY deviation — those rows flag as
    outliers with a NULL ``z_col`` (try_divide), and zero-deviation
    rows never flag. NULL values pass through unflagged (NULL z).
    """
    if c <= 0 or cutoff < 0:
        raise ValueError("c must be positive and cutoff non-negative")
    clash = {"median", "mad", z_col, flag_col} & set(df.columns)
    if clash:
        raise ValueError(
            f"output column(s) {sorted(clash)} already exist — rename "
            "them (or pass different z_col/flag_col) before scoring"
        )
    keys = list(by)
    pct = F.percentile if exact else (
        lambda col, p: F.percentile_approx(col, p, 100000)
    )
    med_c, mad_c, dev_c = "__ro_med", "__ro_mad", "__ro_dev"
    while {med_c, mad_c, dev_c} & set(df.columns):
        med_c, mad_c, dev_c = "_" + med_c, "_" + mad_c, "_" + dev_c
    v = F.col(value_col).cast("double")

    def _join(base: DataFrame, agg: DataFrame) -> DataFrame:
        if not keys:
            return base.crossJoin(F.broadcast(agg))
        # NULL-SAFE key equality: groupBy treats NULL as a real group (a
        # NULL-keyed series is still a series — e.g. events missing a
        # source tag), but a plain equi-join would drop its median back-
        # join and silently never flag it. Alias the agg's keys and join
        # on <=> so the NULL group scores like any other.
        agg2 = agg.select(
            *[F.col(k).alias(f"{med_c}_k{i}") for i, k in enumerate(keys)],
            *[c for c in agg.columns if c not in keys],
        )
        cond = None
        for i, k in enumerate(keys):
            piece = base[k].eqNullSafe(agg2[f"{med_c}_k{i}"])
            cond = piece if cond is None else (cond & piece)
        return base.join(agg2, cond, "left").drop(
            *[f"{med_c}_k{i}" for i in range(len(keys))]
        )

    med = (df.groupBy(*keys) if keys else df.groupBy()).agg(
        pct(v, F.lit(0.5)).alias(med_c)
    )
    with_med = _join(df, med).withColumn(dev_c, F.abs(v - F.col(med_c)))
    mad = (with_med.groupBy(*keys) if keys else with_med.groupBy()).agg(
        pct(F.col(dev_c), F.lit(0.5)).alias(mad_c)
    )
    scored = _join(with_med, mad).withColumn(
        z_col, F.lit(float(c)) * F.try_divide(F.col(dev_c), F.col(mad_c))
    )
    flagged = scored.withColumn(
        flag_col,
        F.when(F.col(dev_c).isNull(), F.lit(None).cast("boolean"))
        .when(F.col(mad_c) == 0.0, F.col(dev_c) > 0.0)
        .otherwise(F.col(z_col) > F.lit(float(cutoff))),
    )
    return flagged.withColumnRenamed(med_c, "median").withColumnRenamed(
        mad_c, "mad"
    ).drop(dev_c)


def timeseries_anomalies(
    df: DataFrame,
    ts_col: str,
    by: Sequence[str] = (),
    granularity: str = "hour",
    measure=None,
    measure_name: str = "n",
    cutoff: float = 3.5,
    exact: bool = False,
) -> DataFrame:
    """Bucket events to ``granularity``, aggregate a measure per
    (``by``, bucket) — row count by default, any aggregate Column via
    ``measure`` — and score each bucket's measure against ITS series'
    median/MAD (:func:`robust_outliers` grouped by ``by``). Returns one
    row per (by, bucket_start, measure, median, mad, mod_z,
    is_outlier). Empty buckets are NOT materialized — a silent full
    outage is a gap, not a zero; fill with
    ``rollups.fill_time_gaps`` first when zeros should be scored."""
    buckets = (
        df.groupBy(*list(by), F.date_trunc(granularity, F.col(ts_col)).alias(
            "bucket_start"
        )).agg((measure if measure is not None else F.count(F.lit(1))).alias(
            measure_name
        ))
    )
    return robust_outliers(
        buckets, measure_name, by=by, cutoff=cutoff, exact=exact
    )
