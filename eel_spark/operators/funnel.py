"""Ordered-event analytics: funnel conversion and cohort retention —
the two event-log questions every product/ops warehouse asks next to
its rollups ("how many users made it through view → click → purchase?",
"how many of January's new users were still active in week 3?"). The
reference has no event-sequence operators (its pipelines stop at
groupBy aggregation); these are Spark-first additions in the same
family as ``operators/rollups`` and ``sessionize``.

Scale shape
-----------
``funnel_times`` is ONE hash exchange on the user key: every step's
"earliest qualifying event so far" is a cumulative conditional min over
the same (user) partitioning and (ts) ordering, so Catalyst plans k
chained window steps on a single Exchange + Sort (plan-asserted in
tests). The final per-user reduce rides the same partitioning — no
second shuffle of the event log. At 100 TB the cost is the one
user-key shuffle of a (user, ts, step-flags) projection, never k
passes over the log.

``retention_cohorts`` is the same single-exchange discipline: the
cohort (first-seen period) is an unordered whole-partition window min
on the user partitioning, then the distinct (cohort, offset, user)
projection aggregates with map-side partials.

Funnel semantics (the standard first-touch definition): step 1 anchors
at the user's EARLIEST step-1 event; each later step anchors at the
earliest qualifying event strictly after the previous step's anchor
(and, when ``within`` is set, no later than step-1's anchor +
``within``). Greedy earliest-first maximizes reachability for the
unwindowed case; with a window it is the conventional first-touch
funnel, not a maximal-matching one.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel_times(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    steps: Mapping[str, Column],
    within: str | None = None,
) -> DataFrame:
    """Per-user step-completion times for an ordered funnel.

    ``steps`` maps step name → boolean Column matching that step's
    events (insertion order defines the funnel order). Returns one row
    per user: ``user_col`` + one timestamp column per step (NULL = the
    user never completed that step in order). ``within`` (an INTERVAL
    string like ``'7 days'``) bounds the whole funnel relative to the
    step-1 anchor.
    """
    names = list(steps)
    if len(names) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    ts = F.col(ts_col)
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for i, name in enumerate(names):
        cond = steps[name]
        if i > 0:
            cond = cond & (ts > F.col(f"__t_{names[i - 1]}"))
            if within is not None:
                cond = cond & (
                    ts <= F.col(f"__t_{names[0]}") + F.expr(f"INTERVAL {within}")
                )
        # cumulative conditional min: NULL until the step first completes
        # (in order), the anchor time from then on — same partitioning
        # and ordering every round, so ONE Exchange+Sort serves all steps
        out = out.withColumn(f"__t_{name}", F.min(F.when(cond, ts)).over(w))
    aggs = [F.min(f"__t_{n}").alias(n) for n in names]
    return out.groupBy(user_col).agg(*aggs)


def _shape_report(counts: DataFrame, names: list, partition_col: str | None = None) -> DataFrame:
    """Shared report shaping: per-step struct array → explode →
    conversion from step 1 within the (optional) partition column —
    one definition for the plain and segmented reports."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step"),
                F.lit(n).alias("step_name"),
                F.col(n).alias("users"),
            )
            for i, n in enumerate(names)
        ]
    )
    keep = [partition_col] if partition_col else []
    exploded = counts.select(*keep, F.explode(pairs).alias("s")).select(
        *keep, "s.step", "s.step_name", "s.users"
    )
    w = (Window.partitionBy(partition_col) if partition_col else Window) \
        .orderBy("step").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    first = F.first("users").over(w)
    return exploded.withColumn(
        "conversion",
        F.when(first == 0, F.lit(0.0)).otherwise(
            F.round(F.col("users") / first, 4)
        ),
    )


def funnel_report(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    steps: Mapping[str, Column],
    within: str | None = None,
) -> DataFrame:
    """Funnel summary: one row per step — ``step`` (1-based position),
    ``step_name``, ``users`` reaching it in order, and ``conversion``
    from step 1 (rounded to 4 places; 0-user funnels report 0.0)."""
    names = list(steps)
    times = funnel_times(df, user_col, ts_col, steps, within)
    counts = times.agg(
        *[F.count(n).alias(n) for n in names]  # count ignores NULLs
    )
    return _shape_report(counts, names)


def funnel_report_by(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    steps: Mapping[str, Column],
    segment: Column,
    within: str | None = None,
    segment_name: str = "segment",
) -> DataFrame:
    """Funnel summary broken down by FIRST-TOUCH segment — the standard
    product-analytics attribution: each user belongs to the ``segment``
    value of their earliest step-1 event (ties broken by segment value,
    deterministic), and the per-segment funnel counts users of that
    segment reaching each step in order. Returns one row per
    (segment, step): ``segment_name``, ``step``, ``step_name``,
    ``users``, and ``conversion`` from that segment's step 1.

    Per-segment rows sum to the overall ``funnel_report`` counts for
    every step (equivalence-tested, INCLUDING a NULL user id — the
    attribution join is null-safe so funnel_times' NULL-user group keeps
    its segment instead of vanishing through an equi-join): only users
    who entered the funnel (step 1) are attributable, which is exactly
    the population the overall report counts. Cost: the funnel's one
    user-key exchange + one slim user-grain attribution aggregate joined
    back on the user key — segments never multiply the event shuffle."""
    names = list(steps)
    times = funnel_times(df, user_col, ts_col, steps, within)
    first_cond = steps[names[0]]
    seg = (
        df.where(first_cond)
        .groupBy(user_col)
        .agg(
            F.min_by(
                segment, F.struct(F.col(ts_col), segment)
            ).alias(segment_name)
        )
    )
    t, g = times.alias("__t"), seg.alias("__g")
    joined = t.join(
        g, F.col(f"__t.{user_col}").eqNullSafe(F.col(f"__g.{user_col}"))
    ).select(*[F.col(f"__t.{n}") for n in names], F.col(f"__g.{segment_name}"))
    counts = joined.groupBy(segment_name).agg(
        *[F.count(n).alias(n) for n in names]
    )
    return _shape_report(counts, names, partition_col=segment_name)


def funnel_state_report(
    states: DataFrame,
    step_names: Sequence[str],
    segment_name: str | None = None,
) -> DataFrame:
    """Shape a per-user anchor-state table (one row per user with one
    TIMESTAMP column per step — the latest-row output of
    ``streaming/streams.streaming_funnel``, or ``funnel_times`` itself)
    into the report the batch operators emit: one row per step — or per
    (segment, step) when ``segment_name`` is given — with ``users``
    (non-null anchors) and ``conversion`` from step 1. Because it runs
    on the maintained per-user state instead of raw events, a streaming
    report sink gets the exact ``funnel_report_by`` shape from one slim
    aggregate over O(users) rows, no event rescan (equivalence-tested:
    3-wave out-of-order stream ≡ batch, segment-for-segment)."""
    names = list(step_names)
    aggs = [F.count(n).alias(n) for n in names]
    counts = (
        states.groupBy(segment_name).agg(*aggs)
        if segment_name
        else states.agg(*aggs)
    )
    return _shape_report(counts, names, partition_col=segment_name)


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    granularity: str = "week",
    cohort_filter: Column | None = None,
) -> DataFrame:
    """Classic cohort-retention triangle: users grouped by first-seen
    period, counted in each later period they were active.

    Returns ``cohort`` (DATE of the user's first period),
    ``period_offset`` (0 = the cohort period itself) and ``users``
    (distinct active users of that cohort in that period).
    ``granularity``: any ``date_trunc`` unit (``day``/``week``/
    ``month``).

    ``cohort_filter`` anchors the cohort on a specific event kind (the
    product convention: cohort by first SIGNUP, count any later
    activity): the cohort is the user's first period among rows
    matching the filter; users with no matching row are excluded, and
    activity before the anchor period does not count (no negative
    offsets).
    """
    period = F.date_trunc(granularity, F.col(ts_col)).cast("date")
    w = Window.partitionBy("__u")  # whole-partition frame, no sort
    flag = F.lit(True) if cohort_filter is None else cohort_filter
    with_cohort = (
        # the filter must evaluate in this projection, while the source
        # columns it references still exist
        df.select(
            F.col(user_col).alias("__u"),
            period.alias("__p"),
            flag.alias("__f"),
        )
        .withColumn(
            "__cohort", F.min(F.when(F.col("__f"), F.col("__p"))).over(w)
        )
        .where(
            F.col("__cohort").isNotNull()
            & (F.col("__p") >= F.col("__cohort"))
        )
    )
    if granularity == "week":
        offset = F.datediff(F.col("__p"), F.col("__cohort")) / 7
    elif granularity == "day":
        offset = F.datediff(F.col("__p"), F.col("__cohort"))
    elif granularity == "month":
        offset = F.months_between(F.col("__p"), F.col("__cohort"))
    else:
        raise ValueError(f"unsupported granularity {granularity!r}")
    return (
        with_cohort.select(
            F.col("__cohort").alias("cohort"),
            offset.cast("long").alias("period_offset"),
            "__u",
        )
        .distinct()
        .groupBy("cohort", "period_offset")
        .agg(F.count(F.lit(1)).alias("users"))
    )
