"""Funnel conversion and cohort retention: ordered-step semantics,
window bounds, plan shape (single exchange), and DuckDB cross-checks
live in the gated queries (queries/ops5.py)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from eel_spark.operators.funnel import (
    funnel_report,
    funnel_times,
    retention_cohorts,
)

SCHEMA = "user long, ts timestamp, etype string"


def _t(d, h=0):
    return datetime(2024, 1, d, h)


@pytest.fixture()
def events(spark):
    rows = [
        # user 1: full funnel in order
        (1, _t(1), "view"), (1, _t(2), "click"), (1, _t(3), "buy"),
        # user 2: clicks BEFORE viewing — click must not count
        (2, _t(1), "click"), (2, _t(2), "view"),
        # user 3: view then click, no buy
        (3, _t(1), "view"), (3, _t(5), "click"),
        # user 4: buy only (no anchor)
        (4, _t(2), "buy"),
        # user 5: full funnel but buy outside a 3-day window
        (5, _t(1), "view"), (5, _t(2), "click"), (5, _t(10), "buy"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _steps():
    # built lazily: Column construction needs the JVM gateway, which is
    # absent at pytest collection time
    return {
        "view": F.col("etype") == "view",
        "click": F.col("etype") == "click",
        "buy": F.col("etype") == "buy",
    }


def test_funnel_times_ordered_semantics(spark, events):
    got = {
        r["user"]: (r["view"], r["click"], r["buy"])
        for r in funnel_times(events, "user", "ts", _steps()).collect()
    }
    assert got[1] == (_t(1), _t(2), _t(3))
    assert got[2] == (_t(2), None, None)  # pre-anchor click ignored
    assert got[3] == (_t(1), _t(5), None)
    assert got[4] == (None, None, None)
    assert got[5] == (_t(1), _t(2), _t(10))


def test_funnel_within_window(spark, events):
    got = {
        r["user"]: r["buy"]
        for r in funnel_times(
            events, "user", "ts", _steps(), within="3 days"
        ).collect()
    }
    assert got[1] == _t(3)
    assert got[5] is None  # day 10 is outside view(day 1) + 3 days


def test_funnel_report_counts_and_conversion(spark, events):
    rows = {
        r["step_name"]: (r["step"], r["users"], r["conversion"])
        for r in funnel_report(events, "user", "ts", _steps()).collect()
    }
    assert rows["view"] == (1, 4, 1.0)
    assert rows["click"] == (2, 3, 0.75)
    assert rows["buy"] == (3, 2, 0.5)


def test_funnel_single_exchange_plan(spark, events):
    """k chained step windows must share ONE hash exchange + sort on the
    user key — the 100 TB property: the event log shuffles once."""
    df = funnel_times(events, "user", "ts", _steps())
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2, plan  # window + reuse-free final agg
    assert plan.count("Sort") <= 1, plan


def test_funnel_needs_two_steps(spark, events):
    with pytest.raises(ValueError, match="2 steps"):
        funnel_times(events, "user", "ts", {"view": F.lit(True)})


def test_retention_cohorts_day(spark):
    rows = [
        (1, _t(1), "a"), (1, _t(1, 5), "a"), (1, _t(3), "a"),
        (2, _t(2), "a"), (2, _t(3), "a"),
        (3, _t(3), "a"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        (str(r["cohort"]), r["period_offset"]): r["users"]
        for r in retention_cohorts(df, "user", "ts", "day").collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-02", 0): 1,
        ("2024-01-02", 1): 1,
        ("2024-01-03", 0): 1,
    }


def test_retention_rejects_unknown_granularity(spark):
    df = spark.createDataFrame([(1, _t(1), "a")], SCHEMA)
    with pytest.raises(ValueError, match="granularity"):
        retention_cohorts(df, "user", "ts", "fortnight")


def test_retention_cohort_filter_anchoring(spark):
    rows = [
        # user 1 browses on day 1, signs up day 2, active day 4
        (1, _t(1), "view"), (1, _t(2), "signup"), (1, _t(4), "view"),
        # user 2 never signs up — excluded entirely
        (2, _t(1), "view"), (2, _t(2), "view"),
        # user 3 signs up day 1, active days 1 and 3
        (3, _t(1), "signup"), (3, _t(3), "click"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        (str(r["cohort"]), r["period_offset"]): r["users"]
        for r in retention_cohorts(
            df, "user", "ts", "day",
            cohort_filter=F.col("etype") == "signup",
        ).collect()
    }
    # user 1's day-1 view precedes the anchor: no negative offsets
    assert got == {
        ("2024-01-02", 0): 1,
        ("2024-01-02", 2): 1,
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
    }


def test_funnel_report_by_segment(spark):
    """First-touch segmentation: each user attributes to the segment of
    their earliest step-1 event; per-segment counts sum to the overall
    report for EVERY step, and per-segment rows equal an independent
    funnel_report over just that segment's users."""
    from eel_spark.operators.funnel import funnel_report_by

    rows = [
        # mobile user: full funnel; first view is mobile even though a
        # later view is web (first-touch wins)
        (1, _t(1), "view", "mobile"), (1, _t(2), "view", "web"),
        (1, _t(3), "click", "web"), (1, _t(4), "buy", "web"),
        # web users: one converts to click, one stalls at view
        (2, _t(1), "view", "web"), (2, _t(2), "click", "web"),
        (3, _t(1), "view", "web"),
        # never enters the funnel: unattributed, excluded
        (4, _t(1), "buy", "mobile"),
        # NULL user id: funnel_times keeps it as one group; the
        # null-safe attribution join must keep its segment too
        (None, _t(1), "view", "kiosk"), (None, _t(2), "click", "kiosk"),
    ]
    df = spark.createDataFrame(rows, "user long, ts timestamp, etype string, ch string")
    steps = {
        "view": F.col("etype") == "view",
        "click": F.col("etype") == "click",
        "buy": F.col("etype") == "buy",
    }
    out = funnel_report_by(df, "user", "ts", steps, F.col("ch"))
    got = {
        (r["segment"], r["step_name"]): (r["users"], r["conversion"])
        for r in out.collect()
    }
    assert got == {
        ("mobile", "view"): (1, 1.0),
        ("mobile", "click"): (1, 1.0),
        ("mobile", "buy"): (1, 1.0),
        ("web", "view"): (2, 1.0),
        ("web", "click"): (1, 0.5),
        ("web", "buy"): (0, 0.0),
        ("kiosk", "view"): (1, 1.0),
        ("kiosk", "click"): (1, 1.0),
        ("kiosk", "buy"): (0, 0.0),
    }
    # per-segment sums equal the overall report at every step
    overall = {
        r["step_name"]: r["users"]
        for r in funnel_report(df, "user", "ts", steps).collect()
    }
    for step in steps:
        assert sum(u for (s, n), (u, _) in got.items() if n == step) == overall[step]
    # and each segment row equals an independent report over that
    # segment's first-touch users
    for seg, users in (("mobile", [1]), ("web", [2, 3])):
        sub = funnel_report(
            df.where(F.col("user").isin(users)), "user", "ts", steps
        )
        for r in sub.collect():
            assert got[(seg, r["step_name"])][0] == r["users"], (seg, r)


def test_funnel_report_by_plan_bounded(spark):
    """Segmentation must not multiply the event shuffle: the funnel's
    user-key exchange + the slim attribution agg + the per-segment
    rollup — and no Python."""
    from eel_spark.operators.funnel import funnel_report_by

    from eel_spark.queries.tables import table

    ev = table(spark, "/root/testdata/sf0.001", "events").df
    steps = {
        "view": F.col("event_type") == "view",
        "click": F.col("event_type") == "click",
        "purchase": F.col("event_type") == "purchase",
    }
    out = funnel_report_by(
        ev, "user_id", "ts", steps,
        (F.col("user_id") % 3).alias("bucket"), segment_name="bucket",
    )
    assert out.count() == 9  # 3 buckets x 3 steps
    plan = out._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan
    assert plan.count("hashpartitioning(user_id") <= 3, plan
