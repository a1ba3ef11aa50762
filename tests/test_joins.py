"""as_of_join / range_join operators against hand-computed expectations."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from eel_spark.operators.joins import as_of_join, range_join


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_as_of_backward(spark):
    probe = spark.createDataFrame(
        [(1, _ts(10), "a"), (1, _ts(12), "b"), (2, _ts(11), "c")],
        "k INT, ts TIMESTAMP, tag STRING",
    )
    build = spark.createDataFrame(
        [(1, _ts(9), 100.0), (1, _ts(11), 200.0), (2, _ts(12), 300.0)],
        "k INT, ts TIMESTAMP, px DOUBLE",
    )
    out = {r["tag"]: r for r in as_of_join(probe, build, "k").collect()}
    assert out["a"]["matched_px"] == 100.0 and out["a"]["matched_ts"] == _ts(9)
    assert out["b"]["matched_px"] == 200.0  # latest at-or-before 12:00
    assert out["c"]["matched_px"] is None   # build row is after the probe


def test_as_of_forward(spark):
    probe = spark.createDataFrame(
        [(1, _ts(10), "a")], "k INT, ts TIMESTAMP, tag STRING"
    )
    build = spark.createDataFrame(
        [(1, _ts(9), 1.0), (1, _ts(11), 2.0)], "k INT, ts TIMESTAMP, px DOUBLE"
    )
    out = as_of_join(probe, build, "k", direction="forward").collect()[0]
    assert out["matched_px"] == 2.0 and out["matched_ts"] == _ts(11)


def test_as_of_same_instant_matches(spark):
    probe = spark.createDataFrame([(1, _ts(10), "a")], "k INT, ts TIMESTAMP, tag STRING")
    build = spark.createDataFrame([(1, _ts(10), 9.0)], "k INT, ts TIMESTAMP, px DOUBLE")
    assert as_of_join(probe, build, "k").collect()[0]["matched_px"] == 9.0


def test_range_join_matches_naive(spark):
    points = spark.createDataFrame(
        [(float(i), i) for i in range(0, 40)], "x DOUBLE, pid INT"
    )
    intervals = spark.createDataFrame(
        [(0.0, 5.0, "a"), (4.5, 10.0, "b"), (35.0, 100.0, "c"), (-10.0, -1.0, "d")],
        "lo DOUBLE, hi DOUBLE, name STRING",
    )
    got = range_join(points, intervals, "x", "lo", "hi", bin_width=4.0)
    naive = points.join(
        intervals, (points.x >= intervals.lo) & (points.x <= intervals.hi)
    )
    key = lambda r: (r["pid"], r["name"])
    assert sorted(map(key, got.collect())) == sorted(map(key, naive.collect()))
    assert got.filter("name = 'd'").count() == 0


def test_range_join_no_nested_loop(spark):
    points = spark.createDataFrame([(1.0, 1)], "x DOUBLE, pid INT")
    intervals = spark.createDataFrame([(0.0, 2.0, "a")], "lo DOUBLE, hi DOUBLE, name STRING")
    plan = range_join(points, intervals, "x", "lo", "hi", 1.0)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "NestedLoop" not in plan
