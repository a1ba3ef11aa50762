"""time_rollup: multi-granularity continuous-aggregate shape — every
granularity must equal its standalone groupBy, from ONE scan + ONE
shuffle (Expand + single Aggregate)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eel_spark.operators.rollups import time_rollup

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def events(spark):
    from eel_spark.timeutils import normalize_ts

    return normalize_ts(spark.read.parquet(f"{SF}/events.parquet"))


def test_each_granularity_matches_standalone_groupby(events):
    out = time_rollup(
        events,
        "ts",
        {"n": F.count(F.lit(1)), "v": F.round(F.sum("value"), 2)},
        granularities=["hour", "day", "month"],
    )
    for g, unit in [("hour", "hour"), ("day", "day"), ("month", "month")]:
        want = sorted(
            (str(r["b"]), r["n"], r["v"])
            for r in events.groupBy(F.date_trunc(unit, "ts").alias("b"))
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v"))
            .collect()
        )
        have = sorted(
            (str(r["bucket_start"]), r["n"], r["v"])
            for r in out.filter(F.col("granularity") == g).collect()
        )
        assert want == have, g


def test_extra_keys_dimension(events):
    out = time_rollup(
        events, "ts", {"n": F.count(F.lit(1))}, ["day"], extra_keys=["event_type"]
    )
    got = out.filter("event_type = 'click'").agg(F.sum("n")).first()[0]
    assert got == events.filter("event_type = 'click'").count()


def test_single_expand_single_aggregate(events):
    """The scale property: N granularities must NOT mean N shuffles —
    one Expand feeding one (partial+final) aggregate."""
    out = time_rollup(
        events, "ts", {"n": F.count(F.lit(1))}, ["minute", "hour", "day", "month"]
    )
    logical = out._jdf.queryExecution().optimizedPlan().toString()
    assert logical.count("Expand") == 1
    assert logical.count("Aggregate") == 1


def test_unknown_granularity_rejected(events):
    with pytest.raises(ValueError, match="unknown granularities"):
        time_rollup(events, "ts", {"n": F.count(F.lit(1))}, ["fortnight"])
