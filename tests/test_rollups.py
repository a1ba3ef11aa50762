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


def test_merge_time_rollup_incremental_equals_full(spark, events, tmp_path):
    """Two incremental merges (history, then a late batch) must equal the
    one-shot rollup of all data, and the merge must only rewrite the
    partitions the late batch touches."""
    import glob as _glob

    from eel_spark.operators.rollups import merge_time_rollup, time_rollup

    path = str(tmp_path / "rollup")
    aggs = {"n": F.count(F.lit(1)), "v_cents": F.sum(F.round(F.col("value") * 100).cast("long"))}
    merges = {"n": F.sum("n"), "v_cents": F.sum("v_cents")}

    split = F.col("user_id") % 5 == 0
    first, late = events.filter(~split), events.filter(split)

    merge_time_rollup(spark, path, first, "ts", aggs, merges, ["day", "month"])
    files_before = set(_glob.glob(f"{path}/granularity=*/bucket_date=*/*.parquet"))
    merge_time_rollup(spark, path, late, "ts", aggs, merges, ["day", "month"])

    got = sorted(
        (r["granularity"], str(r["bucket_start"]), r["n"], r["v_cents"])
        for r in spark.read.parquet(path).collect()
    )
    want = sorted(
        (r["granularity"], str(r["bucket_start"]), r["n"], r["v_cents"])
        for r in time_rollup(events, "ts", aggs, ["day", "month"]).collect()
    )
    assert got == want and len(got) > 0

    # untouched partitions keep their original files (dynamic overwrite
    # rewrote only what the late batch touched)
    late_dates = {
        (r["granularity"], str(r["bucket_date"]))
        for r in time_rollup(late, "ts", aggs, ["day", "month"])
        .withColumn("bucket_date", F.to_date("bucket_start"))
        .select("granularity", "bucket_date").distinct().collect()
    }
    untouched_survivors = [
        f for f in files_before
        if (f.split("granularity=")[1].split("/")[0],
            f.split("bucket_date=")[1].split("/")[0]) not in late_dates
    ]
    assert all(__import__("os").path.exists(f) for f in untouched_survivors)


def test_distinct_sketch_rollup_incremental(spark, events, tmp_path):
    """Mergeable HLL sketches let the continuous aggregate maintain
    distinct counts incrementally — countDistinct itself is not
    algebraic. Estimates must (a) be near-exact at these cardinalities
    vs a true countDistinct, and (b) be IDENTICAL between the
    incremental two-batch merge and the one-shot rollup (HLL union is a
    register-wise max: union-of-sketches ≡ sketch-of-union)."""
    from eel_spark.operators.rollups import (
        distinct_rollup_aggs,
        merge_time_rollup,
        time_rollup,
        with_distinct_estimates,
    )

    aggs, merges = distinct_rollup_aggs(["user_id"])
    aggs["n"] = F.count(F.lit(1))
    merges["n"] = F.sum("n")

    # one-shot: estimate vs exact per day bucket
    rolled = with_distinct_estimates(
        time_rollup(events, "ts", aggs, ["day"]), ["user_id"]
    )
    exact = events.groupBy(F.date_trunc("day", "ts").alias("b")).agg(
        F.countDistinct("user_id").alias("d")
    )
    joined = rolled.join(exact, rolled.bucket_start == exact.b).collect()
    assert joined
    for r in joined:
        assert abs(r["user_id_distinct"] - r["d"]) <= max(2, 0.05 * r["d"]), r

    # incremental: two merges == one-shot, estimate-for-estimate
    path = str(tmp_path / "sketch_rollup")
    split = F.col("user_id") % 3 == 0
    merge_time_rollup(spark, path, events.filter(~split), "ts", aggs, merges, ["day"])
    merge_time_rollup(spark, path, events.filter(split), "ts", aggs, merges, ["day"])
    got = sorted(
        (str(r["bucket_start"]), r["user_id_distinct"], r["n"])
        for r in with_distinct_estimates(
            spark.read.parquet(path), ["user_id"]
        ).collect()
    )
    want = sorted(
        (str(r["bucket_start"]), r["user_id_distinct"], r["n"])
        for r in with_distinct_estimates(
            time_rollup(events, "ts", aggs, ["day"]), ["user_id"]
        ).collect()
    )
    assert got == want and len(got) > 0
