"""Robust (median/MAD) outlier detection: modified z-score vs a from-
scratch Python reference, degenerate MAD=0 groups, the time-series
report, and the approx path."""

from __future__ import annotations

import statistics
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from eel_spark.operators.anomaly import robust_outliers, timeseries_anomalies


def _py_modz(values, cutoff=3.5, c=0.6745):
    med = statistics.median(values)
    devs = [abs(v - med) for v in values]
    mad = statistics.median(devs)
    out = []
    for v, d in zip(values, devs):
        if mad == 0:
            out.append((med, mad, None, d > 0))
        else:
            z = c * d / mad
            out.append((med, mad, z, z > cutoff))
    return out


def test_robust_outliers_matches_python_reference(spark):
    groups = {
        "a": [10.0, 11.0, 9.0, 10.5, 10.0, 9.5, 250.0, 10.0],     # one spike
        "b": [5.0, 5.0, 5.0, 5.0, 7.0],                           # MAD = 0
        "c": [1.0, 2.0, 3.0, 4.0],                                # even count
    }
    rows = [(g, i, v) for g, vs in groups.items() for i, v in enumerate(vs)]
    df = spark.createDataFrame(rows, "g string, i int, v double")
    # exact=True: the Python reference computes INTERPOLATED medians
    # (statistics.median), which is the `percentile` contract; the r12
    # default is the sketch path, pinned by the approx-agrees test
    got = {
        (r["g"], r["i"]): (r["median"], r["mad"], r["mod_z"], r["is_outlier"])
        for r in robust_outliers(df, "v", by=["g"], exact=True).collect()
    }
    for g, vs in groups.items():
        for i, (med, mad, z, flag) in enumerate(_py_modz(vs)):
            gmed, gmad, gz, gflag = got[(g, i)]
            assert gmed == med and gmad == mad, (g, i)
            assert (gz is None) == (z is None)
            if z is not None:
                assert abs(gz - z) < 1e-12
            assert gflag == flag, (g, i)
    # the spike is the only flagged row in group a; b flags only the 7
    flagged = {k for k, v in got.items() if v[3]}
    assert flagged == {("a", 6), ("b", 4)}


def test_robust_outliers_global_nulls_and_validation(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, 10.0), (3, 11.0), (4, 9.0), (5, 500.0), (6, None)],
        "i int, v double",
    )
    got = {r["i"]: (r["mod_z"], r["is_outlier"])
           for r in robust_outliers(df, "v").collect()}
    assert got[5][1] is True
    assert got[6] == (None, None)  # NULL value passes through unflagged
    assert {i for i, (_, f) in got.items() if f} == {5}
    with pytest.raises(ValueError, match="positive"):
        robust_outliers(df, "v", c=0.0)
    with pytest.raises(ValueError, match="already exist"):
        robust_outliers(df.withColumn("mad", F.lit(1)), "v")


def test_timeseries_anomalies_flags_spike_hour(spark):
    base = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(24):
        n = 500 if h == 13 else 10 + (h % 3)  # hour 13 spikes 50x
        for _ in range(n):
            rows.append((eid, "click", base + timedelta(hours=h, minutes=1)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, et string, ts timestamp")
    rep = timeseries_anomalies(df, "ts", by=["et"], granularity="hour")
    flagged = [
        (str(r["bucket_start"]), r["n"])
        for r in rep.filter("is_outlier").collect()
    ]
    assert flagged == [("2024-01-01 13:00:00", 500)]
    assert rep.count() == 24
    # sum measure instead of count
    df2 = df.withColumn("amount", F.lit(2.0))
    rep2 = timeseries_anomalies(
        df2, "ts", by=["et"], granularity="hour",
        measure=F.sum("amount"), measure_name="total",
    )
    assert [
        r["total"] for r in rep2.filter("is_outlier").collect()
    ] == [1000.0]


def test_robust_outliers_approx_path_agrees_on_clear_spike(spark):
    df = spark.createDataFrame(
        [(i, 10.0 + (i % 5) * 0.1) for i in range(1000)] + [(1000, 9999.0)],
        "i long, v double",
    )
    ex = robust_outliers(df, "v", exact=True)
    ap = robust_outliers(df, "v")  # exact=False is the r12 default
    assert [r["i"] for r in ex.filter("is_outlier").collect()] == [1000]
    assert [r["i"] for r in ap.filter("is_outlier").collect()] == [1000]


def test_robust_outliers_scores_null_group_key(spark):
    """A NULL group key is a real series (groupBy keeps it) — the
    median/MAD back-join must be null-safe so its spike still flags."""
    rows = [("src", i, 10.0) for i in range(6)] + [("src", 6, 11.0)]
    rows += [(None, i, 20.0) for i in range(6)] + [(None, 6, 900.0)]
    df = spark.createDataFrame(rows, "g string, i int, v double")
    got = {
        (r["g"], r["i"]): r["is_outlier"]
        for r in robust_outliers(df, "v", by=["g"]).collect()
    }
    assert got[(None, 6)] is True          # the NULL series' spike flags
    assert got[(None, 0)] is False
    assert got[("src", 6)] is True and got[("src", 0)] is False


def test_anomaly_over_streamed_rollup_store_matches_batch(spark, tmp_path):
    """The streaming ingest-monitoring composition: events stream into
    the exactly-once rollup store (streaming_rollup_sink), the store's
    re-merged hourly counts feed robust_outliers — and the result equals
    batch timeseries_anomalies over the full event set. No new operator
    needed: the stores and the scorer compose."""
    from datetime import datetime, timedelta

    from eel_spark.operators.rollups import read_rollup
    from eel_spark.streaming import streaming_rollup_sink

    base = datetime(2024, 3, 1)
    rows = []
    eid = 0
    for h in range(30):
        n = 400 if h == 7 else 8 + (h % 4)
        for _ in range(n):
            rows.append((eid, "click", base + timedelta(hours=h, minutes=2)))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, et string, ts timestamp")
    src = tmp_path / "ev_waves"
    src.mkdir()
    for i in range(3):
        ev.where(F.col("event_id") % 3 == i).coalesce(1).write.parquet(
            str(src / f"w{i}")
        )
    stream = (
        spark.readStream.schema("event_id BIGINT, et STRING, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    store = str(tmp_path / "rollup_store")
    q = streaming_rollup_sink(
        stream, store, str(tmp_path / "ck_roll"), "ts",
        aggs={"n": F.count(F.lit(1))},
        granularities=["hour"], extra_keys=["et"],
    )
    q.awaitTermination(120)

    counts = read_rollup(
        spark, store, merges={"n": F.sum("n")}, extra_keys=["et"]
    ).select("et", "bucket_start", "n")
    streamed = robust_outliers(counts, "n", by=["et"])
    batch = timeseries_anomalies(ev, "ts", by=["et"], granularity="hour")
    s_rows = sorted(
        (r["et"], str(r["bucket_start"]), r["n"], r["median"], r["mad"],
         r["is_outlier"])
        for r in streamed.collect()
    )
    b_rows = sorted(
        (r["et"], str(r["bucket_start"]), r["n"], r["median"], r["mad"],
         r["is_outlier"])
        for r in batch.collect()
    )
    assert s_rows == b_rows
    assert [r for r in s_rows if r[5]] == [
        ("click", "2024-03-01 07:00:00", 400, s_rows[0][3], s_rows[0][4], True)
    ] or sum(1 for r in s_rows if r[5]) == 1
