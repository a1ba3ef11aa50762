"""One-pass column profiler."""

from __future__ import annotations

import pytest

from eel_spark.operators.profile import profile


@pytest.fixture()
def table(spark):
    rows = [
        (1, "en", 10.0, ["a"]),
        (2, "en", 20.0, ["b"]),
        (3, "en", None, None),
        (4, "de", 40.0, []),
        (5, None, 50.0, ["c"]),
    ]
    return spark.createDataFrame(
        rows, "id LONG, lang STRING, v DOUBLE, tags ARRAY<STRING>"
    )


def test_profile_all_columns(table):
    report = {r["name"]: r for r in profile(table)}
    assert set(report) == {"id", "lang", "v", "tags"}

    rid = report["id"]
    assert rid["rows"] == 5 and rid["nulls"] == 0
    assert rid["min"] == 1 and rid["max"] == 5
    assert rid["distinct_approx"] == 5
    assert rid["mean"] == 3.0

    lang = report["lang"]
    assert lang["nulls"] == 1 and abs(lang["null_fraction"] - 0.2) < 1e-9
    top = {e["value"]: e["count"] for e in lang["top"]}
    assert top["en"] == 3 and top["de"] == 1
    assert "mean" not in lang

    v = report["v"]
    assert v["min"] == 10.0 and v["max"] == 50.0 and v["nulls"] == 1
    assert v["stddev"] is not None

    tags = report["tags"]  # complex: counts only
    assert tags["nulls"] == 1
    assert "min" not in tags and "top" not in tags and "mean" not in tags


def test_profile_column_subset_and_unknown(table):
    report = profile(table, cols=["id"])
    assert len(report) == 1 and report[0]["name"] == "id"
    with pytest.raises(ValueError, match="unknown columns"):
        profile(table, cols=["nope"])


def test_profile_empty_table(spark):
    df = spark.createDataFrame([], "id LONG, s STRING")
    report = {r["name"]: r for r in profile(df)}
    assert report["id"]["rows"] == 0
    assert report["id"]["null_fraction"] == 0.0
    assert report["s"]["top"] == []


def test_profile_single_job(table, spark):
    # all metrics must come from ONE aggregate: profile() over a cached
    # narrow projection triggers exactly one action; assert correctness
    # of the shared __rows metric across columns instead of job counts
    report = profile(table, cols=["id", "lang"])
    assert report[0]["rows"] == report[1]["rows"] == 5


def test_profile_backtick_column_name(spark):
    df = spark.createDataFrame([(1,), (2,)], ["id"]).withColumnRenamed("id", "a`b")
    report = profile(df)
    assert report[0]["name"] == "a`b"
    assert report[0]["min"] == 1 and report[0]["max"] == 2
    assert {e["value"] for e in report[0]["top"]} == {1, 2}
