"""Skew helpers: salted join / two-phase aggregation must be value-exact
vs their unsalted equivalents on a deliberately skewed dataset."""

from __future__ import annotations

from pyspark.sql import functions as F

from eel_spark.scale import salted_aggregate, salted_join

SF = "/root/testdata/sf0.001"


def _skewed(spark):
    # 90% of rows share key 1 — the classic hot-key shape
    rows = [(1, i) for i in range(900)] + [(k, k * 10) for k in range(2, 102)]
    return spark.createDataFrame(rows, "k INT, v INT")


def test_salted_join_matches_plain_join(spark):
    big = _skewed(spark)
    dim = spark.createDataFrame([(k, f"name_{k}") for k in range(1, 102)], "k INT, name STRING")
    plain = big.join(dim, "k").select("k", "v", "name")
    salted = salted_join(big, dim, "k", salt=4).select("k", "v", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_left_join_preserves_unmatched(spark):
    big = _skewed(spark)
    dim = spark.createDataFrame([(1, "one")], "k INT, name STRING")
    out = salted_join(big, dim, "k", how="left", salt=4)
    assert out.count() == big.count()
    assert out.filter("name IS NULL").count() == 100


def test_salted_aggregate_exact(spark):
    df = _skewed(spark)
    got = salted_aggregate(
        df, ["k"],
        {
            "n": ("sum", F.count(F.lit(1))),
            "total": ("sum", F.sum("v")),
            "mx": ("max", F.max("v")),
        },
        salt=4,
    )
    want = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"), F.max("v").alias("mx")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
