"""exact_topk_frequent: equivalence to the full-shuffle groupBy on
skewed and uniform data, the exactness certificate's honesty under
trimming, NULL keys, multi-column keys, and the bounded-candidate
property that is the operator's scale contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eel_spark.operators.frequency import exact_topk_frequent


def _zipf_df(spark, n_keys=200, rows_per_rank=400):
    # key i appears ~rows_per_rank/(i+1) times — a Zipfian tail
    rows = []
    for i in range(n_keys):
        rows.extend([(f"k{i:04d}",)] * max(1, rows_per_rank // (i + 1)))
    return spark.createDataFrame(rows, "key string").repartition(16)


def _brute_topk(df, keys, k, count_name="cnt"):
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias(count_name))
        .orderBy(F.col(count_name).desc(), *[F.col(c).asc() for c in keys])
        .limit(k)
        .collect()
    )


def test_matches_full_shuffle_on_zipf(spark):
    df = _zipf_df(spark)
    got = exact_topk_frequent(df, "key", k=10, capacity=32).collect()
    want = _brute_topk(df, ["key"], 10)
    assert [(r["key"], r["cnt"]) for r in got] == [
        (r["key"], r["cnt"]) for r in want
    ]


def test_trimming_happens_yet_result_exact(spark):
    """capacity far below the distinct-key count forces MG decrements in
    every partition; the certificate must still hold on Zipf data and
    the answer must still be exact."""
    df = _zipf_df(spark, n_keys=500, rows_per_rank=1000)
    got = exact_topk_frequent(df, "key", k=5, capacity=16).collect()
    want = _brute_topk(df, ["key"], 5)
    assert [(r["key"], r["cnt"]) for r in got] == [
        (r["key"], r["cnt"]) for r in want
    ]


def test_uniform_distribution_fails_honestly(spark):
    """More equally-frequent distinct keys than capacity: no candidate
    set can be certified, so the call must refuse rather than return a
    plausibly-wrong list."""
    rows = [(f"u{i:05d}",) for i in range(5000)] * 3
    df = spark.createDataFrame(rows, "key string").repartition(8)
    with pytest.raises(ValueError, match="cannot certify"):
        exact_topk_frequent(df, "key", k=10, capacity=64)
    # best-effort mode still answers, with the uncertainty attached
    out = exact_topk_frequent(
        df, "key", k=10, capacity=64, require_exact=False
    ).collect()
    assert len(out) == 10
    assert all(r["max_missed"] > 0 for r in out)  # NOT certified


def test_best_effort_attaches_zero_bound_when_certified(spark):
    rows = [(f"u{i:03d}",) for i in range(50)] * 3
    df = spark.createDataFrame(rows, "key string").repartition(4)
    out = exact_topk_frequent(
        df, "key", k=5, capacity=256, require_exact=False
    ).collect()
    assert all(r["max_missed"] == 0 for r in out)


def test_rejects_float_keys(spark):
    df = spark.createDataFrame([(1.5,), (float("nan"),)], "key double")
    with pytest.raises(TypeError, match="floating-point"):
        exact_topk_frequent(df, "key", k=1)


def test_exact_when_capacity_exceeds_distinct(spark):
    """capacity ≥ distinct keys: nothing is ever trimmed, bound = 0, so
    even a uniform distribution certifies (trivially exact)."""
    rows = [(f"u{i:03d}",) for i in range(100)] * 7
    df = spark.createDataFrame(rows, "key string").repartition(8)
    got = exact_topk_frequent(df, "key", k=150, capacity=256).collect()
    assert len(got) == 100
    assert all(r["cnt"] == 7 for r in got)


def test_null_and_multi_column_keys(spark):
    rows = (
        [(None, "x")] * 50
        + [(1, "x")] * 30
        + [(1, None)] * 20
        + [(2, "y")] * 10
    )
    df = spark.createDataFrame(rows, "a long, b string").repartition(4)
    got = exact_topk_frequent(df, ["a", "b"], k=3, capacity=64).collect()
    assert [(r["a"], r["b"], r["cnt"]) for r in got] == [
        (None, "x", 50),
        (1, "x", 30),
        (1, None, 20),
    ]


def test_candidate_shuffle_is_bounded(spark):
    """The scale contract: pass-2's aggregate sees only candidate keys.
    With capacity=16 over 12 partitions the exact-count groupBy input is
    ≤ 192 distinct keys no matter how many distinct keys exist."""
    df = _zipf_df(spark, n_keys=2000, rows_per_rank=2000).repartition(12)
    from pyspark.sql import Observation

    # instrument: count rows surviving the semi-join
    ks = ["key"]
    from eel_spark.operators.frequency import _mg_map_fn

    proj = df.select(*ks)
    summary = proj.mapInPandas(
        _mg_map_fn(ks, 16), schema="key string, __mg long, __pn long, __trim long"
    )
    cand = summary.where(F.col("__mg").isNotNull()).select(*ks).distinct()
    assert cand.count() <= 16 * 12
