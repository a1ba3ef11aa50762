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


# --- fuzzy (edit distance) join ---------------------------------------------


def _brute_pairs(left, right, d):
    # oracle: full cross product + python Levenshtein
    def lev(a, b):
        if a == b:
            return 0
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[-1]

    return {
        (i, j)
        for i, a in left
        for j, b in right
        if a is not None and b is not None and lev(a, b) <= d
    }


def test_fuzzy_join_matches_brute_force(spark):
    from eel_spark.operators.joins import fuzzy_join

    names = [
        (1, "jonathan smith"), (2, "jonathan smyth"), (3, "jon smith"),
        (4, "maria garcia"), (5, "maria garcias"), (6, "marla garcia"),
        (7, "completely different"), (8, "ab"), (9, "abc"), (10, "abd"),
        (11, ""), (12, "a"), (13, None), (14, "xy"),
        (15, "the quick brown fox"), (16, "the quick brown fax"),
    ]
    df = spark.createDataFrame(names, "id LONG, name STRING")
    got = {
        (r["id"], r["id_r"])
        for r in fuzzy_join(df, df, "name", "name", "id", "id", max_distance=2).collect()
    }
    want = _brute_pairs(
        [(i, n) for i, n in names], [(i, n) for i, n in names], 2
    )
    assert got == want
    # sanity on the oracle itself: self pairs present, known typo pairs in
    assert (1, 2) in got and (15, 16) in got and (8, 9) in got
    assert (1, 7) not in got


def test_fuzzy_join_distance_column_and_names(spark):
    from eel_spark.operators.joins import fuzzy_join

    a = spark.createDataFrame([(1, "colour")], "lid LONG, s STRING")
    b = spark.createDataFrame([(9, "color"), (10, "colander")], "rid LONG, t STRING")
    rows = fuzzy_join(a, b, "s", "t", "lid", "rid", max_distance=1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["lid"] == 1 and r["rid"] == 9 and r["distance"] == 1
    assert r["s"] == "colour" and r["t"] == "color"


def test_fuzzy_join_short_strings_bounded_candidates(spark):
    """The record-linkage workload: a large corpus of SAME-LENGTH short
    strings (SKU/name-like, below the q-gram bound). A pure length-band
    blocking would put every string in ONE band → n² candidates; the
    PassJoin segment blocking must keep the candidate count orders of
    magnitude below n², and flooded segment keys must be capped."""
    import random

    from eel_spark.operators.joins import _fuzzy_candidates, _fuzzy_slim

    rng = random.Random(7)
    n = 20_000
    rows = [
        (i, "".join(rng.choice("abcdefghijklmnop") for _ in range(6)))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "id LONG, s STRING")
    l = _fuzzy_slim(df, "s", "id", "l")
    r = _fuzzy_slim(df, "s", "id", "r")
    # d=1, q=3 → short_bound=6, all strings take the segment path
    cands = _fuzzy_candidates(l, r, d=1, q=3, max_bucket_size=10_000)
    n_cand = cands.count()
    assert n_cand < n * n // 100, f"{n_cand} candidates ≈ quadratic"

    # flood: every string identical → every segment key over-cap → all
    # dropped under a tiny cap (the documented recall trade)
    same = spark.createDataFrame(
        [(i, "aaaaaa") for i in range(5000)], "id LONG, s STRING"
    )
    sl = _fuzzy_slim(same, "s", "id", "l")
    sr = _fuzzy_slim(same, "s", "id", "r")
    assert _fuzzy_candidates(sl, sr, d=1, q=3, max_bucket_size=100).count() == 0


def test_fuzzy_join_flooded_gram_cap(spark):
    from eel_spark.operators.joins import fuzzy_join

    # every string shares the flooded gram "aaa"; pair (1,2) shares ONLY
    # that gram -> lost under a tiny cap (the documented tradeoff), while
    # the identical pair (3,4) also shares "zzz" grams and survives.
    # All strings are >= q*(d+1) = 6 chars so none take the short path.
    rows = [(1, "aaaxqw"), (2, "aaayqw"), (3, "zzzaaa"), (4, "zzzaaa")]
    pad = [(100 + i, f"aaa{i:04d}") for i in range(50)]
    df = spark.createDataFrame(rows + pad, "id LONG, s STRING")
    got = {
        (r["id"], r["id_r"])
        for r in fuzzy_join(
            df, df, "s", "s", "id", "id", max_distance=1, max_bucket_size=20
        ).collect()
        if r["id"] < r["id_r"]
    }
    assert (3, 4) in got
    assert (1, 2) not in got
