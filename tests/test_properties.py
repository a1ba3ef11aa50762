"""Property-based tests (hypothesis). Pure-Python properties run many
examples; Spark-backed properties use few examples with small data (each
example is a distributed job)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from eel_spark.schema import infer_schema, infer_type, merge_schemas

# -- schema merging: pure python, generous examples -------------------------

_TYPES = [
    T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType(),
    T.FloatType(), T.DoubleType(), T.StringType(), T.BooleanType(),
]

fields = st.lists(
    st.tuples(st.sampled_from("abcdefgh"), st.sampled_from(_TYPES)),
    min_size=1, max_size=6, unique_by=lambda t: t[0],
)


def _schema(fs):
    return T.StructType([T.StructField(n, t) for n, t in fs])


@given(fields, fields)
def test_merge_contains_all_names(fa, fb):
    merged = merge_schemas(_schema(fa), _schema(fb))
    assert set(merged.fieldNames()) == {n for n, _ in fa} | {n for n, _ in fb}


@given(fields)
def test_merge_idempotent(fs):
    s = _schema(fs)
    assert merge_schemas(s, s) == merge_schemas(s)


@given(fields, fields)
def test_merge_preserves_left_order_prefix(fa, fb):
    merged = merge_schemas(_schema(fa), _schema(fb))
    assert merged.fieldNames()[: len(fa)] == [n for n, _ in fa]


@given(st.lists(st.one_of(st.integers(-10**9, 10**9), st.floats(allow_nan=False),
                          st.text(max_size=8), st.booleans()), min_size=1, max_size=5))
def test_infer_type_total(values):
    for v in values:
        assert infer_type(v) is not None


@given(st.lists(st.tuples(st.integers(0, 100), st.text(max_size=5)),
                min_size=1, max_size=10))
def test_infer_schema_shape(rows):
    s = infer_schema(["a", "b"], rows)
    assert s.fieldNames() == ["a", "b"]
    assert s["a"].dataType == T.LongType()


# -- spark-backed properties: few examples, tiny data -----------------------

_SPARK_SETTINGS = settings(
    max_examples=5, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_SPARK_SETTINGS
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(-100, 100)),
                min_size=1, max_size=30))
def test_salted_aggregate_equals_plain(spark, rows):
    from eel_spark.scale import salted_aggregate

    df = spark.createDataFrame(rows, "k INT, v INT")
    got = salted_aggregate(
        df, ["k"],
        {"n": ("sum", F.count(F.lit(1))), "s": ("sum", F.sum("v")),
         "mx": ("max", F.max("v"))},
        salt=3,
    )
    want = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


@_SPARK_SETTINGS
@given(st.lists(st.text(st.sampled_from("ab "), min_size=0, max_size=20),
                min_size=1, max_size=10))
def test_exact_dedup_partitions_corpus(spark, texts):
    """Survivors are unique by normalized content and every doc's content
    is represented by exactly one survivor."""
    from eel_spark.functions.text import normalized_text
    from eel_spark.operators.dedup import dedup_exact

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    survivors = dedup_exact(df, "text", "doc_id")
    norm = {r["n"] for r in df.select(normalized_text("text").alias("n")).collect()}
    surv_norm = [
        r["n"] for r in survivors.select(normalized_text("text").alias("n")).collect()
    ]
    assert len(surv_norm) == len(set(surv_norm)) == len(norm)


@_SPARK_SETTINGS
@given(st.lists(st.integers(-1000, 1000), min_size=1, max_size=40, unique=True),
       st.integers(-1000, 1000))
def test_take_drop_while_partition_rows(spark, keys, pivot):
    """take_while(p) and drop_while(p) over the same order are an exact
    partition of the input: disjoint, union = all rows, and the prefix is
    maximal (every kept row precedes every failing row)."""
    from eel_spark.datastream import DataStream

    df = spark.createDataFrame([(k,) for k in keys], "k INT")
    pred = F.col("k") < pivot
    ds = DataStream(df)
    tw = sorted(r["k"] for r in ds.take_while(pred, order_by=["k"]).collect())
    dw = sorted(r["k"] for r in ds.drop_while(pred, order_by=["k"]).collect())
    assert sorted(tw + dw) == sorted(keys)
    first_fail = min((k for k in keys if not (k < pivot)), default=None)
    expected_prefix = sorted(k for k in keys if first_fail is None or k < first_fail)
    assert tw == expected_prefix


@_SPARK_SETTINGS
@given(st.lists(st.integers(-10000, 10000), min_size=1, max_size=50, unique=True))
def test_zip_with_index_is_dense_rank(spark, keys):
    """zip_with_index assigns exactly the 0-based sort position of each
    key — dense, gap-free, order-consistent (distributed two-phase
    layout must agree with a driver-side sort)."""
    from eel_spark.datastream import DataStream

    df = spark.createDataFrame([(k,) for k in keys], "k INT")
    got = {r["k"]: r["idx"] for r in
           DataStream(df).zip_with_index("idx", ["k"]).collect()}
    want = {k: i for i, k in enumerate(sorted(keys))}
    assert got == want


@_SPARK_SETTINGS
@given(st.lists(st.lists(st.sampled_from(["a", "b", "c", "aa", ""]),
                         min_size=0, max_size=12),
                min_size=1, max_size=8))
def test_top_count_fold_equals_quadratic(spark, arrays):
    """The O(n log n) sort+run-length fold (_top_count, the hot-path
    kernel) computes the same top multiplicity as the naive O(u·n)
    formulation it replaced — including empty arrays and all-duplicate
    arrays."""
    from eel_spark.functions.text import _top_count, _top_count_quadratic

    df = spark.createDataFrame([(a,) for a in arrays], "arr ARRAY<STRING>")
    got = df.select(
        _top_count(F.col("arr")).alias("fold"),
        _top_count_quadratic(F.col("arr")).alias("naive"),
    ).collect()
    for r in got:
        assert r["fold"] == r["naive"]


# -- waterfill allocation (sampling): pure python, generous examples --------

_counts = st.lists(
    st.tuples(st.integers(0, 50), st.integers(0, 10_000)),
    min_size=1, max_size=12, unique_by=lambda t: t[0],
)


@given(_counts, st.integers(0, 50_000))
def test_waterfill_exact_budget_and_caps(counts, total):
    from eel_spark.operators.sampling import _waterfill

    weights = [1.0] * len(counts)
    alloc = _waterfill(counts, weights, total)
    sizes = dict(counts)
    # every group allocated, never beyond its size, never negative
    assert set(alloc) == set(sizes)
    assert all(0 <= alloc[k] <= sizes[k] for k in alloc)
    # budget exactly exhausted (or the whole corpus taken when smaller)
    assert sum(alloc.values()) == min(total, sum(sizes.values()))


@given(_counts, st.integers(1, 20_000))
def test_waterfill_zero_weight_gets_nothing(counts, total):
    from eel_spark.operators.sampling import _waterfill

    if len(counts) < 2:
        return
    weights = [0.0] + [1.0] * (len(counts) - 1)
    alloc = _waterfill(counts, weights, total)
    nonzero_capacity = sum(n for _, n in counts[1:])
    if total <= nonzero_capacity:
        assert alloc[counts[0][0]] == 0


# -- round-6 continuation ops -------------------------------------------------


@given(st.lists(st.text(st.sampled_from("abcd"), min_size=1, max_size=8),
                min_size=1, max_size=30),
       st.integers(0, 50))
def test_bpe_encode_always_reconstructs(words, num_merges):
    """Pure-python BPE property: for ANY trained merge table, encoding
    any word (seen or unseen) concatenates exactly back to word+EOW —
    merges only ever glue adjacent symbols, never drop or reorder."""
    from collections import Counter

    from eel_spark.operators.bpe import EOW, _encode_word, _learn_merges

    freqs = dict(Counter(words))
    merges = _learn_merges(freqs, num_merges=num_merges, min_frequency=1)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    cache: dict = {}
    for w in words + ["unseen", "zzz"]:
        toks = _encode_word(w, ranks, cache)
        assert "".join(toks) == w + EOW


_url_part = st.text(st.sampled_from("abc123"), min_size=1, max_size=6)


@_SPARK_SETTINGS
@given(st.lists(
    st.tuples(
        st.sampled_from(["http", "https", "HTTP"]),
        st.booleans(),            # www prefix
        _url_part,                # host label
        st.sampled_from(["", ":80", ":443", ":8080"]),
        st.lists(_url_part, min_size=0, max_size=3),   # path segments
        st.lists(st.tuples(st.sampled_from(["a", "b", "utm_x", "gclid"]),
                           _url_part), min_size=0, max_size=4),
    ),
    min_size=1, max_size=12,
))
def test_canonical_url_idempotent(spark, parts):
    """canonical(canonical(u)) == canonical(u): re-canonicalizing any
    canonical form is a fixpoint (sorted params stay sorted, stripped
    parts stay stripped)."""
    from eel_spark.functions.text import canonical_url

    urls = []
    for scheme, www, host, port, segs, params in parts:
        q = "&".join(f"{k}={v}" for k, v in params)
        urls.append(
            f"{scheme}://{'www.' if www else ''}{host}.com{port}/"
            + "/".join(segs) + (f"?{q}" if q else "")
        )
    df = spark.createDataFrame([(u,) for u in urls], "u STRING")
    once = df.select(canonical_url("u").alias("c"))
    twice = once.select(canonical_url("c").alias("c2"), "c").collect()
    for r in twice:
        assert r["c2"] == r["c"], (r["c"], r["c2"])


@_SPARK_SETTINGS
@given(st.lists(st.floats(min_value=0.002, max_value=1e5,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=40),
       st.sampled_from([0.5, 0.9, 0.99]))
def test_ddsketch_quantile_relative_bound(spark, values, q):
    """The DDSketch guarantee as a property: for values inside the
    bucket coverage range, the histogram quantile is within alpha
    relative error of the exact rank-ceil(q*n) order statistic."""
    import math

    from eel_spark.operators.rollups import (
        quantile_from_histogram,
        quantile_rollup_aggs,
    )

    ALPHA, MINV, NB = 0.05, 1e-3, 512  # 512 buckets cover past 1e5
    aggs, _ = quantile_rollup_aggs(["v"], ALPHA, MINV, NB)
    df = spark.createDataFrame([(v,) for v in values], "v DOUBLE")
    est = df.agg(aggs["v_qhist"].alias("h")).select(
        quantile_from_histogram("h", q, ALPHA, MINV).alias("q")
    ).collect()[0]["q"]
    want = sorted(values)[max(1, math.ceil(q * len(values))) - 1]
    assert abs(est - want) <= ALPHA * want + 1e-12, (est, want)


@_SPARK_SETTINGS
@given(st.lists(st.text(st.sampled_from("abx"), min_size=0, max_size=9),
                min_size=1, max_size=12),
       st.integers(0, 2))
def test_fuzzy_join_equals_bruteforce_property(spark, strings, d):
    """Blocking never loses a pair: fuzzy_join over a tiny-alphabet
    corpus (dense near-misses, short/long boundary cases) equals the
    exhaustive cross-product oracle at every distance."""
    from eel_spark.operators.joins import fuzzy_join

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[-1]

    rows = list(enumerate(strings))
    df = spark.createDataFrame(rows, "id LONG, s STRING")
    got = {
        (r["id"], r["id_r"])
        for r in fuzzy_join(df, df, "s", "s", "id", "id",
                            max_distance=d).collect()
    }
    want = {(i, j) for i, a in rows for j, b in rows if lev(a, b) <= d}
    assert got == want


# -- y4m plane codec (r10): pure python, generous examples -------------------


@settings(deadline=None)  # first example pays the numpy/module import
@given(
    st.integers(min_value=1, max_value=4),   # frames
    st.integers(min_value=1, max_value=9),   # height
    st.integers(min_value=1, max_value=9),   # width
    st.integers(min_value=0, max_value=2**32 - 1),  # content seed
    st.tuples(st.integers(1, 60), st.integers(1, 2)),  # fps
)
def test_y4m_planes_round_trip_any_shape(n, h, w, seed, fps):
    """encode_y4m_planes ⇄ parse_y4m/y4m_frame_planes is the identity
    for every frame count, dimension, fps, and byte content — planted
    YCbCr planes survive the container bit-exactly (the invariant the
    multimodal oracle rides)."""
    import numpy as np

    from eel_spark.operators import multimodal as mm

    rng = np.random.RandomState(seed % (2**31))
    planes = rng.randint(0, 256, size=(n, 3, h, w)).astype(np.uint8)
    payload = mm.encode_y4m_planes(planes, fps=fps)
    info = mm.parse_y4m(payload)
    assert (info["n_frames"], info["width"], info["height"]) == (n, w, h)
    assert (info["fps_num"], info["fps_den"]) == fps
    for k in range(n):
        assert (mm.y4m_frame_planes(payload, k) == planes[k]).all()
    # truncating mid-frame is detected, never silently short-read
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mm.parse_y4m(payload[:-1])


# -- HTML extraction: wrapping plain text must round-trip -------------------

_plain_word = st.text(
    alphabet=st.characters(
        whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x2FF
    ),
    min_size=1,
    max_size=8,
)
_plain_text = st.lists(_plain_word, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(_plain_text, min_size=1, max_size=6))
def test_html_to_text_inverts_markup_wrap(spark, texts):
    """For ANY markup-free text, wrapping it in tags/entities/script
    noise and extracting must recover the whitespace-normalized text:
    html_to_text(wrap(t)) == normalize(t). The property the
    construction-based oracle slot relies on, over generated inputs."""
    from eel_spark.functions.text import html_to_text

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "i long, t string")
    wrapped = F.concat(
        F.lit("<html><head><script>var x = '</p>';</script></head>"
              "<body><!-- c --><p>  "),
        F.col("t"),
        F.lit(" </p></body></html>"),
    )
    out = {
        r["i"]: r["x"]
        for r in df.select(
            "i", html_to_text(wrapped).alias("x")
        ).collect()
    }
    import re as _re

    for i, t in rows:
        expect = _re.sub(r"\s+", " ", t).strip()
        assert out[i] == expect, (t, out[i])
