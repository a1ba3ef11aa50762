"""Deterministic stratified sampling operators (operators/sampling.py):
content-hash determinism, per-group caps, exact budget allocation, and
the WindowGroupLimit map-side prune that makes quota_sample scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from eel_spark.operators.sampling import (
    _waterfill,
    proportional_budget_sample,
    quota_sample,
    stratified_sample,
)


def _docs(spark, per_group=40, groups=("en", "fr", "de")):
    rows = [
        (1000 * gi + i, g, f"doc {g} {i}")
        for gi, g in enumerate(groups)
        for i in range(per_group)
    ]
    return spark.createDataFrame(rows, "doc_id: long, lang: string, text: string")


def test_quota_sample_caps_and_determinism(spark):
    df = _docs(spark, per_group=40)
    out = quota_sample(df, ["lang"], 10, ["doc_id"], seed=7)
    got = out.groupBy("lang").count().collect()
    assert {r["lang"]: r["count"] for r in got} == {"en": 10, "fr": 10, "de": 10}
    # deterministic: same rows on a re-run and on a repartitioned input
    ids1 = sorted(r["doc_id"] for r in out.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in quota_sample(df.repartition(13), ["lang"], 10, ["doc_id"], seed=7).collect()
    )
    assert ids1 == ids2
    # a different seed draws a different sample
    ids3 = sorted(
        r["doc_id"] for r in quota_sample(df, ["lang"], 10, ["doc_id"], seed=8).collect()
    )
    assert ids1 != ids3
    # groups smaller than the cap pass through whole
    small = quota_sample(_docs(spark, per_group=3), ["lang"], 10, ["doc_id"])
    assert small.count() == 9


def test_quota_sample_plan_window_group_limit(spark):
    """row_number <= literal over the group window must be rewritten to
    a WindowGroupLimit so every map partition is pruned to n rows per
    group BEFORE the exchange — the property that bounds shuffle volume
    at 100 TB."""
    df = _docs(spark)
    out = quota_sample(df, ["lang"], 5, ["doc_id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:2000]
    # both the partial (map-side, before exchange) and final prunes
    assert plan.count("WindowGroupLimit") >= 2, plan[:2000]


def test_stratified_sample_rates_and_determinism(spark):
    df = _docs(spark, per_group=400, groups=("en", "fr"))
    out = stratified_sample(
        df, "lang", {"en": 0.5, "fr": 0.1}, ["doc_id"], seed=3
    )
    counts = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    # binomial at n=400: generous 3-sigma-ish windows
    assert 140 <= counts["en"] <= 260, counts
    assert 10 <= counts.get("fr", 0) <= 80, counts
    # pure filter: no exchange in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # content-deterministic across repartitioning
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in stratified_sample(
            df.repartition(17), "lang", {"en": 0.5, "fr": 0.1}, ["doc_id"], seed=3
        ).collect()
    )
    assert a == b
    # unlisted strata drop by default
    df3 = _docs(spark, per_group=10, groups=("en", "xx"))
    out3 = stratified_sample(df3, "lang", {"en": 1.0}, ["doc_id"])
    assert {r["lang"] for r in out3.select("lang").distinct().collect()} == {"en"}


def test_waterfill_allocation():
    # proportional, exact total via largest remainder
    alloc = _waterfill([("a", 100), ("b", 100), ("c", 100)], [1, 1, 1], 10)
    assert sum(alloc.values()) == 10 and set(alloc) == {"a", "b", "c"}
    # a small group is taken whole; slack re-spreads to the others
    alloc = _waterfill([("a", 2), ("b", 100), ("c", 100)], [1, 1, 1], 30)
    assert alloc["a"] == 2 and sum(alloc.values()) == 30
    assert alloc["b"] + alloc["c"] == 28 and abs(alloc["b"] - alloc["c"]) <= 1
    # budget above |df|: everything survives
    alloc = _waterfill([("a", 3), ("b", 4)], [1, 1], 100)
    assert alloc == {"a": 3, "b": 4}
    # zero-weight groups get nothing
    alloc = _waterfill([("a", 50), ("b", 50)], [0, 1], 10)
    assert alloc == {"a": 0, "b": 10}


def test_proportional_budget_sample_exact_total(spark):
    df = _docs(spark, per_group=40, groups=("en", "fr", "de"))
    out = proportional_budget_sample(df, "lang", 30, ["doc_id"], seed=1)
    counts = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert sum(counts.values()) == 30
    assert all(abs(v - 10) <= 1 for v in counts.values()), counts

    # temperature flattening: a skewed corpus, high T → near-uniform
    skew = _docs(spark, per_group=5, groups=("rare",)).union(
        _docs(spark, per_group=200, groups=("big",))
    )
    prop = proportional_budget_sample(skew, "lang", 40, ["doc_id"])
    flat = proportional_budget_sample(
        skew, "lang", 40, ["doc_id"], temperature=100.0
    )
    prop_c = {r["lang"]: r["count"] for r in prop.groupBy("lang").count().collect()}
    flat_c = {r["lang"]: r["count"] for r in flat.groupBy("lang").count().collect()}
    # proportional: rare gets ~1 of 40; flattened: rare is taken whole (5)
    assert prop_c.get("rare", 0) <= 2, prop_c
    assert flat_c["rare"] == 5, flat_c
    assert sum(prop_c.values()) == 40 and sum(flat_c.values()) == 40

    # explicit weights override
    wout = proportional_budget_sample(
        df, "lang", 20, ["doc_id"], weights={"en": 3.0, "fr": 1.0, "de": 0.0}
    )
    wc = {r["lang"]: r["count"] for r in wout.groupBy("lang").count().collect()}
    assert wc.get("de", 0) == 0 and wc["en"] == 15 and wc["fr"] == 5, wc


def test_budget_sample_null_group_and_zero_weight(spark):
    from eel_spark.operators.sampling import proportional_budget_sample

    rows = [(i, None if i % 3 == 0 else ("en" if i % 3 == 1 else "de"),
             f"doc {i}") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id: long, lang: string, text: string")
    # NULL is a real stratum: counted, allocated, null-safe joined
    out = proportional_budget_sample(df, "lang", 30, ["doc_id"])
    counts = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert sum(counts.values()) == 30
    assert counts.get(None, 0) == 10, counts

    # zero weight = hard exclusion; budget fills from the others only
    out2 = proportional_budget_sample(
        df, "lang", 80, ["doc_id"], weights={"en": 1.0, "de": 1.0, None: 0.0}
    )
    c2 = {r["lang"]: r["count"] for r in out2.groupBy("lang").count().collect()}
    assert c2.get(None, 0) == 0
    # 60 rows have positive weight: total = min(80, 60) per the contract
    assert sum(c2.values()) == 60


def test_shuffle_rows_deterministic_total_permutation(spark):
    from eel_spark.operators.sampling import shuffle_rows

    df = spark.createDataFrame(
        [(i, f"src{i % 4}", f"doc {i}") for i in range(500)],
        "doc_id: long, source: string, text: string",
    )
    a = [r["doc_id"] for r in shuffle_rows(df, ["doc_id"], seed=1,
                                           num_partitions=8).collect()]
    # permutation: every row exactly once, input order broken
    assert sorted(a) == list(range(500))
    assert a != list(range(500))
    # deterministic under different input partitioning
    b = [r["doc_id"] for r in shuffle_rows(df.repartition(13), ["doc_id"],
                                           seed=1, num_partitions=8).collect()]
    assert a == b
    # a different seed is a different epoch permutation
    c = [r["doc_id"] for r in shuffle_rows(df, ["doc_id"], seed=2,
                                           num_partitions=8).collect()]
    assert sorted(c) == list(range(500)) and c != a


def test_replicate_by_weight_epochs(spark):
    from eel_spark.operators.sampling import replicate_by_weight, stratified_sample

    df = spark.createDataFrame(
        [(i, "wiki" if i % 2 == 0 else "crawl", f"doc {i}") for i in range(400)],
        "doc_id: long, source: string, text: string",
    )
    # integer weight: exact replication
    out2 = replicate_by_weight(df, 2.0, ["doc_id"])
    counts = {r["doc_id"]: r["count"] for r in out2.groupBy("doc_id").count().collect()}
    assert set(counts.values()) == {2} and len(counts) == 400

    # fractional weight: floor copies + hash-Bernoulli extra, deterministic
    out = replicate_by_weight(df, 2.5, ["doc_id"], seed=7)
    c = {r["doc_id"]: r["count"] for r in out.groupBy("doc_id").count().collect()}
    assert set(c.values()) == {2, 3}
    extra = sum(1 for v in c.values() if v == 3)
    assert 140 <= extra <= 260  # ≈ half
    again = replicate_by_weight(df.repartition(17), 2.5, ["doc_id"], seed=7)
    c2 = {r["doc_id"]: r["count"] for r in again.groupBy("doc_id").count().collect()}
    assert c == c2

    # weight < 1 subsamples with the SAME selection as stratified_sample
    kept = {r["doc_id"] for r in
            replicate_by_weight(df, 0.3, ["doc_id"], seed=7).collect()}
    strat = {r["doc_id"] for r in
             stratified_sample(df, "source", 0.3, ["doc_id"], seed=7).collect()}
    assert kept == strat

    # per-group mapping; unlisted groups default to 1 epoch
    mixed = replicate_by_weight(
        df, {"wiki": 3.0}, ["doc_id"], group_col="source"
    )
    g = {r["source"]: r["count"] for r in mixed.groupBy("source").count().collect()}
    assert g == {"wiki": 600, "crawl": 200}

    # epoch_col: 0-based copy index per row
    e = replicate_by_weight(df.limit(5), 3.0, ["doc_id"], epoch_col="epoch")
    per = {(r["doc_id"], r["epoch"]) for r in e.collect()}
    assert per == {(i, k) for i in range(5) for k in range(3)}


def test_hash_split_partition(spark):
    import pytest as _pytest
    from eel_spark.operators.sampling import hash_split

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(2000)], "doc_id: long, text: string"
    )
    out = hash_split(df, {"train": 0.8, "valid": 0.1, "test": 0.1}, ["doc_id"])
    c = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert set(c) == {"train", "valid", "test"}
    assert sum(c.values()) == 2000
    assert 1540 < c["train"] < 1660 and 150 < c["valid"] < 250
    # deterministic under repartitioning
    again = hash_split(df.repartition(13), {"train": 0.8, "valid": 0.1, "test": 0.1},
                       ["doc_id"])
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in again.collect()}
    # remainder rows get the empty split; over-1 fractions rejected
    rem = hash_split(df, {"train": 0.5}, ["doc_id"])
    rc = {r["split"]: r["count"] for r in rem.groupBy("split").count().collect()}
    assert set(rc) == {"train", ""} and sum(rc.values()) == 2000
    with _pytest.raises(ValueError, match="sum"):
        hash_split(df, {"a": 0.9, "b": 0.2}, ["doc_id"])


def test_hash_split_md5_mode_cross_engine(spark):
    """md5 mode must reproduce bit-for-bit in any engine: recompute the
    assignment with python hashlib and compare row-for-row; fractions
    summing to 1 must cover the whole hex space (the snapped top bound
    sorts above 'fffff'), and unknown hash names are rejected."""
    import hashlib

    import pytest as _pytest

    from eel_spark.operators.sampling import hash_split

    df = spark.createDataFrame(
        [(i,) for i in range(3000)], "doc_id: long"
    )
    out = hash_split(
        df, {"train": 0.8, "valid": 0.1, "test": 0.1}, ["doc_id"],
        seed=7, hash="md5",
    )
    got = {r["doc_id"]: r["split"] for r in out.collect()}
    denom = 1 << 20
    b_train = format(int(0.8 * denom), "05x")
    b_valid = format(int(0.9 * denom), "05x")
    for i in range(3000):
        h = hashlib.md5(f"7\x1f{i}".encode()).hexdigest()[:5]
        want = "train" if h < b_train else ("valid" if h < b_valid else "test")
        assert got[i] == want, (i, h, got[i], want)
    assert set(got.values()) == {"train", "valid", "test"}
    with _pytest.raises(ValueError, match="unknown hash"):
        hash_split(df, {"a": 1.0}, ["doc_id"], hash="sha1")


def test_replicate_by_weight_null_group_and_exact_boundary(spark):
    from eel_spark.operators.sampling import replicate_by_weight

    rows = [(i, None if i % 3 == 0 else "en", f"doc {i}") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id: long, lang: string, text: string")
    # {None: 0.0} must exclude the NULL stratum (eqNullSafe binding)
    out = replicate_by_weight(
        df, {None: 0.0, "en": 2.0}, ["doc_id"], group_col="lang"
    )
    c = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert c == {"en": 120}


def test_hash_split_full_fractions_cover_every_bucket(spark):
    """Fractions that sum to 1 only up to float error (0.8+0.1+0.1)
    must still cover the whole bucket range: find a row whose hash
    bucket is the topmost value and assert it gets a NAMED split."""
    from pyspark.sql import functions as F

    from eel_spark.operators.sampling import hash_split

    denom = 1 << 20
    ids = spark.range(0, 50_000_000).withColumn(
        "b", F.pmod(F.xxhash64(F.lit(0), F.col("id")), F.lit(denom))
    )
    top = ids.filter(F.col("b") == denom - 1).limit(1)
    assert top.count() == 1, "no id hashing to the top bucket in range"
    out = hash_split(
        top, {"train": 0.8, "valid": 0.1, "test": 0.1}, ["id"], seed=0
    )
    assert out.collect()[0]["split"] == "test"


# -- weighted sampling without replacement (r11, Efraimidis-Spirakis) ---------


def test_weighted_sample_matches_python_reference(spark):
    """The Spark sample equals a from-scratch Python A-ES over the SAME
    hash uniforms (collected from a projection), per group and global —
    the formula, tie-break, and hash plumbing all line up."""
    import math

    from eel_spark.operators.sampling import (
        _hash_order,
        weighted_sample_without_replacement,
    )

    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3), float(1 + (i * 7) % 10)) for i in range(60)],
        "id long, grp string, w double",
    )
    hashes = {
        r["id"]: r["h"]
        for r in df.select(
            "id", F.pmod(_hash_order(["id"], 5), F.lit(1 << 52)).alias("h")
        ).collect()
    }
    rows = df.collect()

    def key(r):
        u = (hashes[r["id"]] + 1.0) / float((1 << 52) + 1)
        return math.log(u) / r["w"]

    # global, k=7
    expect = {r["id"] for r in sorted(rows, key=lambda r: (-key(r), r["id"]))[:7]}
    got = {
        r["id"]
        for r in weighted_sample_without_replacement(
            df, "w", 7, ["id"], seed=5
        ).collect()
    }
    assert got == expect
    # per-group, k=4
    expect_g = set()
    for g in ("g0", "g1", "g2"):
        grp = [r for r in rows if r["grp"] == g]
        expect_g |= {
            r["id"] for r in sorted(grp, key=lambda r: (-key(r), r["id"]))[:4]
        }
    got_g = {
        r["id"]
        for r in weighted_sample_without_replacement(
            df, "w", 4, ["id"], group_cols=["grp"], seed=5
        ).collect()
    }
    assert got_g == expect_g
    # deterministic across partitionings
    again = {
        r["id"]
        for r in weighted_sample_without_replacement(
            df.repartition(13), "w", 7, ["id"], seed=5
        ).collect()
    }
    assert again == got


def test_weighted_sample_favors_heavy_rows(spark):
    """Distribution sanity: with one row 50x the weight of the others,
    k=1 across 30 seeds must pick the heavy row in a clear majority
    (P(heavy) = 50/59 ≈ 0.85 per draw)."""
    from eel_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )

    df = spark.createDataFrame(
        [(0, 50.0)] + [(i, 1.0) for i in range(1, 10)],
        "id long, w double",
    )
    wins = sum(
        weighted_sample_without_replacement(
            df, "w", 1, ["id"], seed=s
        ).collect()[0]["id"] == 0
        for s in range(30)
    )
    assert wins >= 18, wins  # binomial(30, .85): P(<18) ~ 1e-5


def test_weighted_sample_rejects_bad_weights_and_k(spark):
    import pytest

    from eel_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )

    df = spark.createDataFrame(
        [(1, 1.0), (2, 0.0)], "id long, w double"
    )
    with pytest.raises(Exception, match="must be > 0"):
        weighted_sample_without_replacement(df, "w", 1, ["id"]).collect()
    nulls = spark.createDataFrame(
        [(1, 1.0), (2, None)], "id long, w double"
    )
    with pytest.raises(Exception, match="must be > 0"):
        weighted_sample_without_replacement(nulls, "w", 1, ["id"]).collect()
    with pytest.raises(ValueError, match="k must be"):
        weighted_sample_without_replacement(df, "w", 0, ["id"])


def test_weighted_sample_plans_prune_map_side(spark):
    """Scale shape: the grouped variant keeps quota_sample's
    WindowGroupLimit rewrite; the global variant never runs a window
    over the unsalted full input (phase 1 partitions by the salt)."""
    from eel_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 5).alias("grp"),
        (F.col("id") % 9 + 1).cast("double").alias("w"),
    )
    grouped = weighted_sample_without_replacement(
        df, "w", 3, ["id"], group_cols=["grp"]
    )
    plan_g = grouped._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan_g
    global_ = weighted_sample_without_replacement(df, "w", 3, ["id"])
    plan = global_._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan  # phase 1 map-side prune
    assert len(global_.collect()) == 3


def _leak_corpus(spark, n=400, chains=((1, 101, 201), (2, 102), (350, 351, 352))):
    """n singleton docs plus planted duplicate chains (pairs wire
    consecutive chain members — components must merge transitively)."""
    rows = [(i, f"doc {i}") for i in range(n)]
    pairs = [
        (a, b)
        for chain in chains
        for a, b in zip(chain, chain[1:])
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    p = spark.createDataFrame(pairs, "id_a: long, id_b: long")
    return df, p, chains


def test_leakage_safe_split_keeps_clusters_together(spark):
    from eel_spark.operators.sampling import (
        hash_split,
        leakage_safe_split,
        split_leakage_report,
    )

    df, pairs, chains = _leak_corpus(spark)
    out = leakage_safe_split(
        df, {"train": 0.6, "val": 0.2, "test": 0.2}, "doc_id", pairs=pairs, seed=3
    )
    assert set(out.columns) == {"doc_id", "text", "split"}
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len(rows) == 400
    # every chain lands whole in ONE split
    for chain in chains:
        assert len({rows[i] for i in chain}) == 1, chain
    # the report agrees: zero straddling pairs
    assert split_leakage_report(out, pairs, "doc_id").count() == 0
    # fractions still roughly hold (singletons dominate)
    c = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert 190 < c["train"] < 290 and 50 < c["val"] < 110 and 50 < c["test"] < 110
    # negative control: plain hash_split DOES straddle some planted pair
    # for at least one seed (deterministic — seeds chosen so the chain
    # members hash apart), and the report surfaces it
    for seed in range(20):
        plain = hash_split(
            df, {"train": 0.6, "val": 0.2, "test": 0.2}, ["doc_id"], seed=seed
        )
        if split_leakage_report(plain, pairs, "doc_id").count() > 0:
            break
    else:
        raise AssertionError("no seed straddled a planted pair — corpus too easy")


def test_leakage_safe_split_clusters_arg_and_validation(spark):
    import pytest as _pytest
    from eel_spark.operators.dedup import connected_components
    from eel_spark.operators.sampling import leakage_safe_split

    df, pairs, _ = _leak_corpus(spark)
    clusters = connected_components(pairs)
    via_clusters = leakage_safe_split(
        df, {"train": 0.8, "test": 0.2}, "doc_id", clusters=clusters, seed=5
    )
    via_pairs = leakage_safe_split(
        df, {"train": 0.8, "test": 0.2}, "doc_id", pairs=pairs, seed=5
    )
    assert {tuple(r) for r in via_clusters.collect()} == {
        tuple(r) for r in via_pairs.collect()
    }
    # deterministic under repartitioning (retry/cluster safety)
    again = leakage_safe_split(
        df.repartition(7), {"train": 0.8, "test": 0.2}, "doc_id",
        clusters=clusters, seed=5,
    )
    assert {tuple(r) for r in via_clusters.collect()} == {
        tuple(r) for r in again.collect()
    }
    with _pytest.raises(ValueError, match="exactly one"):
        leakage_safe_split(df, {"train": 1.0}, "doc_id")
    with _pytest.raises(ValueError, match="exactly one"):
        leakage_safe_split(
            df, {"train": 1.0}, "doc_id", clusters=clusters, pairs=pairs
        )


def test_split_leakage_report_counts_by_split_pair(spark):
    from eel_spark.operators.sampling import split_leakage_report

    split_df = spark.createDataFrame(
        [(1, "train"), (2, "test"), (3, "train"), (4, "val")],
        "doc_id: long, split: string",
    )
    pairs = spark.createDataFrame(
        # 1-2 straddles train/test, 1-3 same-split, 3-4 straddles
        # train/val, 9-1 has an id missing from the split table
        [(1, 2), (1, 3), (3, 4), (9, 1)],
        "id_a: long, id_b: long",
    )
    got = {
        (r["split_a"], r["split_b"]): r["n_pairs"]
        for r in split_leakage_report(split_df, pairs, "doc_id").collect()
    }
    assert got == {("train", "test"): 1, ("train", "val"): 1}


def test_leakage_safe_split_dedupes_cluster_map(spark):
    """A clusters table with repeated node rows must not fan the join
    out and duplicate corpus rows (r11 advice): exact-duplicate rows
    dedupe; rows that DISAGREE on the component raise — quietly
    picking one representative would split a transitively-merged
    cluster across splits, the exact leak the operator prevents
    (r12 review)."""
    import pytest as _pytest

    from eel_spark.operators.sampling import leakage_safe_split

    df, _, _ = _leak_corpus(spark, n=50, chains=((1, 2),))
    dup_clusters = spark.createDataFrame(
        [(1, 1), (1, 1), (2, 1), (2, 1)],
        "node: long, component: long",
    )
    out = leakage_safe_split(
        df, {"train": 0.5, "test": 0.5}, "doc_id",
        clusters=dup_clusters, seed=3,
    )
    rows = out.collect()
    assert len(rows) == 50  # no fan-out
    splits = {r["doc_id"]: r["split"] for r in rows}
    assert splits[1] == splits[2]
    # a map that disagrees on a node's component is not canonical —
    # it must raise, never silently split the merged cluster
    conflicted = spark.createDataFrame(
        [(1, 1), (1, 9), (2, 9)], "node: long, component: long"
    )
    with _pytest.raises(ValueError, match="multiple components"):
        leakage_safe_split(
            df, {"train": 0.5, "test": 0.5}, "doc_id",
            clusters=conflicted, seed=3,
        )


def test_leakage_safe_split_leaves_no_pins_and_lean_pairs_plan(spark):
    """r12 advice pair: (a) the caller-map conflict probe must not leave
    a pinned cache behind — standalone callers were accumulating cached
    tables until a global release_pins(), including on the raise path;
    (b) the pairs-derived path must not re-aggregate the component map
    (connected_components emits one row per node by construction — the
    groupBy was a redundant exchange)."""
    import pytest as _pytest

    from eel_spark.caching import pins_mark
    from eel_spark.operators.sampling import leakage_safe_split

    df, pairs, _ = _leak_corpus(spark, n=40, chains=((1, 2),))
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1)], "node: long, component: long"
    )
    before = pins_mark()
    out = leakage_safe_split(
        df, {"train": 0.5, "test": 0.5}, "doc_id", clusters=clusters, seed=3
    )
    out.collect()
    assert pins_mark() == before  # success path pins nothing
    conflicted = spark.createDataFrame(
        [(1, 1), (1, 9)], "node: long, component: long"
    )
    with _pytest.raises(ValueError, match="multiple components"):
        leakage_safe_split(
            df, {"train": 0.5, "test": 0.5}, "doc_id",
            clusters=conflicted, seed=3,
        )
    assert pins_mark() == before  # raise path pins nothing either
    # caller-map path aggregates the map to one row per node; the
    # pairs path joins the components table directly
    via_clusters_plan = out._jdf.queryExecution().optimizedPlan().toString()
    via_pairs = leakage_safe_split(
        df, {"train": 0.5, "test": 0.5}, "doc_id", pairs=pairs, seed=3
    )
    via_pairs_plan = via_pairs._jdf.queryExecution().optimizedPlan().toString()
    assert "min(__lss_rep" in via_clusters_plan
    assert "min(__lss_rep" not in via_pairs_plan
