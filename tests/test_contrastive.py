"""Contrastive triplet mining."""

from __future__ import annotations

import math

import pytest

from eel_spark.operators.contrastive import mine_triplets


def _clustered_corpus(spark):
    # three well-separated clusters in 8d; members differ by a tiny
    # orthogonal wiggle so within-cluster cosine ~0.99+, across ~0
    base = {
        0: [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        1: [0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        2: [0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0],
    }
    rows = []
    for cid, v in base.items():
        for j in range(4):
            w = list(v)
            w[7] = 0.05 * j
            rows.append((cid * 10 + j, w))
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")


def _cluster(i):
    return i // 10


def test_hard_triplets_separate_clusters(spark):
    emb = _clustered_corpus(spark)
    t = mine_triplets(
        emb, k_pos=2, pos_min=0.9, n_neg=2, neg_max=0.5, negatives="hard"
    ).collect()
    assert t
    anchors = {r["anchor_id"] for r in t}
    assert len(anchors) == 12  # every row anchors some triplet
    for r in t:
        assert _cluster(r["positive_id"]) == _cluster(r["anchor_id"])
        assert _cluster(r["negative_id"]) != _cluster(r["anchor_id"])
        assert r["pos_cos"] >= 0.9 and r["neg_cos"] <= 0.5
        assert r["positive_id"] != r["anchor_id"]
        assert r["negative_id"] != r["anchor_id"]
    # bounded fan-out: <= k_pos * n_neg per anchor
    from collections import Counter

    per = Counter(r["anchor_id"] for r in t)
    assert max(per.values()) <= 4


def test_random_negatives_deterministic(spark):
    emb = _clustered_corpus(spark)
    kw = dict(k_pos=1, pos_min=0.9, n_neg=1, neg_max=0.5,
              negatives="random", n_buckets=2, seed=7)
    a = sorted(map(tuple, mine_triplets(emb, **kw).collect()))
    b = sorted(map(tuple, mine_triplets(emb, **kw).collect()))
    assert a == b and a
    for r in a:
        anchor, pos, neg = r[0], r[1], r[2]
        assert _cluster(neg) != _cluster(anchor)
        assert _cluster(pos) == _cluster(anchor)


def test_bad_bounds_rejected(spark):
    emb = _clustered_corpus(spark)
    with pytest.raises(ValueError):
        mine_triplets(emb, pos_min=0.4, neg_max=0.5)
    with pytest.raises(ValueError):
        mine_triplets(emb, negatives="fabricated")


def test_isolated_anchor_yields_nothing(spark):
    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0])]  # orthogonal: no positives
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    assert mine_triplets(emb, pos_min=0.9, neg_max=0.1).count() == 0


def test_precomputed_neighbors_backend(spark):
    # any ANN backend can feed the miner via neighbors_df
    emb = _clustered_corpus(spark)
    from eel_spark.operators.similarity import brute_force_topk
    from pyspark.sql import functions as F

    q = emb.select(F.col("vec_id").alias("anchor_id"), "embedding")
    nb = brute_force_topk(
        emb, q, id_col="vec_id", vec_col="embedding",
        query_id_col="anchor_id", k=10, exclude_self=True,
    ).withColumnRenamed("vec_id", "candidate_id")
    via_nb = sorted(map(tuple, mine_triplets(
        emb, k_pos=2, pos_min=0.9, n_neg=2, neg_max=0.5,
        neighbors_df=nb,
    ).collect()))
    direct = sorted(map(tuple, mine_triplets(
        emb, k_pos=2, pos_min=0.9, n_neg=2, neg_max=0.5, k_scan=10,
    ).collect()))
    assert via_nb == direct and via_nb

    import pytest as _p

    with _p.raises(ValueError, match="neighbors_df needs columns"):
        mine_triplets(emb, neighbors_df=emb)


def test_negative_neg_max_accepted(spark):
    emb = _clustered_corpus(spark)
    # cosine is [-1, 1]: a negative hard-negative bound is legitimate
    t = mine_triplets(emb, k_pos=1, pos_min=0.9, n_neg=1, neg_max=-0.5)
    assert t.count() == 0  # orthogonal clusters: nothing at cos <= -0.5
