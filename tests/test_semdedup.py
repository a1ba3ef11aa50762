"""Semantic dedup (operators/semdedup.py): planted paraphrase groups,
single-cell ≡ brute force, keep-policy election, cell-size cap."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from eel_spark.operators import semdedup


DIM = 16


def _member(cluster: int, axis: int, eps: float = 0.0):
    """normalize(3·e_cluster + e_axis + eps·e_{axis+1}): same-cluster
    members share the dominant axis (pairwise cos = 9/10), different
    clusters are near-orthogonal (cos ≤ 1/10); eps ≈ 0 plants a
    near-identical duplicate of the eps=0 member."""
    v = [0.0] * DIM
    v[cluster] = 3.0
    v[axis] += 1.0
    v[(axis + 1) % DIM] += eps
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def _axis_centroids(spark):
    """Known-good clustering: one centroid per cluster's dominant axis
    (assignment then matches the planted clusters exactly — these tests
    verify the dedup mechanics, not k-means convergence)."""
    rows = []
    for c in (0, 1, 2):
        v = [0.0] * DIM
        v[c] = 1.0
        rows.append((c, v))
    return spark.createDataFrame(rows, "cell_id: long, centroid: array<double>")


@pytest.fixture(scope="module")
def corpus(spark):
    """3 well-separated clusters of 8 vectors; in cluster-0 a planted
    trio (ids 0,1,2) and a planted pair (ids 3,4) of near-identical
    vectors; everything else mutually distinct (cos ≤ 0.9)."""
    rows = []
    vid = 0
    for c in (0, 1, 2):
        for j in range(8):
            if c == 0 and j in (1, 2):
                emb = _member(c, 3, eps=0.001 * j)   # dups of id 0 (axis 3)
            elif c == 0 and j == 3:
                emb = _member(c, 4)
            elif c == 0 and j == 4:
                emb = _member(c, 4, eps=0.002)       # dup of id 3 (axis 4)
            else:
                emb = _member(c, 3 + j)
            rows.append((vid, c, emb))
            vid += 1
    vecs = spark.createDataFrame(
        rows, "vec_id: long, cluster: int, embedding: array<double>"
    )
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(vid)], "doc_id: long, text: string"
    )
    return docs, vecs


def test_pairs_single_cell_equals_brute_force(spark, corpus):
    """n_cells=1 puts everything in one cell: the within-cell join IS
    the all-pairs join, so pairs must equal brute-force thresholding."""
    _, vecs = corpus
    got = {
        (r["id_a"], r["id_b"])
        for r in semdedup.semantic_duplicate_pairs(
            vecs, n_cells=1, threshold=0.999, train_sample_mod=1
        ).collect()
    }
    a = vecs.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = vecs.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    from eel_spark.functions import vectors as V

    brute = {
        (r["id_a"], r["id_b"])
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(V.cosine(F.col("va"), F.col("vb")) >= 0.999)
        .collect()
    }
    assert got == brute
    assert {(0, 1), (0, 2), (1, 2), (3, 4)} <= got


def test_semantic_dedup_keeps_one_per_group(spark, corpus):
    docs, vecs = corpus
    out = semdedup.semantic_dedup(
        docs,
        vecs,
        threshold=0.999,
        n_cells=3,
        train_sample_mod=1,
        keep="min_id",
    )
    kept = {r["doc_id"] for r in out.collect()}
    # min-id policy: 0 survives its trio, 3 survives its pair
    assert 0 in kept and {1, 2} & kept == set()
    assert 3 in kept and 4 not in kept
    # non-duplicates untouched: 24 docs - 3 losers
    assert len(kept) == 21


def test_keep_farthest_elects_most_atypical(spark, corpus):
    """The paper's policy: within a dup group, survive the member
    farthest from its cluster centroid (max L2, ties to larger id)."""
    docs, vecs = corpus
    cents = _axis_centroids(vecs.sparkSession)
    out = semdedup.semantic_dedup(
        docs, vecs, centroids=cents, threshold=0.999, keep="farthest"
    )
    kept = {r["doc_id"] for r in out.collect()}
    assert len(kept) == 21

    # compute the expected survivor of the trio {0,1,2} directly
    from eel_spark.functions import vectors as V

    packed = cents.agg(
        F.collect_list(F.struct("cell_id", "centroid")).alias("cs")
    )
    d = {
        r["vec_id"]: r["d"]
        for r in vecs.filter("vec_id <= 4")
        .crossJoin(F.broadcast(packed))
        .select(
            "vec_id",
            F.array_min(
                F.transform(
                    "cs", lambda c: V.l2_distance(F.col("embedding"), c["centroid"])
                )
            ).alias("d"),
        )
        .collect()
    }
    trio_winner = max([0, 1, 2], key=lambda i: (d[i], i))
    pair_winner = max([3, 4], key=lambda i: (d[i], i))
    assert trio_winner in kept and pair_winner in kept
    assert ({0, 1, 2} - {trio_winner}) & kept == set()


def test_flooded_corpus_safe_under_defaults(spark):
    """The 100-TB first-run hazard: an embedding collapse (every vector
    identical) lands the whole corpus in ONE cell. Under DEFAULT
    arguments the finite max_cell_size must drop that cell — the call
    completes with zero pairs instead of detonating |corpus|² — and
    n_cells derives from the corpus count (never the old fixed 64)."""
    n = 12_000
    vecs = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(1.0) for _ in range(8)]).alias("embedding"),
    )
    pairs = semdedup.semantic_duplicate_pairs(vecs, threshold=0.5)
    assert pairs.count() == 0
    assert semdedup._default_n_cells(vecs) == max(64, int(n * 0.001))


def test_max_cell_size_caps_flooded_cell(spark, corpus):
    """A cell over the cap contributes NO pairs (flood protection);
    other cells still dedup normally."""
    _, vecs = corpus
    cents = _axis_centroids(vecs.sparkSession)
    # every cluster has 8 members; cap below that excludes all cells
    none = semdedup.semantic_duplicate_pairs(
        vecs, centroids=cents, threshold=0.999, max_cell_size=7
    )
    assert none.count() == 0
    # cap at 8 admits them all again
    some = semdedup.semantic_duplicate_pairs(
        vecs, centroids=cents, threshold=0.999, max_cell_size=8
    )
    assert some.count() == 4
