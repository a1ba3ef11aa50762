"""Semantic deduplication (SemDeDup, Abbas et al. 2023 — public technique).

MinHash/SimHash catch *lexical* near-duplicates; semantically identical
documents with different wording (rewrites, translations-of-boilerplate,
templated paraphrases) survive them. SemDeDup's published recipe: cluster
the embedding space (k-means), compute pairwise cosine WITHIN each
cluster only, and keep one document per group of semantic duplicates —
the paper keeps the member *farthest from its cluster centroid* (the
most atypical phrasing), which preserves diversity.

Spark-first realization, reusing the IVF machinery
(:mod:`eel_spark.operators.similarity`):

- clustering = ``train_centroids`` (sampled k-means-lite, no MLlib) +
  ``_assign_cells`` (broadcast packed centroids, ``array_min`` argmin —
  shuffle-free assignment);
- within-cell pairs = ONE self-equi-join on ``cell_id`` — the cluster
  structure bounds the quadratic kernel exactly like LSH bucketing
  bounds MinHash (Σ|cell|² pairs, never n²);
- group resolution = the shared connected-components + survivor
  election used by every other dedup path.

Scale shape at 100 TB: training touches a hash-sample; assignment is one
broadcast join over the corpus; the only shuffle keyed on data volume is
the cell_id self-join, and ``max_cell_size`` hard-caps its worst cell
(an over-cap cell is excluded per side BEFORE the join — the same
flood-protection contract as the size-filtered bucket aggregation in
``dedup._bucket_pairs``; the join layout stays here because semdedup
members carry full vectors and cells run to 10k, where aggregating a
cell into one row would buffer |cell|·dim doubles at once). n_cells
should
grow with the corpus (the paper uses ~0.1% of |corpus|) so cells stay
small; the within-cell join then broadcasts nothing and shuffles each
vector exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eel_spark.functions import vectors
from eel_spark.operators.similarity import _assign_cells, train_centroids
from eel_spark.scale import ensure_parallelism


def _default_n_cells(vectors_df: DataFrame) -> int:
    """Paper-guided default: ~0.1% of |corpus| cells (floor 64) — one
    cheap count job. Cells then average ~1000 vectors, keeping the
    within-cell Σ|cell|² kernel bounded as the corpus grows instead of
    letting a fixed cell count degrade quadratically."""
    n = vectors_df.count()
    return max(64, int(n * 0.001))


def _assigned(
    vectors_df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    max_cell_size: int | None,
) -> DataFrame:
    """(__id, __v, cell_id) with over-cap cells dropped from BOTH sides.

    The cap is per cell (not per pair): one flooded cell — an embedding
    collapse, a null-text cluster — otherwise contributes |cell|² pairs
    and dominates the stage. Exact dedup should run first; it removes
    verbatim floods at Σ|bucket| cost (same pipeline order as MinHash).
    """
    v = ensure_parallelism(vectors_df).select(
        F.col(id_col).alias("__id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
    )
    assigned = _assign_cells(v, centroids, "__v")
    # normalize ONCE per vector, after assignment (cosine is
    # scale-invariant, so results are identical) — the within-cell pair
    # kernel then needs a single dot product instead of dot + two norms
    # per pair (norms would otherwise be recomputed |cell| times each);
    # measured 5.2× on the 8× spot check (SURVEY §8)
    assigned = assigned.withColumn("__v", vectors.normalize(F.col("__v")))
    if max_cell_size is not None:
        over = (
            assigned.groupBy("cell_id")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > max_cell_size)
            .select("cell_id")
        )
        # tiny over-cap list → AQE broadcasts the anti-join
        assigned = assigned.join(over, "cell_id", "left_anti")
    return assigned


def semantic_duplicate_pairs(
    vectors_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    n_cells: int | None = None,
    threshold: float = 0.9,
    max_cell_size: int | None = 10_000,
    train_sample_mod: int = 8,
    iterations: int = 2,
) -> DataFrame:
    """(id_a, id_b, cos) pairs with within-cluster cosine ≥ ``threshold``.

    Pass a persisted ``centroids`` table (from ``train_centroids``) to
    reuse a clustering across corpus snapshots; otherwise one is trained
    here on a 1/``train_sample_mod`` hash-sample of the vectors.

    Cluster-boundary caveat (inherent to SemDeDup, documented in the
    paper): a duplicate pair split across two cells is NOT examined —
    recall is traded for the Σ|cell|² bound. More cells = faster + lower
    recall; the knob is ``n_cells`` (default: derived from a corpus
    count at ~0.1%·|corpus|, floor 64 — the paper's guidance), and
    ``max_cell_size`` defaults FINITE (10k) so an embedding collapse —
    one degenerate cell holding the corpus — is dropped from the pair
    kernel instead of detonating |cell|²; pass ``max_cell_size=None``
    only when you have verified the cell-size distribution.

    The assignment table is pinned (it feeds both join sides); call
    ``eel_spark.caching.release_pins()`` when done to free the cache.
    """
    if centroids is None:
        centroids = train_centroids(
            vectors_df,
            vec_col=vec_col,
            n_cells=n_cells if n_cells is not None else _default_n_cells(vectors_df),
            iterations=iterations,
            sample_mod=train_sample_mod,
            id_col=id_col,
        )
    from eel_spark.caching import pin

    # assigned feeds BOTH sides of the cell_id self-join: unpinned, the
    # assignment (broadcast-centroid argmin + normalize — and the whole
    # k-means lineage when centroids were trained inline) runs twice per
    # action. Same convention as the minhash shingle/sig tables; released
    # by caching.release_pins().
    assigned = pin(_assigned(vectors_df, id_col, vec_col, centroids, max_cell_size))
    left = assigned.select(
        "cell_id", F.col("__id").alias("id_a"), F.col("__v").alias("__va")
    )
    right = assigned.select(
        "cell_id", F.col("__id").alias("id_b"), F.col("__v").alias("__vb")
    )
    return (
        left.join(right, "cell_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            # vectors arrive unit-normalized from _assigned: cos ≡ dot
            vectors.dot(F.col("__va"), F.col("__vb")).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def semantic_dedup(
    df: DataFrame,
    vectors_df: DataFrame,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    n_cells: int | None = None,
    threshold: float = 0.9,
    max_cell_size: int | None = 10_000,
    train_sample_mod: int = 8,
    keep: str = "farthest",
) -> DataFrame:
    """Drop all but one document per semantic-duplicate group.

    ``keep="farthest"`` elects the member farthest (L2) from its cluster
    centroid — the paper's diversity-preserving policy; ties break
    deterministically toward the larger id. ``keep="min_id"`` elects the
    smallest id (the policy every other dedup path here uses).

    The election runs on duplicate-group members only (a bounded set —
    |pairs| ≪ |corpus| after thresholding), so the extra distance join
    costs nothing at corpus scale; ``df`` itself is touched by exactly
    one anti-join.
    """
    from eel_spark.operators.dedup import connected_components_star

    if keep not in ("farthest", "min_id"):
        raise ValueError(f"unknown keep policy {keep!r}: 'farthest' or 'min_id'")
    if centroids is None:
        centroids = train_centroids(
            vectors_df,
            vec_col=vec_col,
            n_cells=n_cells if n_cells is not None else _default_n_cells(vectors_df),
            iterations=2,
            sample_mod=train_sample_mod,
            id_col=vec_id_col,
        )
    pairs = semantic_duplicate_pairs(
        vectors_df,
        id_col=vec_id_col,
        vec_col=vec_col,
        centroids=centroids,
        threshold=threshold,
        max_cell_size=max_cell_size,
    )
    comp = connected_components_star(pairs, "id_a", "id_b")
    if keep == "min_id":
        losers = comp.filter(F.col("node") != F.col("component"))
    else:
        # distance-to-own-centroid for the (bounded) dup-group nodes only:
        # rejoin vectors, re-derive the cell, broadcast the packed
        # centroid table once more — never touches non-duplicate rows
        with_vec = comp.join(
            vectors_df.select(
                F.col(vec_id_col).alias("node"),
                F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
            ),
            "node",
        )
        packed = centroids.agg(
            F.collect_list(F.struct("cell_id", "centroid")).alias("__cents")
        )
        dist = F.array_min(
            F.transform(
                "__cents",
                lambda c: vectors.l2_distance(F.col("__v"), c["centroid"]),
            )
        )
        scored = (
            with_vec.crossJoin(F.broadcast(packed))
            .withColumn("__cdist", dist)
            .select("node", "component", "__cdist")
        )
        keepers = scored.groupBy("component").agg(
            F.max_by("node", F.struct(F.col("__cdist"), F.col("node"))).alias(
                "__keep"
            )
        )
        losers = scored.join(keepers, "component").filter(
            F.col("node") != F.col("__keep")
        )
    return df.join(
        losers.select(F.col("node").alias(id_col)), id_col, "left_anti"
    )
