"""Vector math over array<float|double> columns — JVM-side expressions.

Dot products and norms use ``zip_with`` + ``aggregate`` (sequential fold in
array order → deterministic, reproducible across cluster sizes). For
heavy all-pairs workloads the operators layer (eel_spark.operators.
similarity) bounds candidate generation; these kernels are the per-pair
cost.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ a_i·b_i — left-to-right fold, deterministic."""
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """dot/(|a|·|b|); 0.0 for zero vectors."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / na / nb).otherwise(F.lit(0.0))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    diff = F.zip_with(_d(a), _d(b), lambda x, y: (x - y) * (x - y))
    return F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, v: acc + v))


def normalize(a: Column | str) -> Column:
    """Unit-normalize (pre-normalizing once turns cosine top-k into dot
    top-k — the right trade at 100 TB where each vector is read many
    times)."""
    n = norm(a)
    return F.when(n > 0, F.transform(_d(a), lambda x: x / n)).otherwise(_d(a))
