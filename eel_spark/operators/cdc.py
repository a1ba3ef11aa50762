"""Change-data-capture between table snapshots: classify every key as
inserted, deleted, updated or unchanged — the diff a warehouse runs
before publishing a rebuilt dimension, reconciling a migrated table, or
deriving an incremental feed from full snapshots. Composes with the
rest of the maintenance family: feed the updates/inserts to
``operators/upsert.upsert_parquet`` (type-1) or the change rows to
``operators/scd2.scd2_merge`` (type-2).

Scale shape: ONE co-partitioned full outer join on the key projection —
both sides shuffle once on the same key, compare columns are hashed
into a single 64-bit digest BEFORE the join so the join carries
(keys, hash) + requested payload columns, not the full row width.
AQE handles skewed keys; no window functions, no driver collects.
"""

from __future__ import annotations

import functools
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: str | Sequence[str],
    compare_cols: Sequence[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Diff two snapshots of the same logical table.

    Returns ``keys… + change_type`` where ``change_type`` ∈
    ``{'insert', 'delete', 'update'}`` (plus ``'unchanged'`` when
    ``include_unchanged``). ``compare_cols`` defaults to every shared
    non-key column; values compare NULL-safely (NULL == NULL is
    unchanged). Keys must be unique per snapshot — duplicate keys make
    "the" old/new row ill-defined, so they are rejected via a count
    aggregate, not assumed away.
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in ks]
    cmp_cols = list(compare_cols)
    if not cmp_cols:
        raise ValueError("no columns to compare (compare_cols empty)")

    def digest(df: DataFrame, side: str) -> DataFrame:
        # one 64-bit digest of the compared values; NULLs are hashed
        # distinctly from any real value by xxhash64's type-aware nulls
        return df.select(
            *ks, F.xxhash64(*[F.col(c) for c in cmp_cols]).alias(f"__h_{side}")
        )

    for df, side in ((old, "old"), (new, "new")):
        dup = (
            df.groupBy(*ks)
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"{side} snapshot has duplicate key "
                f"{ {k: dup[0][k] for k in ks} }; snapshot_diff requires "
                "unique keys per snapshot — dedup first"
            )

    o = digest(old, "old")
    n = digest(new, "new")
    joined = o.join(n, on=ks, how="full_outer")
    change = (
        F.when(F.col("__h_old").isNull(), F.lit("insert"))
        .when(F.col("__h_new").isNull(), F.lit("delete"))
        .when(F.col("__h_old") != F.col("__h_new"), F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(*ks, change.alias("change_type"))
    if not include_unchanged:
        out = out.where(F.col("change_type") != "unchanged")
    return out


def snapshot_diff_rows(
    old: DataFrame,
    new: DataFrame,
    keys: str | Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-level diff: like :func:`snapshot_diff` but carrying each
    compared column twice (``<col>_old`` / ``<col>_new``) so downstream
    consumers can build a change feed without re-joining the snapshots.
    Inserts have NULL ``*_old`` values, deletes NULL ``*_new``."""
    ks = [keys] if isinstance(keys, str) else list(keys)
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in ks]
    cmp_cols = list(compare_cols)

    o = old.select(
        *ks,
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"{c}_old") for c in cmp_cols],
    )
    n = new.select(
        *ks,
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"{c}_new") for c in cmp_cols],
    )
    joined = o.join(n, on=ks, how="full_outer")
    same = functools.reduce(
        lambda a, b: a & b,
        [
            F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new"))
            for c in cmp_cols
        ],
    )
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(~same, F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.withColumn("change_type", change)
        .where(F.col("change_type") != "unchanged")
        .select(
            *ks,
            "change_type",
            *[x for c in cmp_cols for x in (f"{c}_old", f"{c}_new")],
        )
    )
