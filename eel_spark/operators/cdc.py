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
Duplicate-key validation is IN-PLAN (a count over the same per-side
aggregation that builds the digest, raising via ``raise_error`` at
execution time), so the key-uniqueness contract costs zero extra jobs
and zero extra shuffles — the validating aggregate's hash partitioning
is exactly the partitioning the join needs. AQE handles skewed keys;
no window functions, no driver collects.
"""

from __future__ import annotations

import functools
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from eel_spark.functions.hashes import row_digest


def _resolve_cols(
    old: DataFrame,
    new: DataFrame,
    ks: list[str],
    compare_cols: Sequence[str] | None,
) -> list[str]:
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in ks]
    cmp_cols = list(compare_cols)
    if not cmp_cols:
        raise ValueError(
            "no columns to compare (compare_cols empty — the snapshots "
            "share only key columns)"
        )
    return cmp_cols


def _dup_key_guard(ks: list[str], side: str, value: Column) -> Column:
    """In-plan key contract check: grouped on ``ks`` with ``__n``
    counted, raise at execution time when a key repeats OR carries a
    NULL component, else pass ``value`` through. Embedded in the value
    expression so Catalyst cannot prune it away.

    NULL keys must be rejected, not diffed: the full outer join's
    equality never matches NULL to NULL, so a NULL-keyed row present
    and unchanged in both snapshots would surface as BOTH an 'insert'
    and a 'delete' — a silently corrupt change feed (same contract as
    ``scd2._validate_batch``, enforced here in-plan at zero extra
    jobs)."""
    dup_msg = F.concat(
        F.lit(f"{side} snapshot has duplicate key ("),
        F.concat_ws(
            ", ", *[F.col(k).cast("string") for k in ks]
        ),
        F.lit(
            "); snapshot diff requires unique keys per snapshot — "
            "dedup first"
        ),
    )
    null_msg = F.lit(
        f"{side} snapshot has NULL in key column(s) {ks}; NULL keys "
        "can never match across snapshots (the join would report the "
        "same row as both insert and delete) — fill or drop such rows "
        "first"
    )
    null_key = functools.reduce(
        lambda a, b: a | b, [F.col(k).isNull() for k in ks]
    )
    return (
        F.when(null_key, F.raise_error(null_msg))
        .when(F.col("__n") > 1, F.raise_error(dup_msg))
        .otherwise(value)
    )


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
    unchanged, and a value MOVING between nullable columns is an update
    — the digest anchors NULLs, see
    :func:`eel_spark.functions.hashes.row_digest`). Keys must be unique
    per snapshot — duplicate keys make "the" old/new row ill-defined,
    so they raise at execution time (``SparkRuntimeException`` from the
    in-plan guard, not an eager driver job); NULL key components raise
    the same way (see :func:`_dup_key_guard`).
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    cmp_cols = _resolve_cols(old, new, ks, compare_cols)

    def digest(df: DataFrame, side: str) -> DataFrame:
        h = f"__h_{side}"
        return (
            df.select(*ks, row_digest(cmp_cols).alias(h))
            .groupBy(*ks)
            .agg(F.count(F.lit(1)).alias("__n"), F.max(h).alias(h))
            .select(*ks, _dup_key_guard(ks, side, F.col(h)).alias(h))
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
    Inserts have NULL ``*_old`` values, deletes NULL ``*_new``. Same
    contracts as :func:`snapshot_diff`: at least one compare column
    (``ValueError`` otherwise) and unique, NULL-free keys per snapshot
    (in-plan ``raise_error`` at execution time)."""
    ks = [keys] if isinstance(keys, str) else list(keys)
    cmp_cols = _resolve_cols(old, new, ks, compare_cols)

    def side(df: DataFrame, tag: str) -> DataFrame:
        marker = f"__in_{tag}"
        # first() works for any column type (max would reject maps); with
        # unique keys there is exactly one row, so it is deterministic —
        # and a second row raises the guard before the value can matter
        aliased = [F.first(F.col(c)).alias(f"{c}_{tag}") for c in cmp_cols]
        return (
            df.groupBy(*ks)
            .agg(F.count(F.lit(1)).alias("__n"), *aliased)
            .select(
                *ks,
                _dup_key_guard(ks, tag, F.lit(True)).alias(marker),
                *[f"{c}_{tag}" for c in cmp_cols],
            )
        )

    o = side(old, "old")
    n = side(new, "new")
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
