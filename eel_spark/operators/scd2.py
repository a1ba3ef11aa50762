"""Slowly-changing-dimension type-2 (SCD2) versioning — the
history-preserving dimension maintenance a warehouse runs next to its
fact pipelines: every attribute change closes the key's current row
(``valid_to`` stamped) and opens a new one, so any past state is
reconstructable with an as-of predicate.

The reference materializes dimension snapshots through its Hive/JDBC
sinks (eel-hive HiveSink.scala:1, eel-jdbc JdbcSink.scala:1) but has no
temporal merge — this family adds it Spark-first, and it composes with
:mod:`eel_spark.operators.upsert` (which is type-1: replace in place).

Scale shape
-----------
``scd2_from_changes`` is pure Catalyst: ONE hash exchange on the key —
the change-detection lag and the validity lead ride the same
partitioning (plan-asserted single Exchange in tests), so rebuilding a
dimension from a 100 TB change log costs one shuffle of the log's key
projection.

``scd2_merge`` maintains the table incrementally with the same pruning
discipline as ``upsert_parquet``/``merge_time_rollup``: the table is
laid out as ``scd_current ∈ {0,1}`` × ``scd_bucket = hash(key) % n``
partitions, a batch reads ONLY the current-rows partitions of the key
buckets it touches, closed history is append-only and NEVER read or
rewritten. Per-batch cost is O(current rows in touched buckets), not
O(history) — after years of changes the closed partitions are cold
storage.

Crash contract (same as upsert's unpartitioned path): the merge appends
newly-closed rows BEFORE dynamically overwriting the current
partitions. A crash between the two writes leaves a key with both a
closed row and its still-open predecessor (an overlap a re-run of the
same batch repairs, since merge decisions derive from current rows
only); the append-first order means history is never lost. Use a
transactional table format when concurrent readers matter.
"""

from __future__ import annotations

import functools
from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

CURRENT_COL = "scd_current"  # partition: 1 = open version, 0 = closed
BUCKET_COL = "scd_bucket"  # partition: hash(key) % n_buckets

# streaming exactly-once bookkeeping, both under the table root; the
# leading underscore keeps them invisible to Spark's file index, so
# plain reads of the table never see them
STREAM_CLOSED_DIR = "_stream_closed"  # per-batch closed-row store
STREAM_MARKER_DIR = "_stream_applied"  # batch_id=N commit markers


def _keylist(keys: str | Sequence[str]) -> list[str]:
    return [keys] if isinstance(keys, str) else list(keys)


def _any_attr_changed(attr_cols: list[str], w) -> Column:
    """NULL-safe 'any tracked attribute differs from the previous row'."""
    changed = [
        ~F.col(a).eqNullSafe(F.lag(F.col(a)).over(w)) for a in attr_cols
    ]
    return functools.reduce(lambda x, y: x | y, changed)


def scd2_from_changes(
    df: DataFrame,
    keys: str | Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str,
    order_cols: Sequence[str] = (),
    extra_cols: Sequence[str] = (),
) -> DataFrame:
    """Collapse a change log into SCD2 version rows.

    ``df`` rows are observations ``(keys…, attrs…, ts)``; consecutive
    observations (per key, ordered by ``ts`` then ``order_cols``) with
    identical tracked attributes merge into one version. Output:
    ``keys… + attrs… + extra_cols… + valid_from + valid_to +
    is_current`` where ``valid_to`` is the next version's
    ``valid_from`` (NULL for the open version) — the standard
    half-open ``[valid_from, valid_to)`` convention.

    Determinism: ``(keys, ts_col, *order_cols)`` must totally order
    each key's observations — pass a tiebreaker (e.g. the source's
    sequence/primary key) whenever two changes can share a timestamp.
    ``extra_cols`` ride along from the version-opening observation
    (untracked payload: lineage ids, source offsets).

    Plan: ONE hash exchange on the key; the lag (change detection) and
    the lead (validity splice) share its sort order.
    """
    ks = _keylist(keys)
    attrs = list(attr_cols)
    order = [F.col(ts_col)] + [F.col(c) for c in order_cols]
    w = Window.partitionBy(*ks).orderBy(*order)

    is_change = F.lag(F.col(ts_col)).over(w).isNull() | _any_attr_changed(
        attrs, w
    )
    changes = df.withColumn("__chg", is_change).where(F.col("__chg"))
    # same partition keys and a sort-prefix-compatible order: Catalyst
    # plans the lead on the exchange the lag already paid for
    w2 = Window.partitionBy(*ks).orderBy(*order)
    valid_to = F.lead(F.col(ts_col)).over(w2)
    return changes.select(
        *ks,
        *attrs,
        *extra_cols,
        F.col(ts_col).alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


def _bucket(ks: list[str], n_buckets: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(k) for k in ks]), F.lit(int(n_buckets))).cast(
        "int"
    )


def _validate_batch(batch: DataFrame, ks: list[str], ts_col: str) -> None:
    any_null = functools.reduce(
        lambda a, b: a | b,
        [F.col(k).isNull() for k in ks] + [F.col(ts_col).isNull()],
    )
    if batch.where(any_null).limit(1).collect():
        raise ValueError(
            f"batch contains NULL in key column(s) {ks} or in '{ts_col}'; "
            "NULL keys can never match their history and a NULL "
            "timestamp has no position in a validity chain — fill or "
            "drop such rows first"
        )


def scd2_merge(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    keys: str | Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str,
    order_cols: Sequence[str] = (),
    n_buckets: int = 64,
) -> dict:
    """Fold a batch of observations into the SCD2 table at ``path``.

    The batch may carry MANY observations per key (a day's change log):
    it is first collapsed with :func:`scd2_from_changes`, then spliced
    onto each key's current row — a leading batch version whose
    attributes equal the current row is a continuation (no new
    version; the current row closes at the batch's NEXT change, if
    any), a differing one closes the current row at its
    ``valid_from``. Unknown keys insert their whole mini-chain.

    Out-of-order input is rejected: an observation at or before an
    affected key's current ``valid_from`` would need history rewriting
    (rebuild with :func:`scd2_from_changes` instead).

    Returns ``{"new_keys", "changed", "unchanged", "closed",
    "buckets_rewritten"}``. See the module docstring for layout, cost,
    and crash contract.
    """
    from eel_spark.sources.hdfs import HdfsOps

    ks = _keylist(keys)
    attrs = list(attr_cols)
    ops = HdfsOps(spark)
    out_cols = [*ks, *attrs, "valid_from", "valid_to", "is_current"]

    _validate_batch(batch, ks, ts_col)
    chains = scd2_from_changes(batch, ks, attrs, ts_col, order_cols).persist()
    try:
        if not ops.exists(path):
            n = chains.count()  # materializes the pin
            new_keys = chains.select(*ks).distinct().count()
            _write_generation(chains, ks, path, n_buckets, first=True)
            return {
                "new_keys": new_keys,
                "changed": 0,
                "unchanged": 0,
                "closed": n - new_keys,
                "buckets_rewritten": -1,
            }

        touched = [
            r["__b"]
            for r in chains.select(
                _bucket(ks, n_buckets).alias("__b")
            )
            .distinct()
            .collect()
        ]
        cur = (
            spark.read.parquet(path)
            .where(
                (F.col(CURRENT_COL) == 1)
                & F.col(BUCKET_COL).isin([int(t) for t in touched])
            )
            .drop(CURRENT_COL, BUCKET_COL)
            .persist()
        )
        try:
            return _merge_pinned(
                spark, path, chains, cur, ks, attrs, out_cols, touched, n_buckets
            )
        finally:
            cur.unpersist()
    finally:
        chains.unpersist()


def _merge_pinned(
    spark: SparkSession,
    path: str,
    chains: DataFrame,
    cur: DataFrame,
    ks: list[str],
    attrs: list[str],
    out_cols: list[str],
    touched: list,
    n_buckets: int,
) -> dict:
    from eel_spark.sources.hdfs import HdfsOps

    # ---- classify batch keys against their current row -------------------
    first = F.row_number().over(
        Window.partitionBy(*ks).orderBy(F.col("valid_from"))
    )
    b = chains.withColumn("__rn", first)
    cur_k = cur.select(
        *ks,
        *[F.col(a).alias(f"__cur_{a}") for a in attrs],
        F.col("valid_from").alias("__cur_from"),
    )
    # every batch version row, annotated with the key's current state
    ann = b.join(cur_k, on=ks, how="left")

    late = ann.where(
        F.col("__cur_from").isNotNull()
        & (F.col("valid_from") <= F.col("__cur_from"))
    )
    bad = late.select(*ks, "valid_from", "__cur_from").limit(1).collect()
    if bad:
        raise ValueError(
            "out-of-order batch: observation at "
            f"{dict(bad[0].asDict())} is not after the key's current "
            "valid_from; SCD2 merge only extends history forward — "
            "rebuild the dimension from the full change log for "
            "retroactive corrections"
        )

    same_as_cur = functools.reduce(
        lambda x, y: x & y,
        [F.col(a).eqNullSafe(F.col(f"__cur_{a}")) for a in attrs],
    )
    is_known = F.col("__cur_from").isNotNull()
    # a leading batch version equal to the current row is a continuation,
    # not a change — drop it; later versions always materialize
    keep = ~(is_known & (F.col("__rn") == 1) & same_as_cur)
    kept = ann.where(keep)

    # per key: does any version materialize, and when does the first one
    # start (that's when the current row closes)?
    key_stats = (
        ann.groupBy(*ks)
        .agg(
            F.min(F.when(keep, F.col("valid_from"))).alias("__close_at"),
            F.max(F.when(is_known, 1).otherwise(0)).alias("__known"),
            F.max(
                F.when((F.col("__rn") == 1) & ~same_as_cur, 1).otherwise(0)
            ).alias("__lead_change"),
        )
        .persist()
    )
    try:
        n_new = key_stats.where(F.col("__known") == 0).count()
        n_changed = key_stats.where(
            (F.col("__known") == 1) & F.col("__close_at").isNotNull()
        ).count()
        n_unchanged = key_stats.where(
            (F.col("__known") == 1) & F.col("__close_at").isNull()
        ).count()

        # old current rows that now close (any materializing version)
        closing = key_stats.where(F.col("__close_at").isNotNull()).select(
            *ks, "__close_at"
        )
        closed_cur = (
            cur.join(closing, on=ks, how="inner")
            .withColumn("valid_to", F.col("__close_at"))
            .withColumn("is_current", F.lit(False))
            .select(*out_cols)
        )
        new_versions = kept.select(*out_cols)
        new_closed = new_versions.where(~F.col("is_current"))
        new_current = new_versions.where(F.col("is_current"))
        n_closed_total = closed_cur.count() + new_closed.count()

        # surviving current rows in the touched buckets: keys the batch
        # didn't change (including unknown-to-batch keys sharing a bucket)
        survivors = cur.join(closing.select(*ks), on=ks, how="left_anti")

        # ---- write: append closed history FIRST (never lost), then
        # dynamically overwrite only the touched current buckets --------
        _write_generation(
            closed_cur.unionByName(new_closed), ks, path, n_buckets,
            append=True,
        )
        _write_generation(
            survivors.select(*out_cols).unionByName(new_current),
            ks, path, n_buckets, dynamic=True,
        )
        return {
            "new_keys": n_new,
            "changed": n_changed,
            "unchanged": n_unchanged,
            "closed": n_closed_total,
            "buckets_rewritten": len(touched),
        }
    finally:
        key_stats.unpersist()


def _write_generation(
    df: DataFrame,
    ks: list[str],
    path: str,
    n_buckets: int,
    first: bool = False,
    append: bool = False,
    dynamic: bool = False,
) -> None:
    out = df.withColumn(
        CURRENT_COL, F.col("is_current").cast("int")
    ).withColumn(BUCKET_COL, _bucket(ks, n_buckets))
    w = out.write.partitionBy(CURRENT_COL, BUCKET_COL)
    if append:
        w.mode("append").parquet(path)
    elif dynamic:
        # per-writer option, never the session conf (shared-session race)
        (
            w.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(path)
        )
    else:
        w.mode("overwrite" if first else "errorifexists").parquet(path)


def read_scd2_current(spark: SparkSession, path: str) -> DataFrame:
    """Current dimension state — prunes to the ``scd_current=1``
    partitions; closed history files are never listed into the scan."""
    return (
        spark.read.parquet(path)
        .where(F.col(CURRENT_COL) == 1)
        .drop(CURRENT_COL, BUCKET_COL)
    )


def read_scd2_asof(spark: SparkSession, path: str, ts) -> DataFrame:
    """Dimension state as of ``ts``: the version row (per key) whose
    ``[valid_from, valid_to)`` interval contains it. Scans both open and
    closed partitions (validity is not a partition axis — as-of reads
    are the archaeology path, not the hot path)."""
    t = F.lit(ts)
    return (
        spark.read.parquet(path)
        .where(
            (F.col("valid_from") <= t)
            & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
        )
        .drop(CURRENT_COL, BUCKET_COL)
    )
