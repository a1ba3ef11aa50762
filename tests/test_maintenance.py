"""Unified store maintenance (operators/maintenance.py): one report
shape across all five incremental store families, and threshold-
triggered compaction through each store's own compactor."""

from __future__ import annotations

from datetime import date, datetime

import pytest
from pyspark.sql import functions as F

from eel_spark.operators.maintenance import (
    detect_store_type,
    maintain,
    store_maintenance_report,
)

REPORT_COLS = [
    "path",
    "store_type",
    "n_batches",
    "has_compacted_generation",
    "n_files",
    "n_bytes",
    "n_dirs",
    "max_files_per_leaf",
    "last_compaction_ms",
]


def _report_row(spark, path, **kw):
    df = store_maintenance_report(spark, path, **kw)
    assert df.columns == REPORT_COLS  # the ONE shape, in order
    return df.first().asDict()


def _docs(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"token{i} " * 12) for i in range(lo, hi)],
        "doc_id long, text string",
    )


def test_bm25_store_report_and_maintain(spark, tmp_path):
    from eel_spark.operators.retrieval import append_bm25_stats_batch

    path = str(tmp_path / "bm25")
    for b in range(3):
        append_bm25_stats_batch(path, _docs(spark, b * 5, b * 5 + 5), "text",
                                src_batch=b)
    assert detect_store_type(spark, path) == "bm25_stats"
    row = _report_row(spark, path)
    assert row["store_type"] == "bm25_stats"
    assert row["n_batches"] == 3
    assert row["has_compacted_generation"] is False
    assert row["n_files"] > 0 and row["n_bytes"] > 0
    # under threshold: no action
    res = maintain(spark, path, max_batches=8)
    assert res["action"] == "none"
    assert _report_row(spark, path)["n_batches"] == 3
    # over threshold: the store's own compactor runs
    res = maintain(spark, path, max_batches=2)
    assert res["action"] == "compacted"
    after = res["after"]
    assert after["n_batches"] == 0
    assert after["has_compacted_generation"] is True
    assert after["last_compaction_ms"] is not None
    assert after["n_files"] < row["n_files"]
    # idempotent policy: compacted store no longer trips the threshold
    assert maintain(spark, path, max_batches=2)["action"] == "none"


def test_ivf_store_report_and_maintain(spark, tmp_path):
    from eel_spark.operators.similarity import (
        append_ivf_batch,
        init_ivf_index,
        ivf_topk_against_index,
        train_centroids,
    )

    emb = spark.createDataFrame(
        [
            (i, [float(i % 3), float(i % 5), float(i % 7), 1.0])
            for i in range(30)
        ],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "ivf")
    init_ivf_index(path, train_centroids(emb, n_cells=2, iterations=1))
    for b in range(3):
        append_ivf_batch(
            path, emb.where(F.col("vec_id") % 3 == b), src_batch=b
        )
    assert detect_store_type(spark, path) == "ivf_index"
    row = _report_row(spark, path)
    assert row["store_type"] == "ivf_index" and row["n_batches"] == 3
    res = maintain(spark, path, max_batches=2)
    assert res["action"] == "compacted"
    assert res["after"]["n_batches"] == 0
    assert res["after"]["has_compacted_generation"] is True
    # the index still serves after maintenance
    q = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0, 1.0])], "query_id long, embedding array<double>"
    )
    assert ivf_topk_against_index(spark, path, q, k=3, n_probe=2).count() == 3


def test_rollup_store_report_and_maintain(spark, tmp_path):
    from eel_spark.operators.rollups import append_rollup_batch, read_rollup

    events = spark.createDataFrame(
        [
            (i, datetime(2024, 1, 1 + i % 3, i % 24), float(i))
            for i in range(60)
        ],
        "user_id long, ts timestamp, value double",
    )
    aggs = {"n": F.count(F.lit(1)), "total": F.sum("value")}
    merges = {"n": F.sum("n"), "total": F.sum("total")}
    path = str(tmp_path / "roll")
    for b in range(3):
        append_rollup_batch(
            spark, path, events.where(F.col("user_id") % 3 == b), "ts",
            aggs, ["day"], src_batch=b,
        )
    assert detect_store_type(spark, path) == "rollup"
    row = _report_row(spark, path)
    assert row["store_type"] == "rollup" and row["n_batches"] == 3
    before = sorted(
        (str(r["bucket_start"]), r["n"], r["total"])
        for r in read_rollup(spark, path, merges).collect()
    )
    # the compactor needs the caller's merge semantics — refuse loudly
    with pytest.raises(ValueError, match="merges"):
        maintain(spark, path, max_batches=2)
    res = maintain(spark, path, max_batches=2, merges=merges)
    assert res["action"] == "compacted"
    assert res["after"]["n_batches"] == 0
    assert res["after"]["has_compacted_generation"] is True
    after = sorted(
        (str(r["bucket_start"]), r["n"], r["total"])
        for r in read_rollup(spark, path, merges).collect()
    )
    assert after == before  # content unchanged


def test_scd2_store_report_and_maintain(spark, tmp_path):
    from eel_spark.operators.scd2 import scd2_merge

    schema = "k long, seg string, d date, seq long"

    def log(rows):
        return spark.createDataFrame(rows, schema)

    path = str(tmp_path / "dim")
    # three merges closing versions of the same keys → several files
    # per closed bucket
    scd2_merge(spark, path, log([(1, "A", date(2024, 1, 1), 1),
                                 (3, "C", date(2024, 1, 2), 2)]),
               "k", ["seg"], "d", ["seq"], n_buckets=2)
    scd2_merge(spark, path, log([(1, "B", date(2024, 2, 1), 3),
                                 (3, "D", date(2024, 2, 2), 4)]),
               "k", ["seg"], "d", ["seq"], n_buckets=2)
    scd2_merge(spark, path, log([(1, "C", date(2024, 3, 1), 5)]),
               "k", ["seg"], "d", ["seq"], n_buckets=2)
    assert detect_store_type(spark, path) == "scd2"
    row = _report_row(spark, path)
    assert row["store_type"] == "scd2"
    assert row["n_batches"] is None  # no batch concept: files-per-bucket
    assert row["max_files_per_leaf"] >= 2
    res = maintain(spark, path, max_files_per_leaf=1)
    assert res["action"] == "compacted"
    assert res["after"]["max_files_per_leaf"] == 1
    assert maintain(spark, path, max_files_per_leaf=1)["action"] == "none"


def test_dedup_history_report_and_maintain(spark, tmp_path):
    from eel_spark.streaming import incremental_near_dedup_sink

    def doc(i):
        return " ".join(f"w{i}x{j}" for j in range(30))

    schema = "doc_id long, text string"
    in_dir = tmp_path / "m_in"
    in_dir.mkdir()
    surv_path = str(tmp_path / "m_surv")
    for w in range(4):
        rows = [(w * 10 + j, doc(w * 10 + j)) for j in range(3)]
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(in_dir / f"w{w}")
        )
    docs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "*"))
    )
    q = incremental_near_dedup_sink(
        docs, surv_path, str(tmp_path / "m_ck"), max_hamming=7, bands=8
    )
    q.awaitTermination(180)

    assert detect_store_type(spark, surv_path) == "dedup_history"
    row = _report_row(spark, surv_path)
    assert row["store_type"] == "dedup_history"
    assert row["n_batches"] == 4
    res = maintain(spark, surv_path, max_batches=2)
    assert res["action"] == "compacted"
    assert res["after"]["n_batches"] == 0
    assert res["after"]["has_compacted_generation"] is True
    survivors = spark.read.parquet(surv_path)
    assert survivors.count() == 12  # content preserved


def test_detect_store_type_rejects_unknown(spark, tmp_path):
    p = tmp_path / "junk"
    p.mkdir()
    (p / "whatever.txt").write_text("x")
    with pytest.raises(ValueError, match="no recognizable incremental"):
        detect_store_type(spark, str(p))


def test_reports_union_across_store_types(spark, tmp_path):
    """The point of ONE shape: a fleet of stores unions into a single
    dashboard table."""
    from eel_spark.operators.retrieval import append_bm25_stats_batch
    from eel_spark.operators.rollups import append_rollup_batch

    p1 = str(tmp_path / "u_bm25")
    append_bm25_stats_batch(p1, _docs(spark, 0, 5), "text", src_batch=0)
    p2 = str(tmp_path / "u_roll")
    events = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 3), 2.0)],
        "user_id long, ts timestamp, value double",
    )
    append_rollup_batch(spark, p2, events, "ts",
                        {"n": F.count(F.lit(1))}, ["day"], src_batch=0)
    fleet = store_maintenance_report(spark, p1).unionByName(
        store_maintenance_report(spark, p2)
    )
    rows = {r["store_type"]: r for r in fleet.collect()}
    assert set(rows) == {"bm25_stats", "rollup"}
    assert all(r["n_batches"] == 1 for r in rows.values())


def test_scd2_threshold_scopes_to_closed_subtree(spark, tmp_path):
    """r13 review: the depth lever must be what compact_scd2_history
    actually moves — the CLOSED subtree. A fragmented OPEN side
    (scd_current=1, the merge's to manage) must not trip the policy
    forever ('compacted' every run with nothing to compact)."""
    import shutil as _shutil

    from eel_spark.operators.scd2 import scd2_merge

    schema = "k long, seg string, d date, seq long"
    path = str(tmp_path / "dim2")
    scd2_merge(spark, path,
               spark.createDataFrame([(1, "A", date(2024, 1, 1), 1)], schema),
               "k", ["seg"], "d", ["seq"], n_buckets=2)
    scd2_merge(spark, path,
               spark.createDataFrame([(1, "B", date(2024, 2, 1), 2)], schema),
               "k", ["seg"], "d", ["seq"], n_buckets=2)
    # compact the closed side to 1 file per bucket, then fragment the
    # OPEN side by duplicating a current part file
    res = maintain(spark, path, max_files_per_leaf=1)
    assert res["after"]["max_files_per_leaf"] <= 1
    import glob as _glob

    cur = _glob.glob(f"{path}/scd_current=1/scd_bucket=*/part-*.parquet")
    assert cur
    _shutil.copy(cur[0], cur[0].replace("part-", "part-copy-"))
    row = _report_row(spark, path)
    assert row["max_files_per_leaf"] <= 1  # lever sees CLOSED buckets only
    assert maintain(spark, path, max_files_per_leaf=1)["action"] == "none"


def test_detect_rejects_merge_time_rollup_tables(spark, tmp_path):
    """r13 review: merge_time_rollup tables share the rollup LAYOUT but
    have no __src_batch column (already-merged finals, no compactor) —
    detection must refuse with the module's own error, not crash with
    an unresolved-column AnalysisException in the report."""
    from datetime import datetime as _dt

    from eel_spark.operators.rollups import merge_time_rollup

    events = spark.createDataFrame(
        [(1, _dt(2024, 1, 1, 3), 2.0)],
        "user_id long, ts timestamp, value double",
    )
    path = str(tmp_path / "final_rollup")
    merge_time_rollup(
        spark, path, events, "ts",
        {"n": F.count(F.lit(1))}, {"n": F.sum("n")}, ["day"],
    )
    with pytest.raises(ValueError, match="merge_time_rollup"):
        detect_store_type(spark, path)
    with pytest.raises(ValueError, match="merge_time_rollup"):
        store_maintenance_report(spark, path)
