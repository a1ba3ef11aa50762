"""Skew helpers: salted join / two-phase aggregation must be value-exact
vs their unsalted equivalents on a deliberately skewed dataset."""

from __future__ import annotations

from pyspark.sql import functions as F

from eel_spark.scale import salted_aggregate, salted_join

SF = "/root/testdata/sf0.001"


def _skewed(spark):
    # 90% of rows share key 1 — the classic hot-key shape
    rows = [(1, i) for i in range(900)] + [(k, k * 10) for k in range(2, 102)]
    return spark.createDataFrame(rows, "k INT, v INT")


def test_salted_join_matches_plain_join(spark):
    big = _skewed(spark)
    dim = spark.createDataFrame([(k, f"name_{k}") for k in range(1, 102)], "k INT, name STRING")
    plain = big.join(dim, "k").select("k", "v", "name")
    salted = salted_join(big, dim, "k", salt=4).select("k", "v", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_left_join_preserves_unmatched(spark):
    big = _skewed(spark)
    dim = spark.createDataFrame([(1, "one")], "k INT, name STRING")
    out = salted_join(big, dim, "k", how="left", salt=4)
    assert out.count() == big.count()
    assert out.filter("name IS NULL").count() == 100


def test_salted_aggregate_exact(spark):
    df = _skewed(spark)
    got = salted_aggregate(
        df, ["k"],
        {
            "n": ("sum", F.count(F.lit(1))),
            "total": ("sum", F.sum("v")),
            "mx": ("max", F.max("v")),
        },
        salt=4,
    )
    want = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"), F.max("v").alias("mx")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


# --- Z-order layout ---------------------------------------------------------


def test_zorder_key_interleaves_bits(spark):
    from eel_spark.scale import zorder_key

    # bits=2, two columns, ranges [0,3]: scaled values ARE the inputs
    df = spark.createDataFrame(
        [(0, 0), (3, 0), (0, 3), (3, 3), (1, 2)], "x INT, y INT"
    )
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn(
            "z", zorder_key({"x": (0, 3), "y": (0, 3)}, bits=2)
        ).collect()
    }

    def morton(x, y):
        z = 0
        for b in range(2):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    for (x, y), z in got.items():
        assert z == morton(x, y), (x, y, z)


def test_zorder_layout_tightens_stats_on_both_dims(spark, tmp_path):
    """The point of Z-order: per-file min/max ranges stay SMALL on every
    keyed dimension, so footer-stats pruning works for filters on either.
    A linear sort on x gives tight x ranges but full-span y ranges —
    z-order must beat it on the worst dimension."""
    from eel_spark.scale import write_zordered

    n = 4096
    df = spark.range(n).select(
        (F.pmod(F.xxhash64("id"), 1000)).alias("x"),
        (F.pmod(F.xxhash64(F.col("id") + 1), 1000)).alias("y"),
    )
    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    write_zordered(df, zpath, by=["x", "y"], n_files=16)
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(lpath)

    def worst_avg_range(path):
        d = spark.read.parquet(path).withColumn("f", F.input_file_name())
        per_file = d.groupBy("f").agg(
            (F.max("x") - F.min("x")).alias("rx"),
            (F.max("y") - F.min("y")).alias("ry"),
        )
        row = per_file.agg(F.avg("rx").alias("ax"), F.avg("ry").alias("ay")).first()
        return max(row["ax"], row["ay"])

    z_worst, l_worst = worst_avg_range(zpath), worst_avg_range(lpath)
    # 16 files over 2 dims ≈ a 4x4 grid: each dim's span should shrink
    # well below the global 1000 — and far below linear-sort's untouched y
    assert z_worst < 0.6 * l_worst, (z_worst, l_worst)
    assert z_worst < 600, z_worst


def test_key_skew_report(spark):
    from eel_spark.scale import key_skew_report

    rows = [(0, "hot") for _ in range(900)] + [(i, f"k{i}") for i in range(1, 101)]
    df = spark.createDataFrame([(k,) for _, k in rows], "k STRING")
    rep = key_skew_report(df, "k", top=3)
    assert rep["rows"] == 1000 and rep["distinct_keys"] == 101
    assert rep["max_count"] == 900
    assert rep["top_keys"][0]["key"] == {"k": "hot"}
    assert abs(rep["top_keys"][0]["fraction"] - 0.9) < 1e-9
    assert rep["skew_factor"] > 80  # 900 / (1000/101) ~ 90.9
    assert len(rep["top_keys"]) == 3


def test_key_skew_report_multi_key_uniform(spark):
    from eel_spark.scale import key_skew_report

    df = spark.range(100).select(
        (F.col("id") % 10).alias("a"), (F.col("id") % 5).alias("b")
    )
    rep = key_skew_report(df, ["a", "b"], top=2)
    assert rep["distinct_keys"] == 10  # (a, b) pairs: lcm structure
    assert rep["skew_factor"] == 1.0   # perfectly uniform
    assert set(rep["top_keys"][0]["key"]) == {"a", "b"}


def test_write_sized_files_sink_path_honors_target(spark, tmp_path):
    """The corpus-prep sink path (examples/corpus_prep.py step 10): a
    prepared corpus routed through write_sized_files must land with the
    returned file count AND per-file bytes bounded relative to the
    target — the writer's promise is size-targeted shards, not just 'a'
    repartition."""
    import glob
    import os

    from eel_spark.operators import dedup
    from eel_spark.scale import write_sized_files

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    prepared = dedup.dedup_exact(docs, "text", "doc_id")

    out = str(tmp_path / "train")
    target_mb = 0.02  # tiny target so the sf0.001 corpus needs >1 file
    n = write_sized_files(prepared, out, target_mb=target_mb, compression_ratio=1.0)
    files = glob.glob(f"{out}/part-*")
    assert len(files) == n > 1
    sizes = [os.path.getsize(f) for f in files]
    # round-robin balancing: no shard more than ~3x the target's on-disk
    # bytes (compression_ratio=1 → estimate bytes ≈ target bytes), none
    # degenerate-empty
    assert max(sizes) <= 3 * target_mb * 1024 * 1024, sizes
    assert min(sizes) > 0
    # content intact through the sink
    assert (
        sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
        == sorted(r["doc_id"] for r in prepared.collect())
    )


def test_write_sized_files(spark, tmp_path):
    import glob

    from eel_spark.scale import write_sized_files

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    one = str(tmp_path / "one")
    n1 = write_sized_files(docs, one, target_mb=512)
    assert n1 == 1
    assert len(glob.glob(f"{one}/part-*")) == 1

    many = str(tmp_path / "many")
    nm = write_sized_files(docs, many, target_mb=0.005, compression_ratio=1.0)
    assert nm > 1
    assert len(glob.glob(f"{many}/part-*")) == nm
    # identical content either way
    a = sorted(r["doc_id"] for r in spark.read.parquet(one).collect())
    b = sorted(r["doc_id"] for r in spark.read.parquet(many).collect())
    assert a == b

    import pytest as _pytest

    with _pytest.raises(ValueError):
        write_sized_files(docs, str(tmp_path / "x"), target_mb=0)
