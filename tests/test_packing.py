"""Sequence packing (operators/packing.py): capacity invariant, oversize
handling, determinism, and fill quality."""

from __future__ import annotations

from pyspark.sql import functions as F

from eel_spark.operators.packing import pack_sequences, packing_stats


def _docs(spark, sizes):
    return spark.createDataFrame(
        [(i, s, f"doc {i}") for i, s in enumerate(sizes)],
        "doc_id: long, n_tokens: long, text: string",
    )


def test_pack_capacity_invariant(spark):
    import random

    random.seed(11)
    sizes = [random.randrange(50, 1500) for _ in range(300)]
    df = _docs(spark, sizes)
    packed = pack_sequences(df, "doc_id", "n_tokens", 4096, n_shards=4)
    assert packed.count() == 300  # nothing lost
    over_cap = (
        packed.filter(~F.col("pack_oversize"))
        .groupBy("pack_shard", "pack_bin")
        .agg(F.sum("n_tokens").alias("fill"))
        .filter(F.col("fill") > 4096)
        .count()
    )
    assert over_cap == 0
    # every doc in exactly one bin
    assert (
        packed.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0
    )


def test_pack_oversize_flagged_alone(spark):
    df = _docs(spark, [100, 5000, 200, 9000])
    packed = pack_sequences(df, "doc_id", "n_tokens", 4096, n_shards=1)
    rows = {r["doc_id"]: r for r in packed.collect()}
    assert rows[1]["pack_oversize"] and rows[3]["pack_oversize"]
    assert not rows[0]["pack_oversize"] and not rows[2]["pack_oversize"]
    # oversize docs are alone in their bins
    bins = {}
    for r in rows.values():
        bins.setdefault((r["pack_shard"], r["pack_bin"]), []).append(r["doc_id"])
    for (s, b), members in bins.items():
        if any(rows[m]["pack_oversize"] for m in members):
            assert len(members) == 1


def test_pack_deterministic_across_layout(spark):
    sizes = [100 * (i % 13 + 1) for i in range(200)]
    df = _docs(spark, sizes)
    a = sorted(
        (r["doc_id"], r["pack_shard"], r["pack_bin"])
        for r in pack_sequences(df, "doc_id", "n_tokens", 2048, n_shards=8).collect()
    )
    b = sorted(
        (r["doc_id"], r["pack_shard"], r["pack_bin"])
        for r in pack_sequences(
            df.repartition(23), "doc_id", "n_tokens", 2048, n_shards=8
        ).collect()
    )
    assert a == b


def test_pack_fill_quality_and_stats(spark):
    # sizes drawn so perfect packing is possible: pairs summing to cap
    sizes = [3000, 1096] * 40 + [2048] * 20
    df = _docs(spark, sizes)
    packed = pack_sequences(df, "doc_id", "n_tokens", 4096, n_shards=1)
    stats = packing_stats(packed, "n_tokens", 4096).collect()[0]
    # best-fit-decreasing on this distribution stays well above 90% fill
    assert stats["fill_factor"] >= 0.90, stats
    assert stats["max_bin_tokens"] <= 4096
    assert stats["total_tokens"] == sum(sizes)


def test_chunk_documents_cover_and_overlap(spark):
    from eel_spark.operators.packing import chunk_documents

    text25 = " ".join(f"w{i}" for i in range(25))
    text10 = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, text25), (2, text10), (3, "short doc")],
        "doc_id: long, text: string",
    )
    # no overlap: exact partition of the token stream
    out = chunk_documents(df, "text", "doc_id", chunk_tokens=10)
    rows = {(r["doc_id"], r["chunk_index"]): (r["n_tokens"], r["text"])
            for r in out.collect()}
    assert rows[(1, 0)] == (10, " ".join(f"w{i}" for i in range(10)))
    assert rows[(1, 1)] == (10, " ".join(f"w{i}" for i in range(10, 20)))
    assert rows[(1, 2)] == (5, " ".join(f"w{i}" for i in range(20, 25)))
    assert rows[(2, 0)] == (10, text10)          # exactly one chunk
    assert rows[(3, 0)] == (2, "short doc")
    assert len(rows) == 5
    # reassembling the no-overlap chunks restores the token stream
    joined = " ".join(rows[(1, i)][1] for i in range(3))
    assert joined == text25

    # overlap: consecutive chunks share exactly overlap_tokens
    ov = chunk_documents(df.filter("doc_id = 1"), "text", "doc_id",
                         chunk_tokens=10, overlap_tokens=3)
    chunks = [r["text"].split() for r in ov.orderBy("chunk_index").collect()]
    for a, b in zip(chunks, chunks[1:]):
        assert a[-3:] == b[:3]
    # every token appears; no chunk exceeds the cap; tail chunks that add
    # nothing new are suppressed
    assert set(text25.split()) == {t for c in chunks for t in c}
    assert all(len(c) <= 10 for c in chunks)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, "text", "doc_id", chunk_tokens=5, overlap_tokens=5)


def test_chunk_documents_degenerate_text(spark):
    """NULL and blank docs must not vanish (or sprout phantom tokens):
    each yields exactly one chunk with n_tokens=0 and empty text."""
    from eel_spark.operators.packing import chunk_documents

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "real tokens here")],
        "doc_id: long, text: string",
    )
    out = {r["doc_id"]: (r["chunk_index"], r["n_tokens"], r["text"])
           for r in chunk_documents(df, "text", "doc_id", chunk_tokens=8).collect()}
    assert out[1] == (0, 0, "")
    assert out[2] == (0, 0, "")
    assert out[3] == (0, 0, "")
    assert out[4] == (0, 3, "real tokens here")
    assert len(out) == 4
