"""BPE tokenizer: driver merge loop, distributed stats, Arrow encode."""

from __future__ import annotations

from pyspark.sql import functions as F

from eel_spark.operators.bpe import (
    EOW,
    _learn_merges,
    bpe_encode,
    bpe_token_count,
    decode_tokens,
    load_merges,
    save_merges,
    train_bpe,
    word_frequencies,
)


def test_canonical_sennrich_example():
    # the worked example from the BPE paper: merge order is forced by
    # the counts ((e,s)=(s,t)=(t,</w>)=9 with smallest-pair ties, then
    # the low/lower stem at 7)
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = _learn_merges(freqs, num_merges=5, min_frequency=2)
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("est", EOW),
        ("l", "o"),
        ("lo", "w"),
    ]


def test_min_frequency_stops_training():
    freqs = {"ab": 1, "cd": 1}
    assert _learn_merges(freqs, num_merges=10, min_frequency=2) == []


def test_word_frequencies_distributed(spark):
    df = spark.createDataFrame(
        [("the cat sat on the mat",), ("The cat, the hat!",)], ["text"]
    )
    rows = {
        r["word"]: r["freq"]
        for r in word_frequencies(df, "text", max_word_types=100).collect()
    }
    assert rows["the"] == 4  # lowercased across rows
    assert rows["cat"] == 2
    assert rows[","] == 1  # punctuation is its own pre-token
    assert rows["!"] == 1


def test_train_encode_roundtrip(spark):
    sentences = [
        ("the quick brown fox jumps over the lazy dog",),
        ("the lazy dog sleeps while the quick fox runs",),
    ] * 20
    df = spark.createDataFrame(sentences, ["text"])
    merges = train_bpe(df, "text", num_merges=200, min_frequency=2)
    assert merges  # something merged
    # determinism: identical corpus -> identical merge table
    assert merges == train_bpe(df, "text", num_merges=200, min_frequency=2)

    out = df.limit(2).select(
        "text",
        bpe_encode("text", merges).alias("toks"),
        bpe_token_count("text", merges).alias("n"),
    )
    out = out.withColumn("decoded", decode_tokens("toks")).collect()
    for r in out:
        # decode inverts encode up to the pre-tokenizer whitespace model
        assert r["decoded"] == r["text"].lower()
        assert r["n"] == len(r["toks"])
        # every word yields >= 1 token; frequent words collapse to ONE
        assert r["n"] >= 1
    # 'the' appears 60+ times -> must be a single learned token
    one = spark.createDataFrame([("the",)], ["text"]).select(
        bpe_token_count("text", merges).alias("n")
    ).collect()[0]["n"]
    assert one == 1


def test_encode_null_and_empty(spark):
    df = spark.createDataFrame([(None,), ("",), ("   ",)], "text STRING")
    rows = df.select(
        bpe_encode("text", [("a", "b")]).alias("t"),
        bpe_token_count("text", [("a", "b")]).alias("n"),
    ).collect()
    for r in rows:
        assert r["t"] == [] and r["n"] == 0


def test_no_merges_encodes_chars(spark):
    df = spark.createDataFrame([("ab",)], ["text"])
    toks = df.select(bpe_encode("text", []).alias("t")).collect()[0]["t"]
    assert toks == ["a", "b", EOW]


def test_save_load_merges(spark, tmp_path):
    merges = [("e", "s"), ("es", "t"), ("est", EOW)]
    p = str(tmp_path / "merges")
    save_merges(spark, merges, p)
    assert load_merges(spark, p) == merges
