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


def test_merges_txt_public_format_roundtrip_and_parity(spark, tmp_path):
    """Public merges.txt interop (subword-nmt / GPT-2 vocab.bpe shape):
    a HAND-WRITTEN file in the released format loads with rank = line
    order; encoding under it reproduces the canonical paper example's
    segmentation; and both persistence formats round-trip to the same
    merge list (so a store can migrate either way)."""
    from eel_spark.operators.bpe import load_merges_txt, save_merges_txt

    # hand-written, as a released tokenizer ships it: version header,
    # blank line, the canonical Sennrich merges in order
    p = tmp_path / "vocab.bpe"
    p.write_text(
        "#version: 0.2\n"
        "\n"
        "e s\n"
        "es t\n"
        f"est {EOW}\n"
        "l o\n"
        "lo w\n",
        encoding="utf-8",
    )
    merges = load_merges_txt(str(p))
    assert merges == [
        ("e", "s"), ("es", "t"), ("est", EOW), ("l", "o"), ("lo", "w"),
    ]
    # encode parity: the paper's words segment exactly as the learned
    # merges dictate ("lowest" shares the 'low' stem and the 'est</w>'
    # suffix; "widest" only the suffix)
    df = spark.createDataFrame([("lowest widest",)], ["text"])
    toks = df.select(bpe_encode("text", merges).alias("t")).first()["t"]
    assert toks == ["low", "est</w>", "w", "i", "d", "est</w>"]

    # round-trip BOTH formats: txt -> txt and txt -> parquet -> txt
    out_txt = tmp_path / "out.bpe"
    save_merges_txt(merges, str(out_txt))
    assert load_merges_txt(str(out_txt)) == merges
    assert out_txt.read_text().startswith("#version")
    pq = str(tmp_path / "merges_pq")
    save_merges(spark, merges, pq)
    assert load_merges(spark, pq) == merges
    save_merges_txt(load_merges(spark, pq), str(tmp_path / "again.bpe"))
    assert load_merges_txt(str(tmp_path / "again.bpe")) == merges

    # malformed lines fail loudly with the line number
    bad = tmp_path / "bad.bpe"
    bad.write_text("e s\nthree part line\n", encoding="utf-8")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bad.bpe:2"):
        load_merges_txt(str(bad))
    # unrepresentable symbols are refused, not corrupted
    with _pytest.raises(ValueError, match="save_merges"):
        save_merges_txt([("a b", "c")], str(tmp_path / "x.bpe"))


def test_merges_txt_hash_symbols_crlf_and_header_scope(tmp_path):
    """r13 review regressions: '#' is a legitimate merge SYMBOL (the
    pre-tokenizer emits punctuation runs) — only a FIRST-line #version
    header is skipped; CRLF files must not load right symbols with an
    invisible trailing CR."""
    from eel_spark.operators.bpe import load_merges_txt, save_merges_txt

    # '#'-leading merge survives a save -> load round-trip
    merges = [("#", EOW), ("e", "s")]
    p = tmp_path / "hash.bpe"
    save_merges_txt(merges, str(p))
    assert load_merges_txt(str(p)) == merges
    # a '#'-leading line past line 1 is a merge, not a comment
    p2 = tmp_path / "nohdr.bpe"
    p2.write_text("e s\n# </w>\n", encoding="utf-8")
    assert load_merges_txt(str(p2)) == [("e", "s"), ("#", EOW)]
    # CRLF endings load clean (no trailing \r on the right symbol)
    p3 = tmp_path / "crlf.bpe"
    p3.write_bytes(b"#version: 0.2\r\ne s\r\nes t\r\n")
    assert load_merges_txt(str(p3)) == [("e", "s"), ("es", "t")]


def test_merges_txt_bom_and_blank_before_header(tmp_path):
    """r13 review (second pass): a UTF-8 BOM or a leading blank line
    must not turn the #version header into a rank-0 merge (which would
    silently shift every downstream rank)."""
    from eel_spark.operators.bpe import load_merges_txt

    bom = tmp_path / "bom.bpe"
    bom.write_bytes("﻿#version: 0.2\ne s\n".encode("utf-8"))
    assert load_merges_txt(str(bom)) == [("e", "s")]
    blank = tmp_path / "blank.bpe"
    blank.write_text("\n#version: 0.2\ne s\n", encoding="utf-8")
    assert load_merges_txt(str(blank)) == [("e", "s")]
