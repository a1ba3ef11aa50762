"""Corpus datasheet generator."""

from __future__ import annotations

import json

from eel_spark.operators.datasheet import corpus_datasheet


def test_datasheet_counts_and_dup_rate(spark):
    doc = "the growth of open data has changed how teams plan their work and share results"
    rows = (
        [(i, doc, "en", "a") for i in range(8)]            # 8 verbatim dups
        + [(100 + i, f"unique text number {i} with several words", "en", "b") for i in range(8)]
        + [(200, None, "de", "b"), (201, "   ", "de", "b")]
    )
    df = spark.createDataFrame(rows, "id LONG, text STRING, lang STRING, source STRING")
    card = corpus_datasheet(df, "text", group_cols=("lang", "source"))

    assert card["docs"] == 18
    assert card["null_docs"] == 1 and card["blank_docs"] == 2  # null counts as blank too
    # 8 identical docs + 8 unique + blank+null hash -> ~10 distinct of 18
    assert 0.3 <= card["approx_exact_dup_rate"] <= 0.5
    assert card["tokens"] > 0 and card["chars"] > 0
    assert card["tokens_per_doc"]["p50"] is not None
    assert 0.0 <= card["gopher_pass_rate"] <= 1.0

    comp = card["composition"]
    assert comp["n_groups"] == 3
    assert comp["top"][0]["group"] == {"lang": "en", "source": "a"}
    assert comp["top"][0]["docs"] == 8
    assert abs(sum(g["fraction"] for g in comp["top"]) - 1.0) < 1e-9

    json.dumps(card)  # the card must be directly serializable


def test_datasheet_empty_corpus(spark):
    df = spark.createDataFrame([], "id LONG, text STRING, lang STRING")
    card = corpus_datasheet(df, "text", group_cols=("lang",))
    assert card["docs"] == 0
    assert card["approx_exact_dup_rate"] == 0.0
    assert card["composition"]["n_groups"] == 0


def test_datasheet_top_groups_cap(spark):
    rows = [(i, f"text {i} words here", f"g{i % 20}") for i in range(200)]
    df = spark.createDataFrame(rows, "id LONG, text STRING, src STRING")
    card = corpus_datasheet(df, "text", group_cols=("src",), top_groups=5)
    assert card["composition"]["n_groups"] == 20
    assert len(card["composition"]["top"]) == 5
