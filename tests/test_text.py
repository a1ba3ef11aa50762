"""Text-analysis functions: hand-computed expectations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eel_spark.functions import text as TX


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat and the dog sat in the garden"),          # en
        (1, "der hund und die katze ist nicht auf dem tisch"), # de
        (2, "el perro y el gato es una mascota con pelo"),     # es
        (3, "xyzzy plugh qwerty"),                             # und
        (4, "  spaced   out   text  "),
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_token_count(docs):
    out = {r["doc_id"]: r["n"] for r in docs.select("doc_id", TX.token_count("text").alias("n")).collect()}
    assert out[0] == 9
    assert out[3] == 3
    assert out[4] == 3  # empties filtered


def test_whitespace_ratio(docs):
    r = docs.filter("doc_id = 0").select(TX.whitespace_ratio("text").alias("w")).first()["w"]
    text = "the cat and the dog sat in the garden"
    assert r == text.count(" ") / len(text)


def test_lang_id(docs):
    out = {r["doc_id"]: r["lang"] for r in docs.select("doc_id", TX.lang_id("text").alias("lang")).collect()}
    assert out[0] == "en"
    assert out[1] == "de"
    assert out[2] == "es"
    assert out[3] == "und"


def test_normalized_text(spark):
    df = spark.createDataFrame([("  A   B\tC  ",)], "t: string")
    assert df.select(TX.normalized_text("t").alias("n")).first()["n"] == "a b c"


def test_fingerprint_matches_dup(spark):
    df = spark.createDataFrame([("abc def",), ("ABC   DEF",), ("other",)], "t: string")
    fps = [r["f"] for r in df.select(TX.fingerprint(TX.normalized_text("t")).alias("f")).collect()]
    assert fps[0] == fps[1] != fps[2]
    assert len(fps[0]) == 16


def test_quality_score_range(spark):
    df = spark.createDataFrame(
        [("the cat sat on the mat and the dog sat on the rug today",), ("x",)],
        "t: string",
    )
    scores = [r["q"] for r in df.select(
        TX.quality_score("t", TX.LANG_MARKERS["en"]).alias("q")
    ).collect()]
    assert 0.0 <= scores[1] < scores[0] <= 1.0


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([("abcd efghij x",)], "t: string")
    # ceil(4/4)+ceil(6/4)+ceil(1/4) = 1+2+1 = 4
    assert df.select(TX.bpe_ish_token_count("t").alias("n")).first()["n"] == 4
