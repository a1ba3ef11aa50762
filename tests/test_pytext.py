"""Python-path text kernels: NFKC normalization, compression ratio."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eel_spark.functions.pytext import (
    compression_ratio,
    normalize_unicode,
    strip_control_chars,
)


def _vals(spark, docs, col):
    df = spark.createDataFrame([(d,) for d in docs], "text STRING")
    return [r["v"] for r in df.select(col.alias("v")).collect()]


def test_nfkc_folds_compatibility_forms(spark):
    got = _vals(
        spark,
        ["ﬁle", "x²", "Ｈｅｌｌｏ", "½ cup", "café", "café"],
        normalize_unicode("text"),
    )
    assert got == ["file", "x2", "Hello", "1⁄2 cup", "café", "café"]


def test_strip_control_and_format_chars(spark):
    doc = "a​b­c﻿d\x07e\tf\ng"  # zwsp, soft hyphen, BOM, bell
    got = _vals(spark, [doc], normalize_unicode("text"))[0]
    assert got == "abcde\tf\ng"  # invisibles gone, tab/newline kept
    # Catalyst twin strips the same invisibles (no NFKC)
    jvm = _vals(spark, [doc], strip_control_chars("text"))[0]
    assert jvm == "abcde\tf\ng"


def test_normalize_idempotent_and_null(spark):
    docs = [None, "", "plain ascii text", "ﬁx​me"]
    once = _vals(spark, docs, normalize_unicode("text"))
    twice = _vals(
        spark, [d for d in once], normalize_unicode("text")
    )
    assert once == twice
    assert once[0] is None and once[1] == ""


def test_collapse_whitespace_option(spark):
    got = _vals(
        spark,
        ["  a \t b \n c  "],
        normalize_unicode("text", collapse_whitespace=True),
    )
    assert got == ["a b c"]


def test_bad_form_rejected():
    with pytest.raises(ValueError):
        normalize_unicode("text", form="NFX")


def test_compression_ratio_separates_repetition(spark):
    import random

    rng = random.Random(7)
    prose = (
        "the quarterly report shows steady growth across most regions "
        "with notable gains in the northern markets and a small decline "
        "in transport costs compared to the previous year. "
    ) * 6
    junk = "buy now click here " * 60
    noise = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789") for _ in range(1000))
    r = dict(
        zip(
            ["prose", "junk", "noise"],
            _vals(spark, [prose, junk, noise], compression_ratio("text")),
        )
    )
    assert r["junk"] < r["prose"] < r["noise"]
    assert r["junk"] < 0.1 and r["noise"] > 0.5


def test_compression_ratio_null_empty_and_level(spark):
    got = _vals(spark, [None, ""], compression_ratio("text"))
    assert got == [None, None]
    with pytest.raises(ValueError):
        compression_ratio("text", level=0)
