"""Trained n-gram language ID (Cavnar-Trenkle profiles)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eel_spark.operators.langid import lang_id_trained, train_lang_profiles

SF = "/root/testdata/sf0.001"


def test_profiles_shape(spark):
    df = spark.createDataFrame(
        [("aaa bbb aaa", "x"), ("zzz yyy zzz", "y")], "text STRING, lang STRING"
    )
    p = train_lang_profiles(df, "text", "lang", n=3, top_k=5)
    rows = p.collect()
    assert set(r["lang"] for r in rows) == {"x", "y"}
    per = {}
    for r in rows:
        per.setdefault(r["lang"], []).append(r["rank"])
    for lang, ranks in per.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5
    top_x = [r["gram"] for r in rows if r["lang"] == "x" and r["rank"] == 1]
    assert top_x == ["aaa"]  # most frequent trigram of x


def test_self_train_accuracy_on_crafted_corpus(spark):
    # the driver's documents table uses ONE shared vocabulary for every
    # lang label (the label is not recoverable from text), so accuracy
    # is tested on a crafted corpus with genuinely distinct languages
    import random

    vocab = {
        "en": "the and of house water friend morning yellow quickly think",
        "de": "und der das haus wasser freund morgen gelb schnell denken",
        "fr": "le et de maison eau ami matin jaune vite penser",
        "es": "el y de casa agua amigo manana amarillo rapido pensar",
    }
    rng = random.Random(11)
    rows = []
    for i in range(400):
        lang = list(vocab)[i % 4]
        words = vocab[lang].split()
        rows.append(
            (i, " ".join(rng.choice(words) for _ in range(30)), lang)
        )
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")
    train = docs.filter(F.col("doc_id") % 5 != 0)
    held = docs.filter(F.col("doc_id") % 5 == 0)
    profiles = train_lang_profiles(train, "text", "lang", n=3, top_k=200)
    pred = lang_id_trained(held, "text", profiles, "doc_id")
    agg = pred.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("lang_pred") == F.col("lang")).cast("int")).alias("hit"),
    ).collect()[0]
    assert agg["n"] == 80
    assert agg["hit"] / agg["n"] >= 0.95, (agg["hit"], agg["n"])


def test_short_and_null_text_gets_null(spark):
    profiles = train_lang_profiles(
        spark.createDataFrame([("the quick brown fox", "en")], "text STRING, lang STRING"),
        "text", "lang",
    )
    df = spark.createDataFrame(
        [(1, None), (2, "ab"), (3, "qqqqq")], "id LONG, text STRING"
    )
    got = {r["id"]: r["lang_pred"] for r in
           lang_id_trained(df, "text", profiles, "id").collect()}
    assert got[1] is None and got[2] is None
    assert got[3] is None  # grams exist but match no profile gram


def test_small_profile_large_doc_top_no_inversion(spark):
    # profiles trained shallow (top_k=10) but documents profiled deep
    # (doc_top=40): unclamped out-of-place scores would make the CORRECT
    # language (which matches the most grams, many at far ranks) sum
    # most negative and lose — the clamp keeps matches >= 0
    import random

    vocab = {
        "en": "the and of house water friend morning yellow quickly think",
        "de": "und der das haus wasser freund morgen gelb schnell denken",
    }
    rng = random.Random(5)
    rows = [
        (i, " ".join(rng.choice(vocab[l].split()) for _ in range(60)), l)
        for i, l in ((i, ["en", "de"][i % 2]) for i in range(200))
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")
    profiles = train_lang_profiles(docs, "text", "lang", n=3, top_k=10)
    pred = lang_id_trained(docs, "text", profiles, "doc_id", doc_top=40)
    acc = pred.agg(
        F.avg((F.col("lang_pred") == F.col("lang")).cast("double"))
    ).collect()[0][0]
    assert acc >= 0.9, acc
