"""Model-based quality filter (operators/quality_model.py): separability
on a planted clean-vs-junk corpus, JVM-only scoring, save/load round trip."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from eel_spark.operators.quality_model import score_quality, train_quality_model


def _corpus(spark):
    random.seed(3)
    clean_tmpl = [
        "the committee published its annual report on regional development",
        "researchers described a method for measuring water quality in rivers",
        "the library extended its opening hours during the examination period",
        "engineers completed the bridge inspection ahead of schedule this year",
        "the orchestra performed three symphonies to a full concert hall",
    ]
    junk_tmpl = [
        "click here buy now cheap cheap cheap best price viagra casino",
        "xjq zzpt qwfk vvnm lorem asdfgh qwerty zxcvb 77777 $$$$",
        "FREE FREE FREE winner winner claim prize now http bit ly xx",
        "aaaa bbbb cccc dddd eeee ffff gggg hhhh iiii jjjj kkkk",
    ]

    def vary(t, i):
        words = t.split()
        words[i % len(words)] = words[i % len(words)] + str(i % 7)
        return " ".join(words)

    pos = [(i, vary(clean_tmpl[i % len(clean_tmpl)], i)) for i in range(120)]
    neg = [(1000 + i, vary(junk_tmpl[i % len(junk_tmpl)], i)) for i in range(120)]
    schema = "doc_id: long, text: string"
    return (
        spark.createDataFrame(pos[:80] + neg[:80], schema),   # train
        spark.createDataFrame(pos[80:] + neg[80:], schema),   # held out
    )


def test_quality_model_separates_and_round_trips(spark, tmp_path):
    train, held = _corpus(spark)
    model = train_quality_model(
        train.filter("doc_id < 1000"),
        train.filter("doc_id >= 1000"),
        num_features=1 << 12,
    )
    scored = score_quality(model, held)
    assert "quality_score" in scored.columns
    # no helper columns leak
    assert set(scored.columns) == {"doc_id", "text", "quality_score"}
    rows = {r["doc_id"]: r["quality_score"] for r in scored.collect()}
    clean_scores = [v for k, v in rows.items() if k < 1000]
    junk_scores = [v for k, v in rows.items() if k >= 1000]
    # held-out separation: clean well above junk
    assert min(clean_scores) > max(junk_scores)
    assert sum(clean_scores) / len(clean_scores) > 0.8
    assert sum(junk_scores) / len(junk_scores) < 0.2

    # scoring stays JVM-side: no BatchEvalPython / Python UDF in the plan
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan.replace(
        "ArrowEvalPython", ""
    ), plan[:1500]

    # persist + reload scores identically (the production scoring path)
    from pyspark.ml import PipelineModel

    path = str(tmp_path / "qmodel")
    model.write().overwrite().save(path)
    re_scored = score_quality(PipelineModel.load(path), held)
    assert {r["doc_id"]: r["quality_score"] for r in re_scored.collect()} == rows


def test_scoring_survives_session_observations(spark):
    """Once any Observation has run in the session, Spark 4's lazily
    materialized (non-transient) ObservationManager makes the session
    unserializable — and the fitted LR model's trainingSummary drags the
    session into every transform closure ("Task not serializable").
    train_quality_model strips the summary, so training AND scoring must
    work in a session where Observations have been used."""
    from pyspark.sql import Observation

    obs = Observation("qm_probe")
    spark.range(16).observe(obs, F.count(F.lit(1)).alias("n")).collect()
    assert obs.get["n"] == 16

    train, held = _corpus(spark)
    model = train_quality_model(
        train.filter("doc_id < 1000"), train.filter("doc_id >= 1000"),
        num_features=1 << 10,
    )
    assert score_quality(model, held.limit(20)).count() == 20


def test_score_quality_renamed_text_column(spark):
    """Scoring a frame whose text lives under a different column name
    must work (aliased to the model's training input and back)."""
    train, held = _corpus(spark)
    model = train_quality_model(
        train.filter("doc_id < 1000"), train.filter("doc_id >= 1000"),
        num_features=1 << 12,
    )
    renamed = held.withColumnRenamed("text", "content")
    scored = score_quality(model, renamed, text_col="content")
    assert set(scored.columns) == {"doc_id", "content", "quality_score"}
    rows = {r["doc_id"]: r["quality_score"] for r in scored.collect()}
    assert min(v for k, v in rows.items() if k < 1000) > max(
        v for k, v in rows.items() if k >= 1000
    )
    # a clashing column named like the training input is rejected clearly
    import pytest as _pytest
    with _pytest.raises(ValueError, match="training input"):
        score_quality(model, renamed.withColumn("text", F.lit("x")),
                      text_col="content")


def test_unigram_perplexity_separates(spark):
    """Perplexity under a clean-corpus unigram LM: held-out clean text
    scores fewer bits/token than gibberish; OOV-only docs score the OOV
    floor; empty docs get NULL."""
    from eel_spark.operators.quality_model import (
        score_perplexity,
        train_unigram_lm,
    )

    train, held = _corpus(spark)
    vocab, oov_logp = train_unigram_lm(
        train.filter("doc_id < 1000"), min_count=2
    )
    assert oov_logp < 0
    # vocab rows carry finite negative log-probs
    import math

    for r in vocab.limit(5).collect():
        assert r["logp"] < 0 and math.isfinite(r["logp"])

    extra = spark.createDataFrame(
        [(9001, ""), (9002, "zzqx vvnm qqpt wwkl")],
        "doc_id: long, text: string",
    )
    out = score_perplexity(
        held.unionByName(extra), vocab, oov_logp
    )
    rows = {r["doc_id"]: r["bits_per_token"] for r in out.collect()}
    clean = [v for k, v in rows.items() if k < 1000]
    junk = [v for k, v in rows.items() if 1000 <= k < 9000]
    # clean held-out text is more predictable than junk on average
    assert sum(clean) / len(clean) < sum(junk) / len(junk)
    assert rows[9001] is None
    # all-OOV doc: exactly the OOV floor in bits
    assert abs(rows[9002] - (-oov_logp / math.log(2))) < 1e-3


def test_unigram_lm_empty_corpus_raises(spark):
    import pytest as _pytest

    from eel_spark.operators.quality_model import train_unigram_lm

    empty = spark.createDataFrame([], "doc_id: long, text: string")
    with _pytest.raises(ValueError, match="no tokens"):
        train_unigram_lm(empty)


# -- interpolated bigram LM (r11) ---------------------------------------------


def _bigram_corpus(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat ran"),
        (3, "the dog sat on the mat"),
        (4, "a cat and a dog"),
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_bigram_lm_matches_python_reference(spark):
    import math

    from eel_spark.operators.quality_model import (
        score_perplexity_bigram,
        train_bigram_lm,
    )

    corpus = _bigram_corpus(spark)
    bigrams, vocab, oov_logp = train_bigram_lm(
        corpus, min_count=1, bigram_min_count=1
    )
    got_bi = {(r["w1"], r["w2"]): r["logp_bi"] for r in bigrams.collect()}
    # python reference over the same corpus
    texts = [r["text"].split() for r in corpus.collect()]
    from collections import Counter
    bi = Counter((a, b) for t in texts for a, b in zip(t, t[1:]))
    w1 = Counter()
    for (a, _), c in bi.items():
        w1[a] += c
    for pair, c in bi.items():
        assert abs(got_bi[pair] - math.log(c / w1[pair[0]])) < 1e-12
    assert set(got_bi) == set(bi)

    uni = {r["tok"]: r["logp"] for r in vocab.collect()}
    lam = 0.6
    scored = {
        r["doc_id"]: r["bits_per_token"]
        for r in score_perplexity_bigram(
            corpus, bigrams, vocab, oov_logp, lam=lam
        ).collect()
    }
    for r in corpus.collect():
        t = r["text"].split()
        lps = []
        for i, w in enumerate(t):
            p_uni = math.exp(uni.get(w, oov_logp))
            if i == 0:
                lps.append(math.log(p_uni))
            else:
                p_bi = math.exp(got_bi[(t[i - 1], w)]) if (t[i - 1], w) in got_bi else 0.0
                lps.append(math.log(lam * p_bi + (1 - lam) * p_uni))
        want = -sum(lps) / len(lps) / math.log(2)
        assert abs(scored[r["doc_id"]] - round(want, 4)) < 5e-4


def test_bigram_scorer_lam_zero_equals_unigram_scorer(spark):
    """λ=0 collapses the interpolation to the pure unigram model — the
    two scorers must agree bit-for-bit (same rounding)."""
    from eel_spark.operators.quality_model import (
        score_perplexity,
        score_perplexity_bigram,
        train_bigram_lm,
    )

    corpus = _bigram_corpus(spark)
    bigrams, vocab, oov_logp = train_bigram_lm(
        corpus, min_count=1, bigram_min_count=1
    )
    assert bigrams.count() > 0  # the seen-pair arm must be exercised
    a = {
        r["doc_id"]: r["bits_per_token"]
        for r in score_perplexity_bigram(
            corpus, bigrams, vocab, oov_logp, lam=0.0
        ).collect()
    }
    b = {
        r["doc_id"]: r["bits_per_token"]
        for r in score_perplexity(corpus, vocab, oov_logp).collect()
    }
    assert a == b


def test_bigram_scorer_edges(spark):
    import pytest as _pytest

    from eel_spark.operators.quality_model import (
        score_perplexity_bigram,
        train_bigram_lm,
    )

    corpus = _bigram_corpus(spark)
    bigrams, vocab, oov_logp = train_bigram_lm(
        corpus, min_count=1, bigram_min_count=1
    )
    docs = spark.createDataFrame(
        [(10, "zzz qqq"), (11, ""), (12, "cat"), (13, "the cat sat")],
        "doc_id: long, text: string",
    )
    got = {
        r["doc_id"]: r["bits_per_token"]
        for r in score_perplexity_bigram(
            docs, bigrams, vocab, oov_logp, lam=0.9
        ).collect()
    }
    assert got[11] is None                      # empty doc
    assert got[12] is not None                  # single token: unigram-only
    # all-OOV doc scores strictly worse than an in-corpus phrase
    assert got[10] > got[13]
    with _pytest.raises(ValueError, match="lam"):
        score_perplexity_bigram(docs, bigrams, vocab, oov_logp, lam=1.0)
