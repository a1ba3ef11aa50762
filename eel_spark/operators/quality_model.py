"""Model-based document quality scoring (fasttext-style linear filter).

Heuristic quality metrics (functions/text.py) catch structural junk;
the standard second stage in public web-corpus pipelines (CCNet,
RedPajama, Dolma — all public techniques) is a LINEAR text classifier
trained to separate a high-quality seed corpus (e.g. curated reference
text) from random crawl text, then applied as a soft filter.

This is the Spark-first realization on ``pyspark.ml``: every stage is
JVM-side (RegexTokenizer → unigram+bigram HashingTF → LogisticRegression),
training is distributed L-BFGS over the feature vectors, and scoring is
a ``PipelineModel.transform`` — no Python in the row path, so the
filter runs at scan speed on 100 TB. Hashed features mean no vocabulary
build pass and a fixed-size model that broadcasts to executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pipeline(text_col: str, num_features: int, reg_param: float):
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, NGram, RegexTokenizer, VectorAssembler

    tok = RegexTokenizer(
        inputCol=text_col, outputCol="__words",
        pattern=r"[^\p{L}\p{N}']+", minTokenLength=1, toLowercase=True,
    )
    bi = NGram(n=2, inputCol="__words", outputCol="__bigrams")
    tf_uni = HashingTF(
        inputCol="__words", outputCol="__f_uni", numFeatures=num_features
    )
    tf_bi = HashingTF(
        inputCol="__bigrams", outputCol="__f_bi", numFeatures=num_features
    )
    asm = VectorAssembler(inputCols=["__f_uni", "__f_bi"], outputCol="__features")
    lr = LogisticRegression(
        featuresCol="__features", labelCol="__label",
        regParam=reg_param, elasticNetParam=0.0, maxIter=50,
    )
    return Pipeline(stages=[tok, bi, tf_uni, tf_bi, asm, lr])


def _drop_training_summary(pipeline_model) -> None:
    """Null out the fitted LogisticRegressionModel's ``trainingSummary``.

    The summary holds a reference to the SparkSession; once any
    ``Observation`` has been used in that session, Spark 4's lazily
    materialized (and non-transient) ``ObservationManager`` makes the
    session — and therefore any task closure that captures the model,
    i.e. every ``transform`` — fail with ``Task not serializable``.
    The summary is diagnostics-only (it is dropped by save/load anyway),
    so stripping it loses nothing. Best-effort: a JVM where the private
    field moved just keeps the summary.
    """
    for stage in pipeline_model.stages:
        jobj = getattr(stage, "_java_obj", None)
        if jobj is None:
            continue
        try:
            from pyspark import SparkContext

            jvm = SparkContext._active_spark_context._jvm
            none = getattr(getattr(jvm.scala, "None$"), "MODULE$")
            cls = jobj.getClass()
            while cls is not None:
                hit = None
                for fld in cls.getDeclaredFields():
                    if fld.getName().split("$")[-1] == "trainingSummary":
                        hit = fld
                        break
                if hit is not None:
                    hit.setAccessible(True)
                    hit.set(jobj, none)
                    break
                cls = cls.getSuperclass()
        except Exception:
            pass


def train_quality_model(
    positives: DataFrame,
    negatives: DataFrame,
    text_col: str = "text",
    num_features: int = 1 << 18,
    reg_param: float = 1e-3,
):
    """Train the quality classifier from a high-quality seed corpus
    (``positives``) vs junk/random crawl text (``negatives``).

    Returns a fitted ``PipelineModel``; persist it with
    ``model.write().save(path)`` and reload via ``PipelineModel.load``
    so scoring jobs never retrain. Feature hashing (2^18 buckets for
    unigrams + bigrams) keeps the model a fixed few MB independent of
    corpus size — it broadcasts once per scoring job.
    """
    labeled = positives.select(
        F.col(text_col), F.lit(1.0).alias("__label")
    ).unionByName(negatives.select(F.col(text_col), F.lit(0.0).alias("__label")))
    model = _pipeline(text_col, num_features, reg_param).fit(labeled)
    _drop_training_summary(model)
    return model


def score_quality(
    model,
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "quality_score",
) -> DataFrame:
    """Append ``out_col`` = P(high quality) ∈ [0, 1] to every row.
    Pure JVM transform — filter on it (``df.filter(col > 0.5)``) or keep
    it as a feature for downstream temperature sampling.

    ``text_col`` may differ from the column the model was trained on:
    the frame is aliased to the tokenizer's input column for the
    transform and aliased back afterwards.
    """
    from pyspark.ml.functions import vector_to_array

    train_col = model.stages[0].getInputCol()
    renamed = text_col != train_col
    if renamed and train_col in df.columns:
        raise ValueError(
            f"df already has a column named {train_col!r} (the model's "
            f"training input) — drop or rename it before scoring {text_col!r}"
        )
    inp = df.withColumnRenamed(text_col, train_col) if renamed else df
    scored = model.transform(inp)
    out = scored.withColumn(
        out_col, F.round(vector_to_array(F.col("probability"))[1], 6)
    ).drop("__words", "__bigrams", "__f_uni", "__f_bi", "__features",
           "rawPrediction", "probability", "prediction")
    return out.withColumnRenamed(train_col, text_col) if renamed else out


def _token_array(text_col: str):
    """THE LM tokenization, in array form — the single definition all
    train/score paths derive from, so a model can never be scored with
    a different tokenizer than it was trained with.

    ``\\s+``-based: a whitespace-free-script document (Han/kana/Thai)
    degenerates to ~1 giant always-OOV token and a meaningless
    perplexity. For such corpora apply
    ``functions.text.segment_no_space_scripts`` to the TEXT COLUMN
    before BOTH train_* and score_* calls (same segmentation both
    sides — the same invariant this helper exists to enforce)."""
    return F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: F.length(t) > 0,
    )


def _unigram_from_tokens(toks: DataFrame, min_count: int):
    """(vocab, oov_logp) from a (tok) row frame — the shared tail of
    unigram and bigram training."""
    from eel_spark.caching import pin

    # counts feeds BOTH the totals collect and the returned vocab —
    # unpinned, the first scoring job would re-run the full corpus
    # tokenize+count (released by caching.release_pins(); callers that
    # persist the vocab to storage can release immediately)
    counts = pin(toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c")))
    tot = counts.agg(
        F.sum("c").alias("n"),
        F.sum(F.when(F.col("c") < min_count, F.col("c"))).alias("oov_mass"),
        F.count(F.when(F.col("c") < min_count, F.lit(1))).alias("oov_types"),
    ).collect()[0]
    if not tot["n"]:
        # silent degenerate LM would be worse than the failure: oov_logp
        # of 0.0 scores every document 0 bits/token ("perfectly natural")
        # and a keep-low-band filter then keeps everything
        raise ValueError("train_unigram_lm: training corpus has no tokens")
    n = tot["n"]
    oov_mass = tot["oov_mass"] or 1
    oov_types = max(tot["oov_types"] or 1, 1)
    import math

    oov_logp = math.log(max(oov_mass, 1) / n / oov_types)
    vocab = counts.filter(F.col("c") >= min_count).select(
        "tok", F.log(F.col("c") / F.lit(float(n))).alias("logp")
    )
    return vocab, oov_logp


def train_unigram_lm(
    corpus: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
):
    """Unigram language model for perplexity-based quality filtering.

    CCNet's published recipe scores documents by LM perplexity and keeps
    the low-perplexity (most natural) band; the reference LM there is
    KenLM (external binary). This is the zero-dependency distributed
    analogue: token unigram log-probabilities estimated from a (clean)
    corpus — one explode + one groupBy, both map-side combinable.

    Returns ``(vocab, oov_logp)``: a (token, logp) DataFrame over tokens
    seen ≥ ``min_count`` times, and the OOV log-probability — the
    discounted probability mass of all filtered tokens spread over their
    distinct types (computed from two 1-row aggregates; no data on the
    driver beyond them). Persist ``vocab`` with the model run; it is a
    few MB for web-scale corpora after the count cut.
    """
    toks = corpus.select(F.explode(_token_array(text_col)).alias("tok"))
    return _unigram_from_tokens(toks, min_count)


def score_perplexity(
    df: DataFrame,
    vocab: DataFrame,
    oov_logp: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bits_per_token",
) -> DataFrame:
    """Append ``out_col`` = unigram cross-entropy in bits/token (lower =
    more natural under the training corpus; empty docs get NULL).
    Filter on a band (CCNet keeps the middle: too low = boilerplate,
    too high = gibberish).

    Scale shape: tokens explode to narrow (id, tok) rows; the vocab
    join broadcasts when small (AQE decides), unmatched tokens take the
    OOV log-prob via the left join's NULL; one groupBy(id) average; one
    final join back to ``df`` on the (unique) id. The document text
    itself is never shuffled with the token rows.
    """
    toks = df.select(
        F.col(id_col).alias("__pid"),
        F.explode(_token_array(text_col)).alias("tok"),
    )
    ln2 = 0.6931471805599453
    scored = (
        # the vocab is small BY CONSTRUCTION (min_count cut: a few MB at
        # web scale) — broadcast explicitly so the token rows never
        # shuffle for this join, independent of AQE's estimate
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("__pid")
        .agg(
            (-F.avg(F.coalesce(F.col("logp"), F.lit(float(oov_logp)))) / ln2).alias(
                out_col
            )
        )
    )
    return df.join(
        scored.withColumnRenamed("__pid", id_col), id_col, "left"
    ).withColumn(out_col, F.round(F.col(out_col), 4))


def train_bigram_lm(
    corpus: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    bigram_min_count: int = 5,
):
    """Interpolated bigram language model — one fidelity step toward the
    KenLM n-gram models CCNet's published perplexity recipe uses, still
    zero-dependency and fully distributed.

    Returns ``(bigrams, vocab, oov_logp)``:

    - ``bigrams``: (w1, w2, logp_bi) with ``logp_bi = log(c(w1,w2) /
      c(w1))`` over pairs seen ≥ ``bigram_min_count`` times — the
      maximum-likelihood conditional. The count cut bounds the table
      but — unlike the vocab — bigram TYPES keep growing with the
      corpus, so treat it as a (slim) TABLE, not a broadcast constant;
      the scorer's join lets AQE pick the strategy accordingly.
    - ``vocab``/``oov_logp``: the :func:`train_unigram_lm` model over
      the SAME corpus (one extra aggregate on the same tokenized pass'
      shape) — the interpolation floor and the unseen-pair fallback.

    Scoring (:func:`score_perplexity_bigram`) interpolates
    ``p = λ·p_bi + (1−λ)·p_uni`` — with p_bi = 0 for unseen/cut pairs —
    so every probability is strictly positive whenever λ < 1 (Jelinek-
    Mercer smoothing, public). λ lives at SCORING time: one trained
    model serves any mixture weight.

    Scale shape: the corpus is read and tokenized ONCE — the pinned
    per-document token arrays feed the unigram counts (explode) and the
    bigram counts (a window-free zip of each array with itself — pair
    generation never shuffles); both counts are map-side-combinable
    groupBys, and the w1 denominators fold from the pinned bigram
    counts rather than rescanning anything.
    """
    from eel_spark.caching import pin

    # ONE tokenize pass: both models derive from these pinned arrays
    # (released by caching.release_pins(); callers persisting the model
    # to storage can release immediately)
    arrs = pin(corpus.select(_token_array(text_col).alias("__t")))
    vocab, oov_logp = _unigram_from_tokens(
        arrs.select(F.explode("__t").alias("tok")), min_count
    )
    pairs = arrs.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("__t"), 1, F.greatest(F.size("__t") - 1, F.lit(0))),
                F.slice(F.col("__t"), 2, F.greatest(F.size("__t") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    # pinned: the w1 totals AND the cut table both read it
    bi_counts = pin(
        pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bi"))
    )
    w1_counts = bi_counts.groupBy("w1").agg(F.sum("c_bi").alias("c_w1"))
    bigrams = (
        bi_counts.filter(F.col("c_bi") >= bigram_min_count)
        .join(w1_counts, "w1")
        .select(
            "w1", "w2",
            F.log(F.col("c_bi") / F.col("c_w1")).alias("logp_bi"),
        )
    )
    return bigrams, vocab, oov_logp


def score_perplexity_bigram(
    df: DataFrame,
    bigrams: DataFrame,
    vocab: DataFrame,
    oov_logp: float,
    lam: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bits_per_token",
) -> DataFrame:
    """Append ``out_col`` = interpolated-bigram cross-entropy in
    bits/token: per position, ``p = λ·p(w2|w1) + (1−λ)·p_uni(w2)`` with
    the bigram term 0 when the pair is unseen/cut and the unigram term
    falling back to ``oov_logp`` — strictly positive for λ < 1, so no
    −inf poisoning. A document's FIRST token scores unigram-only (no
    predecessor); empty docs get NULL; single-token docs score their
    one token. Lower = more natural; filter on a band like the unigram
    scorer.

    Scale shape: one explode to (id, w1, w2) position rows (w1 NULL at
    position 0); the vocab join broadcasts (bounded by construction),
    the bigram join is AQE's choice (its table grows with the corpus);
    one groupBy(id) average, one join back.
    """
    if not 0.0 <= lam < 1.0:
        raise ValueError(f"lam must be in [0, 1), got {lam}")
    arrs = df.select(
        F.col(id_col).alias("__pid"), _token_array(text_col).alias("__t")
    ).filter(F.size("__t") > 0)
    pos = arrs.select(
        "__pid",
        F.explode(
            F.zip_with(
                # predecessors: NULL prepended so position 0 pairs with
                # no w1 (unigram-only); concat keeps lengths aligned
                F.concat(F.array(F.lit(None).cast("string")),
                         F.slice(F.col("__t"), 1, F.greatest(F.size("__t") - 1, F.lit(0)))),
                F.col("__t"),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p"),
    ).select("__pid", "p.w1", "p.w2")
    ln2 = 0.6931471805599453
    uni = vocab.select(F.col("tok").alias("w2"), F.col("logp").alias("__lp_uni"))
    # vocab is bounded by construction (broadcast); the bigram table is
    # NOT — its types grow with the corpus even after the count cut, so
    # AQE decides that join (a forced broadcast would collect a
    # potentially multi-GB table to the driver)
    uni_lp = F.coalesce(F.col("__lp_uni"), F.lit(float(oov_logp)))
    if lam == 0.0:
        # pure-unigram positions score logp DIRECTLY (no exp/log round
        # trip), so λ=0 equals score_perplexity bit-for-bit
        lp = uni_lp
    else:
        lp = F.when(F.col("w1").isNull(), uni_lp).otherwise(
            F.log(
                F.lit(float(lam))
                * F.coalesce(F.exp(F.col("logp_bi")), F.lit(0.0))
                + F.lit(1.0 - float(lam)) * F.exp(uni_lp)
            )
        )
    scored = (
        pos.join(bigrams, ["w1", "w2"], "left")
        .join(F.broadcast(uni), "w2", "left")
        .select("__pid", lp.alias("__lp"))
        .groupBy("__pid")
        .agg((-F.avg("__lp") / ln2).alias(out_col))
    )
    return df.join(
        scored.withColumnRenamed("__pid", id_col), id_col, "left"
    ).withColumn(out_col, F.round(F.col(out_col), 4))
