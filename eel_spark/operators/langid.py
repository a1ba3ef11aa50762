"""Trained language identification: Cavnar & Trenkle (1994) character
n-gram rank profiles (the public "textcat" technique) — the trained
upgrade over functions/text.py's marker-word heuristic.

Training is one aggregation chain: explode character n-grams, count
per (lang, gram) (map-side combinable), keep each language's top-K by
rank. The model is a (lang, gram, rank) table of n_langs × K rows —
kilobytes, broadcast everywhere.

Scoring is rank-profile similarity: the document's own top-M gram
profile joins the broadcast model on gram; each match contributes
``K − |doc_rank − lang_rank|`` (the out-of-place measure inverted into
a score so unmatched grams contribute 0 and need no per-language
bookkeeping); argmax language wins. The only shuffle carries slim
(doc, gram, count) rows; document text never moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _char_ngrams(text, n: int):
    """Distinct-position character n-grams of lowercased, whitespace-
    collapsed text (array<string>; empty for NULL/short text)."""
    t = F.regexp_replace(F.lower(text), r"\s+", " ")
    ln = F.length(t)
    return F.when(
        ln >= n,
        F.transform(
            F.sequence(F.lit(1), ln - n + 1), lambda i: F.substring(t, i, n)
        ),
    ).otherwise(F.array().cast("array<string>"))


def train_lang_profiles(
    df: DataFrame,
    text_col: str,
    lang_col: str,
    n: int = 3,
    top_k: int = 300,
) -> DataFrame:
    """(lang, gram, rank) profile table from labeled documents.

    The per-language ranking window is bounded by the distinct-gram
    count of a language (alphabet^n at most), not by corpus size —
    everything upstream of it is a map-side-combinable count.
    """
    grams = df.select(
        F.col(lang_col).alias("lang"),
        F.explode(_char_ngrams(F.col(text_col), n)).alias("gram"),
    )
    counts = grams.groupBy("lang", "gram").agg(
        F.count(F.lit(1)).alias("__n")
    )
    w = Window.partitionBy("lang").orderBy(F.desc("__n"), F.asc("gram"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("lang", "gram", "rank")
    )


def lang_id_trained(
    df: DataFrame,
    text_col: str,
    profiles: DataFrame,
    id_col: str,
    n: int = 3,
    doc_top: int = 40,
    out_col: str = "lang_pred",
) -> DataFrame:
    """Annotate ``df`` with the profile-nearest language.

    Ties break lexicographically; documents too short to produce any
    n-gram (or matching no profile gram) get NULL.
    """
    top_k = profiles.agg(F.max("rank")).first()[0] or 0
    doc_grams = df.select(
        F.col(id_col), F.explode(_char_ngrams(F.col(text_col), n)).alias("gram")
    )
    doc_counts = doc_grams.groupBy(id_col, "gram").agg(
        F.count(F.lit(1)).alias("__n")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("__n"), F.asc("gram"))
    doc_profile = (
        doc_counts.withColumn("__dr", F.row_number().over(w))
        .filter(F.col("__dr") <= doc_top)
        .select(id_col, "gram", "__dr")
    )
    scored = (
        doc_profile.join(F.broadcast(profiles), "gram")
        .groupBy(id_col, "lang")
        .agg(
            # clamp at 0: with profiles trained at top_k < doc_top a
            # distant-rank match would otherwise score BELOW an
            # unmatched gram's 0 and invert the measure (Cavnar-Trenkle
            # caps out-of-place distance at the maximum for the same
            # reason)
            F.sum(
                F.greatest(
                    F.lit(0),
                    F.lit(top_k) - F.abs(F.col("__dr") - F.col("rank")),
                )
            ).alias("__score")
        )
    )
    # min over (-score, lang): highest score wins, ties take the
    # lexicographically smallest language — deterministic
    best = scored.groupBy(id_col).agg(
        F.min_by(
            F.col("lang"), F.struct(-F.col("__score"), F.col("lang"))
        ).alias(out_col)
    )
    return df.join(best, on=id_col, how="left")
