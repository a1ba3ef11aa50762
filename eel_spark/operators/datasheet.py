"""Corpus datasheet: the "dataset card" summary a training-data
pipeline publishes with every corpus snapshot (Datasheets for
Datasets, Gebru et al. 2021 — public practice; the numbers here are
the quantitative section).

Two passes over the data regardless of corpus size: ONE aggregation
pass over a single projection computes every scalar (counts,
token/char volume, exact-dup rate via approx-distinct content hashes,
token-length quantiles, Gopher pass rate, PII density), and ONE slim
groupBy (persisted, feeding both the group count and the top-K
TakeOrdered — never a full collect of group space) yields the
composition table. Everything returned is a JSON-serializable dict
bounded by the report shape, never by data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eel_spark.functions import text as T


def corpus_datasheet(
    df: DataFrame,
    text_col: str,
    group_cols: tuple[str, ...] = (),
    top_groups: int = 50,
    gopher_kwargs: dict | None = None,
) -> dict:
    """Quantitative dataset card for a document corpus.

    ``group_cols`` (e.g. ``("lang", "source")``) drive the composition
    table; ``gopher_kwargs`` tune the quality-rule bundle the pass
    rate is computed with (see ``text.gopher_quality_flags``).
    """
    toks = T.token_count(F.col(text_col))
    proj = df.select(
        *[F.col(c) for c in group_cols],
        F.col(text_col).isNull().alias("__is_null"),
        F.coalesce(F.length(F.trim(text_col)) == 0, F.lit(True)).alias("__is_blank"),
        F.coalesce(toks, F.lit(0)).alias("__tok"),
        F.coalesce(F.length(text_col), F.lit(0)).alias("__chars"),
        F.md5(T.normalized_text(text_col).cast("binary")).alias("__h"),
        T.gopher_keep(text_col, **(gopher_kwargs or {})).alias("__keep"),
        (
            T.pii_email_count(text_col)
            + T.pii_ipv4_count(text_col)
            + T.pii_phone_count(text_col)
        ).alias("__pii"),
    )
    row = proj.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.col("__is_null").cast("long")).alias("null_docs"),
        F.sum(F.col("__is_blank").cast("long")).alias("blank_docs"),
        F.sum("__tok").alias("tokens"),
        F.sum("__chars").alias("chars"),
        F.approx_count_distinct("__h", 0.01).alias("distinct_content"),
        F.percentile_approx("__tok", [0.5, 0.9, 0.99], 10_000).alias("tok_q"),
        F.avg(F.col("__keep").cast("double")).alias("gopher_pass_rate"),
        F.sum(F.coalesce(F.col("__pii"), F.lit(0))).alias("pii_hits"),
    ).first()

    docs = row["docs"]
    card = {
        "docs": docs,
        "null_docs": row["null_docs"],
        "blank_docs": row["blank_docs"],
        "tokens": row["tokens"],
        "chars": row["chars"],
        "tokens_per_doc": {
            "p50": row["tok_q"][0] if docs else None,
            "p90": row["tok_q"][1] if docs else None,
            "p99": row["tok_q"][2] if docs else None,
            "mean": (row["tokens"] / docs) if docs else None,
        },
        # approx distinct is rsd~1%: clamp so tiny corpora never report
        # a (nonsensical) negative duplicate rate
        "approx_exact_dup_rate": (
            max(0.0, 1.0 - row["distinct_content"] / docs) if docs else 0.0
        ),
        "gopher_pass_rate": row["gopher_pass_rate"],
        "pii_hits_per_doc": (row["pii_hits"] / docs) if docs else 0.0,
    }
    if group_cols:
        counts = proj.groupBy(*group_cols).agg(
            F.count(F.lit(1)).alias("docs"), F.sum("__tok").alias("tokens")
        )
        # one materialization of the composition shuffle feeds both the
        # group count and the top-K
        counts.persist()
        try:
            n_groups = counts.count()
            top = counts.orderBy(
                F.desc("docs"), *[F.asc(c) for c in group_cols]
            ).limit(int(top_groups)).collect()
        finally:
            counts.unpersist()
        card["composition"] = {
            "group_cols": list(group_cols),
            "n_groups": n_groups,
            "top": [
                {
                    "group": {c: r[c] for c in group_cols},
                    "docs": r["docs"],
                    "fraction": (r["docs"] / docs) if docs else 0.0,
                    "tokens": r["tokens"],
                }
                for r in top
            ],
        }
    return card
