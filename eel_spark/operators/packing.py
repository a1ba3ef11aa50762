"""Sequence packing: group documents into fixed token budgets.

Training pipelines don't feed documents one-by-one — they concatenate
them into fixed-length sequences (e.g. 4096 tokens) and waste whatever
doesn't fit. Good packing is bin packing: NP-hard globally, but
first-fit-decreasing (FFD, classic public algorithm) within a shard
gets ≤ 11/9·OPT + 1 bins and is linear-ish.

Distributed shape: documents are hash-sharded (content-deterministic —
same sharding on every run/retry), each shard is packed independently
by an Arrow-batched ``applyInPandas`` kernel, and the (shard, bin) pair
is the global pack id. Packing quality is per-shard, but with shards of
tens of thousands of docs the FFD waste is already within a percent or
two of global packing — while the work is embarrassingly parallel and
no shard ever sees more than |corpus|/n_shards rows.

This is one of the sanctioned Python-at-the-edges kernels (SURVEY §4
rule 5): the assignment is inherently sequential WITHIN a bin set, the
batch is Arrow-columnar, and nothing else in the job leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    size_col: str,
    max_tokens: int,
    n_shards: int | None = None,
    seed: int = 0,
) -> DataFrame:
    """Assign every document a ``(pack_shard, pack_bin)`` such that the
    documents sharing a bin sum to ≤ ``max_tokens`` tokens.

    Documents larger than ``max_tokens`` get a bin of their own with
    ``pack_oversize = true`` (the trainer's truncate/split decision, not
    ours). Assignment is deterministic: sharding is a content hash of
    ``id_col`` and the within-shard order is (size desc, id), so the
    same corpus packs identically on every run, retry, or layout.

    ``n_shards`` defaults to ``sparkContext.defaultParallelism``; at
    scale pick it so a shard's (id, size) pairs fit comfortably in one
    task's memory — the kernel sees two small columns, never the text.
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if n_shards is None:
        n_shards = df.sparkSession.sparkContext.defaultParallelism
    shard = F.pmod(F.xxhash64(F.lit(int(seed)), F.col(id_col)), F.lit(int(n_shards)))
    slim = df.select(
        F.col(id_col), F.col(size_col).cast("long").alias("__sz"),
        shard.cast("int").alias("pack_shard"),
    )

    import pandas as pd

    cap = int(max_tokens)

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import bisect

        order = pdf.sort_values(
            ["__sz", id_col], ascending=[False, True], kind="mergesort"
        )
        # best-fit-decreasing via a sorted list of (remaining, bin_id):
        # for each doc take the SMALLEST remaining capacity that fits —
        # same 11/9 bound as FFD, O(n log n) with bisect
        remainders: list[tuple[int, int]] = []  # sorted by remaining
        bins, oversize = [], []
        next_bin = 0
        for sz in order["__sz"].to_numpy():
            s = int(sz)
            if s > cap:
                bins.append(next_bin)
                oversize.append(True)
                next_bin += 1
                continue
            i = bisect.bisect_left(remainders, (s, -1))
            if i == len(remainders):  # nothing fits: open a bin
                b = next_bin
                next_bin += 1
                bisect.insort(remainders, (cap - s, b))
            else:
                rem, b = remainders.pop(i)
                bisect.insort(remainders, (rem - s, b))
            bins.append(b)
            oversize.append(False)
        out = order[[id_col]].copy()
        out["pack_bin"] = pd.Series(bins, index=order.index, dtype="int64")
        out["pack_oversize"] = pd.Series(oversize, index=order.index)
        out["pack_shard"] = pdf["pack_shard"].iloc[0]
        return out

    assigned = slim.groupBy("pack_shard").applyInPandas(
        pack,
        schema=(
            slim.select(id_col).schema.add("pack_bin", "long")
            .add("pack_oversize", "boolean").add("pack_shard", "integer")
        ),
    )
    return df.join(assigned, on=id_col, how="inner")


def packing_stats(packed: DataFrame, size_col: str, max_tokens: int) -> DataFrame:
    """One-row packing summary: bins, fill factor, waste. The quality
    gate for :func:`pack_sequences` — fill = Σsizes / (bins × cap) over
    the non-oversize bins."""
    per_bin = (
        packed.filter(~F.col("pack_oversize"))
        .groupBy("pack_shard", "pack_bin")
        .agg(F.sum(F.col(size_col).cast("long")).alias("__fill"))
    )
    return per_bin.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("__fill").alias("total_tokens"),
        F.round(
            F.sum("__fill") / (F.count(F.lit(1)) * F.lit(int(max_tokens))), 4
        ).alias("fill_factor"),
        F.max("__fill").alias("max_bin_tokens"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int,
    overlap_tokens: int = 0,
    tokenizer=None,
    joiner: str = " ",
) -> DataFrame:
    """Split documents into ≤ ``chunk_tokens``-token chunks with
    ``overlap_tokens`` of context carried between consecutive chunks —
    the standard pre-packing step for documents longer than the training
    sequence (and the retrieval-index chunking shape).

    Pure Catalyst: tokens split once, chunk starts from a ``sequence``
    with step ``chunk_tokens - overlap_tokens``, one ``posexplode`` row
    per chunk rebuilt via ``slice`` + ``concat_ws`` — no Python, no
    shuffle (a narrow map over the corpus; chunk ids are (doc,
    chunk_index)). Whitespace inside chunks is normalized to single
    spaces. Documents at or under ``chunk_tokens`` yield exactly one
    chunk 0. Output: ``id_col``, chunk_index, n_tokens, ``text_col``.

    The default ``\\s+`` split treats a whitespace-free-script (Han,
    kana, Thai) document as ~ONE giant token — a CJK novel would come
    back as a single "chunk" of any length. ``tokenizer`` hooks the
    split: a callable ``Column -> Column(array<string>)`` (must stay a
    Catalyst expression, e.g. ``lambda c: TX.tokens(
    TX.segment_no_space_scripts(c), r"\\s+")`` for char-level CJK
    segmentation); ``joiner`` is the string chunks are rebuilt with —
    pass ``joiner=""`` with a char-level tokenizer so no-space-script
    chunks reassemble WITHOUT inserted separators (mixed-script text
    loses its original inter-word spaces then; chunk the scripts
    separately when that matters).
    """
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not (0 <= overlap_tokens < chunk_tokens):
        raise ValueError("need 0 <= overlap_tokens < chunk_tokens")
    step = chunk_tokens - overlap_tokens
    if tokenizer is None:
        def tokenizer(c):  # noqa: E306 — the documented default split
            return F.split(F.trim(c), r"\s+")
    # NULL/blank text must still yield one (empty, n_tokens=0) chunk —
    # split("") returns [""], a phantom token, and split(NULL) is NULL,
    # which posexplode would silently DROP the document on
    toks = df.select(
        F.col(id_col),
        F.when(
            F.length(F.trim(F.col(text_col))) > 0,
            F.filter(tokenizer(F.col(text_col)), lambda t: t != ""),
        ).otherwise(F.array().cast("array<string>")).alias("__t"),
    )
    n = F.size("__t")
    # last start: the largest multiple of step strictly below n (so a doc
    # of exactly chunk_tokens yields one chunk; an overlap tail shorter
    # than step is absorbed by the previous chunk's slice); the greatest()
    # guard keeps n=0 docs at starts=[0] instead of a descending sequence
    starts = F.sequence(
        F.lit(0),
        F.greatest((n - F.lit(1)) - F.pmod(n - F.lit(1), F.lit(step)), F.lit(0)),
        F.lit(step),
    )
    # drop trailing starts that add no NEW tokens (fully inside the
    # previous chunk): keep start==0 or start + overlap < n
    starts = F.filter(
        starts, lambda s: (s == 0) | (s + F.lit(int(overlap_tokens)) < n)
    )
    chunks = toks.select(
        id_col,
        F.posexplode(starts).alias("chunk_index", "__start"),
        F.col("__t"),
    )
    piece = F.slice("__t", F.col("__start") + 1, chunk_tokens)
    return chunks.select(
        id_col,
        "chunk_index",
        F.size(piece).alias("n_tokens"),
        F.concat_ws(joiner, piece).alias(text_col),
    )
