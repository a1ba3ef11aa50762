"""Byte-pair-encoding tokenizer: distributed statistics, tiny driver
merge loop, Arrow-batched distributed encode.

Real BPE training (Sennrich et al. 2016, public) never iterates over
the corpus — it iterates over the WORD-TYPE frequency table, which is
tiny compared to the corpus (Zipf: a 100 TB crawl has millions of word
types, not trillions). So the distributed part of training is exactly
one aggregation: pre-tokenize, explode, groupBy(word).count(), top-K
word types by frequency (a TakeOrdered, never a full sort). The merge
loop then runs on the driver over that bounded table — the same split
every public tokenizer trainer (subword-nmt, HuggingFace tokenizers)
makes, because the loop is inherently sequential: merge i+1 depends on
the symbol state after merge i.

Encoding is the reverse shape: the merge ranks are a small static dict
(≤ vocab_size entries), shipped with an Arrow-batched pandas UDF that
applies the classic lowest-rank-first greedy loop per word with a
word-type cache — Zipf again means the cache hit rate is extreme, so
per-row cost is amortized dict lookups. Corpus rows never shuffle; the
encode is a narrow map.

This replaces the ``bpe_ish_token_count`` proxy in functions/text.py
for pipelines that need the REAL subword segmentation (token budgets,
packing, chunk sizing against a trained vocab).
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: GPT-2-ish pre-tokenizer: runs of letters, runs of digits, runs of
#: other non-space symbols. Training and encoding MUST share this split.
#: Whitespace-free scripts (Han/kana/Thai) land in the third
#: alternative as ONE pre-token per run — a spaceless paragraph becomes
#: a single giant "word", which is both a merge-quality and an O(n²
#: per word) cost problem. For such corpora apply
#: ``functions.text.segment_no_space_scripts`` to the text UPSTREAM of
#: train_bpe AND bpe_encode (same segmentation both sides, same
#: contract as sharing this pattern); the char-level pre-tokens then
#: merge back into frequent multi-char units exactly the way BPE is
#: meant to.
PRETOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"

#: end-of-word marker (Sennrich's </w>): lets merges distinguish
#: word-final from word-internal contexts and makes detokenization
#: unambiguous.
EOW = "</w>"


def word_frequencies(
    df: DataFrame,
    text_col: str,
    max_word_types: int = 50_000,
    lowercase: bool = True,
    pattern: str = PRETOKEN_PATTERN,
) -> DataFrame:
    """The distributed half of BPE training: (word, freq) for the top
    ``max_word_types`` word types by corpus frequency.

    One explode + one map-side-combinable groupBy + one TakeOrdered —
    the corpus is scanned once and only (word, count) pairs shuffle.
    """
    txt = F.col(text_col)
    if lowercase:
        txt = F.lower(txt)
    words = F.regexp_extract_all(txt, F.lit(pattern), 0)
    return (
        df.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("word"))
        .limit(int(max_word_types))
    )


def _learn_merges(
    freqs: dict[str, int], num_merges: int, min_frequency: int
) -> list[tuple[str, str]]:
    """Driver-side merge loop over the word-type table (Sennrich's
    algorithm with incremental pair-count maintenance: each round only
    touches the words that contain the merged pair)."""
    words = [list(w) + [EOW] for w in freqs]
    counts = list(freqs.values())
    pair_counts: Counter = Counter()
    pair_words: defaultdict = defaultdict(set)
    for i, syms in enumerate(words):
        for p in zip(syms, syms[1:]):
            pair_counts[p] += counts[i]
            pair_words[p].add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        # deterministic: max count, ties to the lexicographically
        # smallest pair (reproduces the canonical subword-nmt example)
        best, best_n = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if best_n < min_frequency:
            break
        merges.append(best)
        joined = best[0] + best[1]
        for i in list(pair_words[best]):
            syms = words[i]
            c = counts[i]
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= c
                pair_words[p].discard(i)
            new_syms = []
            j = 0
            while j < len(syms):
                if (
                    j + 1 < len(syms)
                    and syms[j] == best[0]
                    and syms[j + 1] == best[1]
                ):
                    new_syms.append(joined)
                    j += 2
                else:
                    new_syms.append(syms[j])
                    j += 1
            words[i] = new_syms
            for p in zip(new_syms, new_syms[1:]):
                pair_counts[p] += c
                pair_words[p].add(i)
        pair_counts = Counter({p: n for p, n in pair_counts.items() if n > 0})
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str,
    num_merges: int = 1000,
    max_word_types: int = 50_000,
    min_frequency: int = 2,
    lowercase: bool = True,
    pattern: str = PRETOKEN_PATTERN,
) -> list[tuple[str, str]]:
    """Train a BPE merge table on a corpus.

    Distributed: one corpus scan to build the word-type frequency table
    (:func:`word_frequencies`, bounded at ``max_word_types`` rows).
    Driver: the sequential merge loop over that table. Returns the
    ranked merge list — rank order IS the model.
    """
    rows = word_frequencies(
        df, text_col, max_word_types, lowercase, pattern
    ).collect()
    freqs = {r["word"]: r["freq"] for r in rows}
    return _learn_merges(freqs, num_merges, min_frequency)


def _encode_word(
    word: str, ranks: dict[tuple[str, str], int], cache: dict
) -> list[str]:
    """Greedy lowest-rank-first merge of one word (GPT-2's bpe())."""
    hit = cache.get(word)
    if hit is not None:
        return hit
    syms = list(word) + [EOW]
    while len(syms) > 1:
        pairs = set(zip(syms, syms[1:]))
        best = min(pairs, key=lambda p: ranks.get(p, 1 << 60))
        if best not in ranks:
            break
        joined = best[0] + best[1]
        out = []
        j = 0
        while j < len(syms):
            if j + 1 < len(syms) and syms[j] == best[0] and syms[j + 1] == best[1]:
                out.append(joined)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    cache[word] = syms
    return syms


def bpe_encode(
    text: Column | str,
    merges: list[tuple[str, str]],
    lowercase: bool = True,
    pattern: str = PRETOKEN_PATTERN,
) -> Column:
    """Column of BPE tokens (``array<string>``) for ``text``.

    Arrow-batched pandas UDF — the sanctioned Python path (SURVEY §4
    rule 5): subword merging is inherently per-word sequential and has
    no Catalyst counterpart. The rank dict rides the serialized UDF
    (≤ vocab_size small tuples); the per-batch word-type cache makes
    the amortized cost a dict lookup per word. NULL → empty array.
    """
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    pat = re.compile(pattern)
    lower = bool(lowercase)

    @F.pandas_udf("array<string>")
    def enc(s: pd.Series) -> pd.Series:
        cache: dict = {}
        out = []
        for t in s:
            if t is None:
                out.append([])
                continue
            if lower:
                t = t.lower()
            toks: list[str] = []
            for w in pat.findall(t):
                toks.extend(_encode_word(w, ranks, cache))
            out.append(toks)
        return pd.Series(out)

    c = F.col(text) if isinstance(text, str) else text
    return enc(c)


def bpe_token_count(
    text: Column | str,
    merges: list[tuple[str, str]],
    lowercase: bool = True,
    pattern: str = PRETOKEN_PATTERN,
) -> Column:
    """Exact trained-vocab token count (the budget number packing and
    chunking should use once a real tokenizer exists)."""
    return F.size(bpe_encode(text, merges, lowercase, pattern))


def decode_tokens(tokens: Column | str) -> Column:
    """Inverse of :func:`bpe_encode` up to the pre-tokenizer's
    whitespace model: join subwords, turn each end-of-word marker back
    into a single space, trim. Pure Catalyst."""
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    return F.trim(F.regexp_replace(F.array_join(c, ""), re.escape(EOW), " "))


def save_merges(spark, merges: list[tuple[str, str]], path: str) -> None:
    """Persist the merge table as (rank, left, right) parquet — readable
    from any cluster, join-able, versionable next to the corpus."""
    spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank INT, left STRING, right STRING",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_merges(spark, path: str) -> list[tuple[str, str]]:
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return [(r["left"], r["right"]) for r in rows]


def save_merges_txt(merges: list[tuple[str, str]], path: str) -> None:
    """Persist the merge table in the PUBLIC text format (subword-nmt's
    merges.txt / GPT-2's vocab.bpe shape): an optional ``#version``
    header, then one merge per line as two space-separated symbols,
    rank = line order. Interop lever: encodings and token budgets can
    be checked against (or driven by) a released tokenizer's merge
    file, and merges trained here load into any public BPE encoder.

    Driver-side plain file I/O on purpose: the merge table is bounded
    by ``num_merges`` (KBs — it is already a driver list), and the
    public format is a single flat text file, not a part-file
    directory. Symbols containing spaces cannot be represented (the
    pre-tokenizer never produces them; refused loudly rather than
    written corruptly — use the parquet format for exotic symbol
    sets)."""
    for i, (a, b) in enumerate(merges):
        if " " in a or " " in b or not a or not b:
            raise ValueError(
                f"merge {i} ({a!r}, {b!r}) has a space or empty symbol — "
                "not representable in merges.txt; use save_merges "
                "(parquet) instead"
            )
    with open(path, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")


def load_merges_txt(path: str) -> list[tuple[str, str]]:
    """Read a public merges.txt / vocab.bpe file: a FIRST-line
    ``#version`` header and blank lines are skipped, every other line
    must be exactly two space-separated symbols (rank = line order;
    malformed lines are an error naming the line, never silently
    dropped — a missing merge silently changes every downstream
    segmentation). Only the first line can be a header in the public
    format — ``#`` is a legitimate merge SYMBOL (the pre-tokenizer
    emits punctuation runs), so later ``#``-leading lines are merges,
    not comments. Line endings are normalized (a CRLF checkout must
    not load every right symbol with an invisible trailing CR)."""
    merges: list[tuple[str, str]] = []
    # utf-8-sig: a BOM would otherwise make the header line fail the
    # #version check and load as a rank-0 merge, silently shifting
    # every downstream rank (r13 review, second pass). The header skip
    # keys on the first NON-BLANK line for the same reason.
    first_content = True
    with open(path, encoding="utf-8-sig") as f:
        for lineno, raw in enumerate(f, start=1):
            line = raw.rstrip("\r\n")
            if not line.strip():
                continue
            if first_content:
                first_content = False
                if line.startswith("#version"):
                    continue
            parts = line.split(" ")
            if len(parts) != 2 or not parts[0] or not parts[1]:
                raise ValueError(
                    f"{path}:{lineno}: expected 'left right', got {line!r}"
                )
            merges.append((parts[0], parts[1]))
    return merges
