"""Text-analysis column functions for large-scale corpus processing.

All functions return Catalyst Column expressions (JVM-side, whole-stage
codegen) — no Python UDFs in any hot path. These power the gated
``text_*`` queries in eel_spark.queries.pipeline and are the building
blocks a 100 TB pre-training pipeline needs: token counting, quality
ratios, language ID, fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(text: Column | str, pattern: str = " ") -> Column:
    """Whitespace tokenization (array of tokens, empties removed)."""
    return F.filter(F.split(_c(text), pattern), lambda t: t != "")


def token_count(text: Column | str) -> Column:
    """Number of whitespace tokens."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """BPE-ish token estimate: word-piece chunks of ≤4 chars — counts
    ceil(len/4) per word, a cheap deterministic proxy for a subword
    tokenizer (real BPE would be a broadcast-vocab pandas UDF)."""
    return F.aggregate(
        tokens(text),
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / 4).cast("long"),
    )


def char_count(text: Column | str) -> Column:
    return F.length(_c(text))


def whitespace_ratio(text: Column | str) -> Column:
    """Fraction of characters that are spaces (exact int/int → double)."""
    t = _c(text)
    spaces = F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit("")))
    return spaces.cast("double") / F.length(t).cast("double")


def mean_token_length(text: Column | str) -> Column:
    t = tokens(text)
    total = F.aggregate(t, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
    return total.cast("double") / F.size(t).cast("double")


def stopword_count(text: Column | str, stopwords: list[str]) -> Column:
    """Tokens that are in the stopword list (list is inlined into the plan;
    for large vocabularies use a broadcast join against a vocab table)."""
    sw = F.array(*[F.lit(w) for w in stopwords])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(sw, t)))


def quality_score(text: Column | str, stopwords: list[str]) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence +
    token-length sanity. Deterministic integer/double arithmetic."""
    n_tok = token_count(text)
    mean_len = mean_token_length(text)
    sw_ratio = stopword_count(text, stopwords).cast("double") / n_tok.cast("double")
    length_ok = (n_tok >= 10) & (n_tok <= 100000)
    mean_ok = (mean_len >= 2.0) & (mean_len <= 12.0)
    return (
        length_ok.cast("double") * 0.4
        + mean_ok.cast("double") * 0.3
        + F.least(sw_ratio * F.lit(3.0), F.lit(1.0)) * 0.3
    )


# language ID: tiny per-language marker vocabularies (public common words)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "von"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "des", "que", "dans"],
    "es": ["el", "la", "los", "y", "es", "no", "una", "por", "que", "con"],
    "zh": ["de", "shi", "bu", "le", "zai", "you", "wo", "ta", "men", "zhe"],
}


def lang_scores(text: Column | str, markers: dict[str, list[str]] | None = None) -> Column:
    """Map of language → marker-hit count (struct of exact ints)."""
    markers = markers or LANG_MARKERS
    return F.struct(
        *[stopword_count(text, words).alias(lang) for lang, words in markers.items()]
    )


def lang_id(text: Column | str, markers: dict[str, list[str]] | None = None) -> Column:
    """argmax language by marker-token hits.

    Deterministic: each language's score is encoded as
    ``score * N - index`` (N ≥ number of languages), so ``greatest`` picks
    the max score with ties broken by marker-dict order — the identical
    integer encoding is trivially expressible in the SQL oracle.
    Returns 'und' when no marker hits at all.
    """
    markers = markers or LANG_MARKERS
    langs = list(markers)
    n = max(8, len(langs))
    scores = {lang: stopword_count(text, markers[lang]) for lang in langs}
    keys = {lang: scores[lang] * n - i for i, lang in enumerate(langs)}
    g = F.greatest(*keys.values()) if len(langs) > 1 else keys[langs[0]]
    out = F.lit("und")
    for lang in langs:  # keys are unique, exactly one equals g
        out = F.when(g == keys[lang], F.lit(lang)).otherwise(out)
    any_hit = (
        F.greatest(*scores.values()) if len(langs) > 1 else scores[langs[0]]
    ) > 0
    return F.when(any_hit, out).otherwise(F.lit("und"))


def fingerprint(text: Column | str, prefix_len: int = 16) -> Column:
    """Content fingerprint: first ``prefix_len`` hex chars of md5 —
    engine-portable (DuckDB md5 produces identical hex)."""
    return F.substring(F.md5(_c(text).cast("binary")), 1, prefix_len)


def normalized_text(text: Column | str) -> Column:
    """Dedup-normalization: lowercase, collapse whitespace, strip."""
    return F.trim(F.regexp_replace(F.lower(_c(text)), "\\s+", " "))


# ---------------------------------------------------------------------------
# Repetition metrics (Gopher-style quality rules, Rae et al. 2021 §A1.1):
# documents dominated by one repeated line / word / bigram are low-quality
# machine-generated text. All pure Catalyst expressions — per-row, no
# shuffle, so they run at scan speed on any corpus size. The inner
# count-per-distinct-token scan is O(u·n) per document (u = distinct
# tokens); for pathological multi-megabyte documents switch to the
# explode+groupBy formulation instead — per-document expressions cost
# nothing extra at 100 TB, the explode path adds a shuffle.
# ---------------------------------------------------------------------------


def lines(text: Column | str) -> Column:
    """Non-blank lines of the document (array<string>)."""
    return F.filter(F.split(_c(text), "\n"), lambda l: F.trim(l) != "")


def duplicate_line_fraction(text: Column | str) -> Column:
    """Fraction of non-blank lines that are duplicates of an earlier line
    (0.0 for documents with ≤1 line)."""
    ls = lines(text)
    n = F.size(ls)
    dup = (n - F.size(F.array_distinct(ls))).cast("double") / n.cast("double")
    return F.when(n > 0, dup).otherwise(F.lit(0.0))


def _top_count(arr: Column) -> Column:
    """Count of the most frequent element of ``arr`` (0 when empty)."""
    per_distinct = F.transform(
        F.array_distinct(arr),
        lambda t: F.size(F.filter(arr, lambda x: x == t)),
    )
    return F.coalesce(F.array_max(per_distinct), F.lit(0))


def bigrams(text: Column | str) -> Column:
    """Adjacent token pairs joined with a space (array<string>)."""
    toks = tokens(text)
    m = F.greatest(F.size(toks) - 1, F.lit(0))
    return F.zip_with(
        F.slice(toks, 1, m), F.slice(toks, 2, m), lambda a, b: F.concat_ws(" ", a, b)
    )


def top_token_fraction(text: Column | str) -> Column:
    """Fraction of tokens taken by the single most frequent token
    (0.0 for empty documents)."""
    toks = tokens(text)
    frac = _top_count(toks).cast("double") / F.size(toks).cast("double")
    return F.when(F.size(toks) > 0, frac).otherwise(F.lit(0.0))


def top_bigram_fraction(text: Column | str) -> Column:
    """Fraction of bigrams taken by the most frequent bigram (0.0 for
    documents with <2 tokens)."""
    bg = bigrams(text)
    frac = _top_count(bg).cast("double") / F.size(bg).cast("double")
    return F.when(F.size(bg) > 0, frac).otherwise(F.lit(0.0))


# ---------------------------------------------------------------------------
# PII scrubbing: regexes restricted to the syntax Java regex and RE2-style
# engines share ((?:...), \b, \d, bounded repetition), so the DuckDB
# oracle can mirror them verbatim. regexp_replace / regexp_count are
# codegen'd JVM expressions — scrubbing runs at scan speed.
# ---------------------------------------------------------------------------

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PII_PHONE = r"\+?\d(?:[ -]?\d){7,14}"


def pii_email_count(text: Column | str) -> Column:
    return F.regexp_count(_c(text), F.lit(PII_EMAIL))


def pii_ipv4_count(text: Column | str) -> Column:
    return F.regexp_count(_c(text), F.lit(PII_IPV4))


def pii_phone_count(text: Column | str) -> Column:
    return F.regexp_count(_c(text), F.lit(PII_PHONE))


def redact_pii(text: Column | str) -> Column:
    """Replace emails / IPv4s / phone numbers with typed placeholder
    tokens. Order matters: emails first (their local part can contain
    digits), then IPs (dotted digits would half-match the phone rule),
    then phones."""
    out = F.regexp_replace(_c(text), PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, PII_IPV4, "<IP>")
    return F.regexp_replace(out, PII_PHONE, "<PHONE>")
