"""Python-path text kernels: Unicode normalization and compression
ratio — the two standard corpus-prep signals that genuinely have no
Catalyst expression (the JVM exposes no NFKC builtin to Spark SQL, and
no deflate-length function).

Both are Arrow-batched pandas UDFs (the sanctioned slow path, SURVEY
§4 rule 5): one Python roundtrip per ~10k-row batch, stateless, narrow
maps — no shuffle, no driver involvement. On a real cluster the cost
is bounded by the Arrow transfer of the text column itself; keep them
OUT of hot per-query paths and run them once at ingest, materializing
the result.

The JVM-side near-equivalents that ARE Catalyst live in
functions/text.py (``normalized_text`` for whitespace/case folding,
``strip_control_chars`` below's regex twin) — prefer them when NFKC
semantics are not required.
"""

from __future__ import annotations

import sys
import unicodedata
import zlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


#: JVM-side control/format stripper (Catalyst, scan speed): removes
#: Unicode Cc controls (except \t \n \r) and Cf format chars (zero-width
#: spaces/joiners, BOM, bidi marks). The regex twin of the UDF's
#: strip_control step for pipelines that want ONLY this part JVM-side.
def strip_control_chars(text: Column | str) -> Column:
    return F.regexp_replace(
        _c(text), r"[\p{Cf}\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", ""
    )


def normalize_unicode(
    text: Column | str,
    form: str = "NFKC",
    strip_control: bool = True,
    collapse_whitespace: bool = False,
) -> Column:
    """Unicode-normalize a text column (default NFKC — the corpus-prep
    choice: folds ligatures, fullwidth forms, superscripts and
    compatibility variants so tokenizers and hash-dedup see one spelling
    per grapheme).

    ``strip_control`` additionally removes Cc controls (keeping
    tab/newline/CR) and Cf format characters (zero-width spaces, BOM,
    bidi marks) AFTER normalization — the invisible characters that
    split otherwise-identical dedup keys. ``collapse_whitespace`` folds
    runs of whitespace to single spaces and trims (off by default: it
    destroys line structure that line-level dedup needs). NULL → NULL.
    """
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    keep = {"\t", "\n", "\r"}
    do_strip = bool(strip_control)
    do_ws = bool(collapse_whitespace)

    @F.pandas_udf("string")
    def norm(s: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            t = unicodedata.normalize(form, t)
            if do_strip:
                t = "".join(
                    ch
                    for ch in t
                    if ch in keep or unicodedata.category(ch) not in ("Cc", "Cf")
                )
            if do_ws:
                t = " ".join(t.split())
            return t

        return s.map(one)

    return norm(_c(text))


def compression_ratio(text: Column | str, level: int = 6) -> Column:
    """zlib-compressed size / raw UTF-8 size (double in (0, ~1.01]).

    The classic machine-text detector (used in public crawl pipelines
    as a repetition/boilerplate signal): natural prose compresses to
    ~0.3-0.6, template spam and repeated boilerplate far below, random
    base64-ish noise near or above 1.0. Complements the Catalyst
    repetition metrics in functions/text.py (those see token/line
    repeats; deflate sees ANY byte-level redundancy, including
    paraphrase-free templating). NULL/empty → NULL.
    """
    lvl = int(level)
    if not (1 <= lvl <= 9):
        raise ValueError("zlib level must be in 1..9")

    @F.pandas_udf("double")
    def ratio(s: pd.Series) -> pd.Series:
        def one(t):
            if not t:
                return None
            raw = t.encode("utf-8", "surrogatepass")
            return len(zlib.compress(raw, lvl)) / len(raw)

        return s.map(one)

    return ratio(_c(text))
