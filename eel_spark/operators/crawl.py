"""Crawl scheduling operators — sitemap ingestion and per-host fetch
planning, the stage between the deduplicated frontier and the fetcher:

    robots_sitemaps ─→ **sitemap_entries / sitemap_index_locs** ─┐
    html_links → resolve_url → canonical_url → dedup ────────────┤
                                                                 ▼
            filter_by_robots → **fetch_plan** → the fetcher's waves

Sitemap parsing follows sitemaps.org (the public protocol): a
``<urlset>`` of ``<url>`` entries (``loc`` required; ``lastmod``,
``changefreq``, ``priority`` optional) or a ``<sitemapindex>`` of child
sitemaps. Extraction is tolerant regex over the XML text — same
engine-neutral Java∩RE2 discipline as the HTML extractors, and
deliberately NOT a strict XML parse: one malformed sitemap among
millions must yield its parseable entries, not kill the stage (strict
``xpath()`` throws). Decompress ``.xml.gz`` sitemaps at fetch time;
these operators see text.

Scale shape: sitemap parsing is a per-row scan projection (no shuffle);
:func:`fetch_plan` is ONE shuffle by host + a running ``row_number`` —
the only operator here that moves data, and the politeness constraint
it implements (a host's fetches serialize) is exactly why partitioning
by host is the right co-location. Host skew is inherent and bounded:
``max_per_host`` caps any one host's slice of a wave, and the window
function is a running count (no frame buffering beyond the sorter's
spill path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from eel_spark.functions.text import _c, _decode_entities, url_host

__all__ = [
    "sitemap_entries",
    "sitemap_index_locs",
    "is_sitemap_index",
    "fetch_plan",
]

#: a <url> entry's interior — the \b-free open-tag guard ([\s>/]) keeps
#: <urlset> from matching as <url>
_URL_BLOCK = r"(?s)<\s*url[\s>](.*?)</\s*url\s*>"
_SITEMAP_BLOCK = r"(?s)<\s*sitemap[\s>](.*?)</\s*sitemap\s*>"
_CDATA = r"(?s)<!\[CDATA\[(.*?)\]\]>"


def _field(block: Column, tag: str) -> Column:
    """A child tag's trimmed text, NULL when absent/empty."""
    raw = F.regexp_extract(
        block, rf"(?s)<\s*{tag}[^>]*>\s*(.*?)\s*</\s*{tag}\s*>", 1
    )
    out = _decode_entities(F.trim(raw))
    return F.when(out != "", out)


def _strip_cdata(xml: Column) -> Column:
    return F.regexp_replace(xml, _CDATA, "$1")


def sitemap_entries(xml: Column | str) -> Column:
    """The ``<url>`` entries of a sitemaps.org urlset, as
    ``array<struct<loc, lastmod, changefreq, priority>>`` — ``loc``
    entity-decoded and CDATA-unwrapped (sitemap URLs legally carry
    ``&amp;``), ``priority`` parsed to double (NULL when malformed —
    ``try_cast`` semantics, a junk priority must not kill the scan),
    entries with no ``loc`` dropped. Namespace-prefix tolerant only in
    that prefixes are uncommon in the wild; the regex matches the bare
    tag names the protocol's own examples use. A truncated document
    yields its complete entries (tolerant by construction — the
    non-greedy block regex simply stops matching at the tear).

    Scan-side projection: compose ``explode(sitemap_entries(x))`` →
    ``canonical_url(loc)`` → frontier union with the outlink arm.
    """
    blocks = F.regexp_extract_all(_strip_cdata(_c(xml)), F.lit(_URL_BLOCK), 1)
    entries = F.transform(
        blocks,
        lambda b: F.struct(
            _field(b, "loc").alias("loc"),
            _field(b, "lastmod").alias("lastmod"),
            _field(b, "changefreq").alias("changefreq"),
            F.when(
                _field(b, "priority").rlike(r"^[+-]?\d*\.?\d+$"),
                _field(b, "priority").cast("double"),
            ).alias("priority"),
        ),
    )
    return F.filter(entries, lambda e: e["loc"].isNotNull())


def sitemap_index_locs(xml: Column | str) -> Column:
    """Child sitemap URLs of a ``<sitemapindex>`` document, as
    ``array<string>`` (entity-decoded, CDATA-unwrapped) — feed them
    back through the fetcher to recurse one level; the index/urlset
    split is the protocol's own pagination (50 000 URLs / 50 MB per
    file), so recursion depth is 1 by spec."""
    blocks = F.regexp_extract_all(
        _strip_cdata(_c(xml)), F.lit(_SITEMAP_BLOCK), 1
    )
    return F.filter(
        F.transform(blocks, lambda b: _field(b, "loc")),
        lambda u: u.isNotNull(),
    )


def is_sitemap_index(xml: Column | str) -> Column:
    """Whether the document is a ``<sitemapindex>`` (vs a urlset) —
    routes a fetched sitemap body to :func:`sitemap_index_locs` or
    :func:`sitemap_entries`."""
    return _c(xml).rlike(r"(?s)<\s*sitemapindex[\s>]")


def fetch_plan(
    frontier: DataFrame,
    url_col: str,
    delays: DataFrame | None = None,
    default_delay: float = 1.0,
    max_per_host: int | None = None,
    host_col: str = "host",
    delay_col: str = "crawl_delay",
) -> DataFrame:
    """Schedule the frontier into per-host polite fetch order: adds
    ``host``, ``fetch_seq`` (1-based position in the host's queue,
    deterministic — ordered by URL) and ``fetch_offset_s`` (seconds
    after the host's first fetch: ``(fetch_seq - 1) × delay``), the
    columns a fetcher needs to pace itself per RFC-politeness without
    any coordination beyond partitioning by host.

    ``delays`` is an optional per-host dimension (``host_col``,
    ``delay_col`` — e.g. ``robots_crawl_delay`` over the robots
    dimension); hosts absent from it (or with NULL/non-positive
    delay) pace at ``default_delay``. ``max_per_host`` caps each
    host's slice of this wave — the per-domain crawl budget; the
    overflow simply stays in the frontier store for the next wave.

    Scale shape: ONE shuffle (hash by host) + a running row_number —
    no frame buffering; the delay dimension broadcasts. Host skew is
    the politeness constraint itself: a million-URL host serializes at
    the fetcher regardless, and ``max_per_host`` bounds what one wave
    even carries.
    """
    host = url_host(F.col(url_col))
    with_host = frontier.withColumn("host", host)
    if delays is not None:
        dim = (
            delays.groupBy(F.lower(F.col(host_col)).alias("__d_host"))
            .agg(F.max(F.col(delay_col)).alias("__delay"))
        )
        with_host = with_host.join(
            F.broadcast(dim), F.col("host") == F.col("__d_host"), "left"
        ).drop("__d_host")
    else:
        with_host = with_host.withColumn(
            "__delay", F.lit(None).cast("double")
        )
    delay = F.when(
        F.col("__delay").isNotNull() & (F.col("__delay") > 0),
        F.col("__delay"),
    ).otherwise(F.lit(float(default_delay)))
    w = Window.partitionBy("host").orderBy(F.col(url_col))
    planned = (
        with_host.withColumn("fetch_seq", F.row_number().over(w))
        .withColumn(
            "fetch_offset_s",
            ((F.col("fetch_seq") - F.lit(1)) * delay).cast("double"),
        )
        .drop("__delay")
    )
    if max_per_host is not None:
        planned = planned.where(F.col("fetch_seq") <= int(max_per_host))
    return planned
