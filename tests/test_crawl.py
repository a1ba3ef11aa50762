"""Crawl scheduling operators: sitemap extraction (sitemaps.org) and
per-host fetch planning — hand-computed expectations, malformed-input
tolerance, and the single-shuffle/broadcast plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eel_spark.operators import crawl as C

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://h.example/a?x=1&amp;y=2</loc>
    <lastmod>2024-01-05</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc><![CDATA[https://h.example/cdata?a=1&b=2]]></loc></url>
  <url>
    <loc>
      https://h.example/spaced
    </loc>
    <priority>not-a-number</priority>
  </url>
  <url><lastmod>2024-01-01</lastmod></url>
  <url><loc></loc></url>
</urlset>"""

INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://h.example/sitemap-1.xml.gz</loc>
    <lastmod>2024-01-01</lastmod></sitemap>
  <sitemap><loc>https://h.example/sitemap-2.xml</loc></sitemap>
  <sitemap></sitemap>
</sitemapindex>"""


def _entries(spark, xml):
    return spark.range(1).select(
        C.sitemap_entries(F.lit(xml)).alias("e")
    ).first()["e"]


def test_sitemap_entries(spark):
    got = _entries(spark, URLSET)
    # no-loc and empty-loc entries dropped
    assert len(got) == 3
    assert got[0]["loc"] == "https://h.example/a?x=1&y=2"  # entity-decoded
    assert got[0]["lastmod"] == "2024-01-05"
    assert got[0]["changefreq"] == "daily"
    assert got[0]["priority"] == 0.8
    assert got[1]["loc"] == "https://h.example/cdata?a=1&b=2"  # CDATA
    assert got[1]["lastmod"] is None and got[1]["priority"] is None
    assert got[2]["loc"] == "https://h.example/spaced"  # trimmed
    assert got[2]["priority"] is None  # junk priority -> NULL, not error


def test_sitemap_entries_tolerates_truncation(spark):
    torn = URLSET[: URLSET.index("cdata")]  # tear mid-second-entry
    got = _entries(spark, torn)
    assert [e["loc"] for e in got] == ["https://h.example/a?x=1&y=2"]
    assert _entries(spark, "") == []
    assert _entries(spark, "not xml at all") == []


def test_sitemap_index(spark):
    row = spark.range(1).select(
        C.is_sitemap_index(F.lit(INDEX)).alias("i"),
        C.is_sitemap_index(F.lit(URLSET)).alias("u"),
        C.sitemap_index_locs(F.lit(INDEX)).alias("locs"),
    ).first()
    assert row["i"] is True and row["u"] is False
    assert row["locs"] == [
        "https://h.example/sitemap-1.xml.gz",
        "https://h.example/sitemap-2.xml",
    ]


@pytest.fixture(scope="module")
def frontier(spark):
    rows = [(f"http://site{i % 3}.example/p/{i:03d}",) for i in range(30)]
    return spark.createDataFrame(rows, "url: string")


def test_fetch_plan_offsets_and_delays(spark, frontier):
    delays = spark.createDataFrame(
        [
            ("site0.example", 2.0),
            ("SITE1.example", None),   # NULL delay -> default
            ("site2.example", -5.0),   # non-positive -> default
        ],
        "host: string, crawl_delay: double",
    )
    out = C.fetch_plan(
        frontier, "url", delays=delays, default_delay=0.5
    ).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r)
    assert set(by_host) == {f"site{i}.example" for i in range(3)}
    for host, rows in by_host.items():
        rows.sort(key=lambda r: r["fetch_seq"])
        # deterministic: seq follows URL order, offsets are arithmetic
        urls = [r["url"] for r in rows]
        assert urls == sorted(urls)
        assert [r["fetch_seq"] for r in rows] == list(range(1, 11))
        step = 2.0 if host == "site0.example" else 0.5
        for r in rows:
            assert r["fetch_offset_s"] == (r["fetch_seq"] - 1) * step


def test_fetch_plan_defaults_and_budget(spark, frontier):
    out = C.fetch_plan(frontier, "url", default_delay=1.0, max_per_host=4)
    assert out.count() == 12  # 3 hosts x 4
    assert out.groupBy("host").count().where("count != 4").count() == 0
    assert out.where(F.col("fetch_seq") > 4).count() == 0


def test_fetch_plan_single_shuffle_and_broadcast(spark, frontier):
    delays = spark.createDataFrame(
        [("site0.example", 2.0)], "host: string, crawl_delay: double"
    )
    plan = C.fetch_plan(
        frontier, "url", delays=delays
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the FRONTIER moves exactly once: the hash-by-host exchange the
    # window needs (the delay dim has its own tiny pre-broadcast
    # aggregate exchange, which never touches frontier rows)
    assert plan.count("hashpartitioning(host") == 1, plan
