"""Crawl frontier + content extraction — the web-crawl FRONT of the
LLM-data pipeline, composed from scan-side extractors and bounded-state
streaming:

.warc.gz archives → WarcSource → staged parquet pages (parse each wave
once — the WARC ingestion contract), then:

pages (HTML) ──┬─ content arm: extract_main_content → title/lang →
               │  quality-gated clean-text corpus (what corpus_prep.py
               │  consumes as its input)
               └─ frontier arm: html_links → explode → resolve_url
                  (relative hrefs absolutized against the page URL) →
                  canonical_url-keyed streaming URL dedup →
                  deduplicated frontier of never-seen-this-window URLs
                  (what the fetcher crawls next), with domain blocking
                  on top

Scale shape: both arms are per-row Catalyst expressions over the page
stream (no shuffle to discover outlinks or strip markup); the only
stateful step is the watermark-bounded canonical-URL dedup, whose state
is O(urls per watermark window), never O(urls ever seen). At 100 TB the
frontier sink feeds the fetch scheduler and the content sink feeds
corpus_prep — this script is the missing first stage stitched onto the
existing pipeline examples.

Usage: python examples/crawl_frontier.py [sf_dir]
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from eel_spark.functions.robots import (
    filter_by_robots,
    robots_crawl_delay,
    robots_sitemaps,
)
from eel_spark.operators.crawl import fetch_plan, sitemap_entries
from eel_spark.functions.text import (
    canonical_url,
    extract_main_content,
    filter_blocked_hosts,
    gopher_keep,
    html_lang,
    html_links,
    html_title,
    resolve_url,
)
from eel_spark.session import get_session
from eel_spark.streaming import streaming_url_dedup

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_session("crawl-frontier-example")
work = tempfile.mkdtemp(prefix="crawl_frontier_")

# --- synthesize a crawl: each document becomes an HTML page whose
# outlinks point at neighbor "pages" the way real pages do — RELATIVE
# hrefs (dir-relative with ../, ./-decorated, protocol-relative) in
# several decorated variants that all canonicalize to the same URL
# (tracking params, trailing slash) plus one blocked-domain absolute
# link — the exact noise a frontier must resolve and fold away ---------------
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
page = F.concat(
    F.lit('<html lang="en-US"><head><title>Page '),
    F.col("doc_id").cast("string"),
    F.lit("</title><script>var x = '<a href=\"https://js.example/no\">';"
          "</script></head><body><nav>"),
    # four variants of the SAME next-page link (relative-with-../,
    # ./-relative + tracking, protocol-relative + tracking) + one
    # distinct + one blocked; page URL is http://crawl.example/p/{id}
    F.lit('<a href="../p/'),
    ((F.col("doc_id") + 1) % 500).cast("string"),
    F.lit('/">next</a> <a href="./'),
    ((F.col("doc_id") + 1) % 500).cast("string"),
    F.lit('?utm_source=feed">next-tracked</a> <a href="//crawl.example/p/'),
    ((F.col("doc_id") + 1) % 500).cast("string"),
    F.lit('?utm_campaign=x">next-proto-rel</a> <a href="'),
    ((F.col("doc_id") + 2) % 500).cast("string"),
    F.lit('">skip</a> <a href="http://ads.example/click">ad</a></nav><p>'),
    F.coalesce(F.col("text"), F.lit("")),
    F.lit("</p></body></html>"),
)
pages = docs.select(
    "doc_id",
    F.lit("2024-01-01 00:00:00").cast("timestamp").alias("fetched_ts"),
    page.alias("html"),
)

# the fetcher delivers the waves as .warc.gz archives (the format real
# crawls ship in — Common Crawl, Heritrix): pack each wave into one
# archive of HTTP response records
from eel_spark.sources.warc import WarcSource, write_warc

warc_dir = os.path.join(work, "warc")
os.makedirs(warc_dir)
for i in range(3):  # three crawl waves
    wave = pages.where(F.col("doc_id") % 3 == i).collect()  # example-scale
    write_warc(
        [
            {
                "warc_type": "response",
                "target_uri": f"http://crawl.example/p/{r['doc_id']}",
                "content_type": "application/http;msgtype=response",
                "payload": (
                    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                    + r["html"].encode()
                ),
            }
            for r in wave
        ],
        os.path.join(warc_dir, f"wave{i}.warc.gz"),
        compress=True,
    )

# --- ingest: WARC records → staged parquet pages (the documented WARC
# contract: parse each wave ONCE, stage to parquet, stream downstream
# from the boundary — caching.stage's write/re-read discipline applied
# at the ingestion edge) ----------------------------------------------------
records = WarcSource(f"{warc_dir}/*.warc.gz").to_datastream(spark).df
parsed = records.where(
    (F.col("warc_type") == "response") & (F.col("http_status") == 200)
    & (F.col("content_type") == "text/html")
).select(
    F.regexp_extract("target_uri", r"/p/(\d+)$", 1).cast("long").alias("doc_id"),
    F.col("target_uri").alias("url"),  # the resolve base for outlinks
    F.lit("2024-01-01 00:00:00").cast("timestamp").alias("fetched_ts"),
    F.decode("payload", "UTF-8").alias("html"),
)
src = os.path.join(work, "pages")
# ONE action writes all waves (partitionBy keeps the per-wave dir
# layout for maxFilesPerTrigger pacing): a per-wave filter loop would
# re-run the binaryFile scan + Python parse once per wave — the exact
# parse-N-times cost the staging contract exists to avoid (r13 review)
(
    parsed.withColumn("w", F.col("doc_id") % 3)
    .repartition(3, "w")
    .write.partitionBy("w")
    .parquet(src)
)
print(f"ingested {spark.read.parquet(f'{src}/w=*').count()} pages "
      f"from {len(os.listdir(warc_dir))} WARC archives")

stream = (
    spark.readStream.schema(
        "doc_id BIGINT, url STRING, fetched_ts TIMESTAMP, html STRING"
    )
    .option("maxFilesPerTrigger", 1)
    .parquet(f"{src}/*")
)

# --- content arm: clean text + metadata, quality-gated ---------------------
content = stream.select(
    "doc_id",
    html_title("html").alias("title"),
    html_lang("html").alias("lang"),
    extract_main_content("html").alias("text"),
).where(gopher_keep("text", min_words=10, min_stopword_hits=1))
content_q = (
    content.writeStream.format("parquet")
    .option("path", os.path.join(work, "corpus"))
    .option("checkpointLocation", os.path.join(work, "ck_corpus"))
    .trigger(availableNow=True)
    .start()
)

# --- frontier arm: outlinks → resolve against the page URL →
# canonical streaming dedup. resolve_url gets its OWN projection (see
# its composition note) — still one scan-side stage, no shuffle to
# absolutize the frontier --------------------------------------------------
links = stream.select(
    "fetched_ts",
    F.col("url").alias("page_url"),
    F.explode(html_links("html")).alias("href"),
).select(
    "fetched_ts", resolve_url("page_url", F.col("href")).alias("url")
)
frontier = streaming_url_dedup(links, "url", ts_col="fetched_ts")
frontier_q = (
    frontier.writeStream.format("parquet")
    .option("path", os.path.join(work, "frontier"))
    .option("checkpointLocation", os.path.join(work, "ck_frontier"))
    .trigger(availableNow=True)
    .start()
)
assert content_q.awaitTermination(400), "content arm did not finish"
assert frontier_q.awaitTermination(400), "frontier arm did not finish"

# --- audit the frontier ----------------------------------------------------
out = spark.read.parquet(os.path.join(work, "frontier"))
n_raw = spark.read.parquet(f"{src}/*").select(
    F.explode(html_links("html"))
).count()
n_frontier = out.count()
print(f"outlinks: {n_raw} raw -> {n_frontier} after resolve + canonical dedup")
# decorated variants of the same page folded; the js-string link never
# entered (html_links strips script subtrees); every frontier entry is
# ABSOLUTE — the relative hrefs resolved against their page URL
assert n_frontier < n_raw
assert out.where(F.col("url").contains("js.example")).count() == 0
assert out.where(~F.col("url").startswith("http://")).count() == 0
crawlable = filter_blocked_hosts(out, "url", ["ads.example"])
n_crawl = crawlable.count()
print(f"frontier after domain blocking: {n_crawl} urls")
assert crawlable.where(F.col("url").contains("ads.example")).count() == 0

# --- robots gate: the per-host robots.txt dimension (fetched alongside
# the crawl) filters the frontier by RFC 9309 rules before scheduling —
# crawl.example's robots disallows the /p/4* shard for everyone but
# allows eelbot the exact pages ending in 0 (wildcard + anchor rules,
# group precedence: the exact eelbot group overrides the * group) -----------
robots_dim = spark.createDataFrame(
    [
        (
            "crawl.example",
            "User-agent: eelbot\nDisallow: /p/4\nAllow: /p/4*0$\n"
            "Crawl-delay: 1\nSitemap: http://crawl.example/sitemap.xml\n"
            "User-agent: *\nDisallow: /\n",
        ),
    ],
    "host: string, robots_body: string",
)
# schedule the CANONICAL form (robots patterns match the literal path,
# so decoration must fold before the verdict — the module's documented
# percent-encoding/normalization contract)
sched = crawlable.select(canonical_url("url").alias("url"))
polite = filter_by_robots(sched, "url", robots_dim, agent="eelbot")
n_polite = polite.count()
print(f"frontier after robots.txt: {n_polite} urls")
assert n_polite == 400  # /p/4-shard blocked except the *0$ allows
blocked_shard = polite.where(F.col("url").rlike(r"/p/4\d*$"))
assert blocked_shard.where(~F.col("url").rlike("0$")).count() == 0
assert n_polite < n_crawl
delay = robots_dim.select(
    robots_crawl_delay("robots_body", "eelbot").alias("d")
).first()["d"]
assert delay == 1.0  # feeds the fetch scheduler's per-host pacing

# --- sitemap discovery: robots.txt advertised a sitemap; the fetcher
# retrieves it and its <loc> entries union into the frontier (same
# canonical-dedup treatment as outlinks) ------------------------------------
sitemap_url = robots_dim.select(
    F.explode(robots_sitemaps("robots_body")).alias("u")
).first()["u"]
assert sitemap_url == "http://crawl.example/sitemap.xml"
sitemap_xml = (
    '<?xml version="1.0"?><urlset '
    'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    + "".join(
        f"<url><loc>http://crawl.example/p/{i}?utm_source=map</loc>"
        f"<lastmod>2024-01-0{1 + i % 9}</lastmod></url>"
        for i in range(500, 510)  # 10 pages the outlink arm never saw
    )
    + "</urlset>"
)
mapped = (
    spark.createDataFrame([(sitemap_xml,)], "xml: string")
    .select(F.explode(sitemap_entries("xml")).alias("e"))
    .select(canonical_url(F.col("e.loc")).alias("url"))
)
n_map = mapped.count()
assert n_map == 10
frontier_all = polite.union(mapped).distinct()
print(f"frontier after sitemap union: {frontier_all.count()} urls")

# --- fetch plan: per-host polite ordering + pacing offsets, budgeted ------
delays_dim = robots_dim.select(
    "host", robots_crawl_delay("robots_body", "eelbot").alias("crawl_delay")
)
plan = fetch_plan(
    frontier_all, "url", delays=delays_dim, default_delay=0.5,
    max_per_host=50,
)
waves = plan.collect()
assert len(waves) == 50  # one host, budget caps the wave
assert {r["host"] for r in waves} == {"crawl.example"}
for r in waves:  # Crawl-delay: 1 → offsets are 0,1,2,… in URL order
    assert r["fetch_offset_s"] == float(r["fetch_seq"] - 1)
print(f"fetch plan: {len(waves)} fetches this wave, "
      f"last at +{max(r['fetch_offset_s'] for r in waves):.0f}s")

# --- frontier STORE: persist this wave's scheduled URLs so the NEXT
# crawl round never re-fetches them — the no-horizon complement of the
# in-window streaming dedup above (watermark state forgets; the store
# is parquet and does not). A re-offer of the same pages (decorated
# differently) admits zero new rows. --------------------------------------
from eel_spark.operators.crawl import frontier_admit_batch, frontier_unseen

store = os.path.join(work, "frontier_store")
frontier_admit_batch(polite, store, batch_id=0)
admitted = spark.read.parquet(store).count()
assert admitted == n_polite
reoffer = polite.select(
    F.concat(F.col("url"), F.lit("?utm_source=recrawl")).alias("url")
)
fresh = frontier_unseen(reoffer, store)
assert fresh.count() == 0  # everything already visited
print(f"frontier store: {admitted} urls persisted; re-offer admits 0")

corpus = spark.read.parquet(os.path.join(work, "corpus"))
n_docs = corpus.count()
langs = sorted(
    r["lang"] for r in corpus.select("lang").distinct().collect()
)
print(f"clean corpus: {n_docs} docs, declared langs {langs}")
assert langs == ["en-us"]
assert corpus.where(F.col("title").isNull()).count() == 0

shutil.rmtree(work, ignore_errors=True)
spark.stop()
