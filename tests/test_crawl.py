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


# --- frontier store: persistent visited-URL set (sixth store family) --------


def _add_wave(spark, in_dir, name, urls, ts="2024-01-01 00:00:00"):
    rows = [(u, ts) for u in urls]
    spark.createDataFrame(rows, "url string, ts string").selectExpr(
        "url", "cast(ts as timestamp) as ts"
    ).coalesce(1).write.parquet(str(in_dir / name))


def _run_frontier(spark, in_dir, store, ckpt, **kw):
    from eel_spark.streaming import frontier_store_sink

    urls = (
        spark.readStream.schema("url string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "*"))
    )
    q = frontier_store_sink(urls, store, ckpt, ts_col="ts", **kw)
    q.awaitTermination(120)


def test_frontier_store_cross_wave_and_replay(spark, tmp_path):
    import os

    in_dir = tmp_path / "fs_in"
    in_dir.mkdir()
    store = str(tmp_path / "fs_store")
    ckpt = str(tmp_path / "fs_ckpt")

    wave1 = [
        "http://a.example/p/1",
        "http://a.example/p/1?utm_source=x",   # same canonical key
        "http://a.example/p/2/",               # folds to /p/2
        "not a url at all",                    # raw-keyed, still admitted
    ]
    _add_wave(spark, in_dir, "w1", wave1)
    _run_frontier(spark, in_dir, store, ckpt)
    got = spark.read.parquet(store)
    keys1 = {r["url_key"] for r in got.collect()}
    assert len(keys1) == 3  # decorated variant folded
    # MIN-url representative: deterministic intra-wave pick
    rep = {r["url_key"]: r["url"] for r in got.collect()}
    assert rep["http://a.example/p/1"] == "http://a.example/p/1"
    assert got.where("first_seen is null").count() == 0

    wave2 = [
        "http://a.example/p/2?utm_medium=y",   # seen in wave1 -> suppressed
        "http://a.example/p/3",                # fresh
        "not a url at all",                    # raw re-offer -> suppressed
        "also not a url",                      # distinct garbage -> admitted
    ]
    _add_wave(spark, in_dir, "w2", wave2)
    _run_frontier(spark, in_dir, store, ckpt)
    rows = spark.read.parquet(store).collect()
    assert len(rows) == 5
    assert {r["url"] for r in rows if r["batch_id"] == 1} == {
        "http://a.example/p/3", "also not a url",
    }

    # replay: drop the latest commit marker -> batch re-runs; the store
    # must neither lose nor duplicate rows (dynamic overwrite + the
    # exclude-own-batch history rule)
    commits = sorted(
        c for c in os.listdir(os.path.join(ckpt, "commits"))
        if not c.startswith(".")
    )
    os.remove(os.path.join(ckpt, "commits", commits[-1]))
    crc = os.path.join(ckpt, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    _run_frontier(spark, in_dir, store, ckpt)
    replayed = spark.read.parquet(store).collect()
    assert len(replayed) == 5
    assert {r["url"] for r in replayed} == {
        "http://a.example/p/1", "http://a.example/p/2/", "not a url at all",
        "http://a.example/p/3", "also not a url",
    }


def test_frontier_unseen_batch_probe(spark, tmp_path):
    from eel_spark.operators.crawl import frontier_admit_batch, frontier_unseen

    store = str(tmp_path / "fu_store")
    seed = spark.createDataFrame(
        [(f"http://h.example/p/{i}",) for i in range(50)], "url: string"
    )
    frontier_admit_batch(seed, store, 0)
    cand = spark.createDataFrame(
        [(f"http://h.example/p/{i}?utm_source=x",) for i in range(40, 60)]
        + [(None,)],
        "url: string",
    )
    out = frontier_unseen(cand, store)
    got = sorted(r["url"] for r in out.collect())
    # 40..49 seen (decoration folds), 50..59 fresh, NULL dropped
    assert got == sorted(
        f"http://h.example/p/{i}?utm_source=x" for i in range(50, 60)
    )
    # empty store: everything (non-NULL) passes
    out2 = frontier_unseen(cand, str(tmp_path / "absent"))
    assert out2.count() == 21 - 1


def test_frontier_exact_string_membership_not_hash(spark, tmp_path):
    # kp buckets (64) MUST collide across 300 distinct URLs; every URL
    # is still admitted — the hash routes, the string decides
    from eel_spark.operators.crawl import frontier_admit_batch

    store = str(tmp_path / "fx_store")
    a = spark.createDataFrame(
        [(f"http://h.example/a/{i}",) for i in range(150)], "url: string"
    )
    b = spark.createDataFrame(
        [(f"http://h.example/b/{i}",) for i in range(150)], "url: string"
    )
    frontier_admit_batch(a, store, 0)
    frontier_admit_batch(b, store, 1)
    df = spark.read.parquet(store)
    assert df.count() == 300
    assert df.select("kp").distinct().count() < 100  # buckets really shared


def test_frontier_store_maintenance_family(spark, tmp_path):
    from eel_spark.operators.crawl import frontier_admit_batch
    from eel_spark.operators.maintenance import (
        detect_store_type,
        maintain,
        store_maintenance_report,
    )

    store = str(tmp_path / "fm_store")
    for b in range(4):
        wave = spark.createDataFrame(
            [(f"http://h.example/w{b}/{i}",) for i in range(20)],
            "url: string",
        )
        frontier_admit_batch(wave, store, b)
    assert detect_store_type(spark, store) == "frontier"
    rep = store_maintenance_report(spark, store).first()
    assert rep["store_type"] == "frontier"
    assert rep["n_batches"] == 4
    assert rep["has_compacted_generation"] is False

    res = maintain(spark, store, max_batches=2)
    assert res["action"] == "compacted"
    assert res["after"]["n_batches"] == 0
    assert res["after"]["has_compacted_generation"] is True
    df = spark.read.parquet(store)
    assert df.count() == 80
    assert df.select("batch_id").distinct().collect()[0]["batch_id"] == -1

    # post-compaction: old URLs still suppressed, fresh admitted
    mixed = spark.createDataFrame(
        [("http://h.example/w0/0",), ("http://h.example/new/1",)],
        "url: string",
    )
    frontier_admit_batch(mixed, store, 4)
    assert spark.read.parquet(store).count() == 81


def test_frontier_sink_maintain_every_cadence(spark, tmp_path):
    in_dir = tmp_path / "fc_in"
    in_dir.mkdir()
    store = str(tmp_path / "fc_store")
    ckpt = str(tmp_path / "fc_ckpt")
    for b in range(4):
        _add_wave(
            spark, in_dir, f"w{b}",
            [f"http://h.example/w{b}/{i}" for i in range(10)],
        )
    _run_frontier(spark, in_dir, store, ckpt, maintain_every=2)
    df = spark.read.parquet(store)
    assert df.count() == 40
    # the cadence fired at least once: a compacted generation exists
    # and the live batch depth stayed under the wave count
    gens = {r["batch_id"] for r in df.select("batch_id").distinct().collect()}
    assert -1 in gens
    assert len(gens - {-1}) < 4


def test_frontier_compactor_lease_loser_raises(spark, tmp_path):
    import pytest as _pytest

    from eel_spark.operators.crawl import (
        compact_frontier_store,
        frontier_admit_batch,
    )
    from eel_spark.operators.maintenance import (
        acquire_store_lease,
        release_store_lease,
    )

    store = str(tmp_path / "fl_store")
    frontier_admit_batch(
        spark.createDataFrame([("http://h.example/x",)], "url: string"),
        store, 0,
    )
    lease = None
    try:
        import threading

        holder_err = []

        def hold():
            nonlocal lease
            lease = acquire_store_lease(spark, store, "other_writer")

        t = threading.Thread(target=hold)
        t.start(); t.join()
        with _pytest.raises(RuntimeError, match="active writer"):
            compact_frontier_store(spark, store)
    finally:
        release_store_lease(spark, lease)
