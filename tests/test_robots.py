"""robots.txt stack (RFC 9309): parity against an independent Python
reference matcher over a hostile case table, group-selection grammar,
wildcard/anchor semantics, crawl-delay / sitemap extraction, and the
frontier filter's broadcast plan."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from eel_spark.functions import robots as R


# --- independent reference implementation (written from RFC 9309, not
# from the library code): longest-octet match, Allow wins ties ----------------

def _ref_match(pattern: str, path: str) -> bool:
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "^" + ".*".join(re.escape(p) for p in body.split("*"))
    if anchored:
        rx += "$"
    return re.search(rx, path) is not None


def _ref_allowed(rules: list[tuple[bool, str]], path: str) -> bool:
    best_len, best_allow = -1, True
    for allow, pattern in rules:
        if not pattern or not _ref_match(pattern, path):
            continue
        plen = len(pattern.encode())
        if plen > best_len or (plen == best_len and allow and not best_allow):
            best_len, best_allow = plen, allow
    return best_allow


def _spark_verdicts(spark, body: str, agent: str, urls: list[str]) -> list[bool]:
    df = spark.createDataFrame([(u,) for u in urls], "url: string")
    rules = R.robots_rules(F.lit(body), agent)
    out = df.select(R.robots_allowed(rules, F.col("url")).alias("ok"))
    return [r["ok"] for r in out.collect()]


# --- RFC 9309 §2.2.2-shaped hostile rule/path table --------------------------

HOSTILE_RULES = [
    (False, "/fish"),          # prefix
    (True, "/fish/"),          # longer allow under it
    (False, "/*.php"),         # leading-wildcard extension block
    (True, "/folder/*.php$"),  # anchored allow, longer
    (False, "/a/b$"),          # exact-path block
    (True, "/a"),              # short allow (loses to longer matches)
    (False, "/q?x="),          # query participates in matching
    (False, "/tie/x"),         # 6-octet disallow ...
    (True, "/tie/*"),          # ... vs 6-octet allow: allow wins the tie
    (False, "/esc(1)+[2]"),    # regex metachars are literal
    (False, "/uni/é"),    # multi-byte octet length
]

HOSTILE_PATHS = [
    "/", "/fish", "/fish.html", "/fish/", "/fish/salmon",
    "/x.php", "/x.php?y=1", "/folder/x.php", "/folder/x.php?q=1",
    "/a", "/a/b", "/a/b/c", "/q?x=1", "/q", "/tie/x", "/tie/y",
    "/esc(1)+[2]", "/esc1", "/uni/é/x", "/PHP/x.PHP",
]


def test_hostile_parity_vs_reference(spark):
    body = "User-agent: eelbot\n" + "\n".join(
        ("Allow: " if allow else "Disallow: ") + p
        for allow, p in HOSTILE_RULES
    )
    urls = [f"http://h.example{p}" for p in HOSTILE_PATHS]
    got = _spark_verdicts(spark, body, "eelbot", urls)
    want = [_ref_allowed(HOSTILE_RULES, p) for p in HOSTILE_PATHS]
    assert got == want, dict(zip(HOSTILE_PATHS, zip(got, want)))


def test_rfc_grouping_grammar(spark):
    # exact groups merge (case-insensitive token, version suffix split
    # off); * group suppressed when an exact group exists; rules before
    # any user-agent line are ignored; empty Disallow is a no-op;
    # comments and CRLF survive
    body = (
        "Disallow: /orphan/\r\n"           # before any group: ignored
        "User-agent: GoogleBot\r\n"
        "User-agent: EelBot/2.1 (+http://eel.example)\r\n"
        "Disallow: /private/  # comment\r\n"
        "\r\n"
        "User-agent: *\r\n"
        "Disallow: /\r\n"
        "\r\n"
        "User-agent: eelbot\r\n"           # second exact group merges
        "Disallow: /extra/\r\n"
        "Disallow:\r\n"                    # empty value: no effect
    )
    urls = [
        "http://h.example/orphan/x",   # orphan rule ignored -> allowed
        "http://h.example/private/x",  # exact group blocks
        "http://h.example/extra/x",    # merged second group blocks
        "http://h.example/other",      # * group does NOT apply
    ]
    assert _spark_verdicts(spark, body, "eelbot", urls) == [
        True, False, False, True,
    ]
    # an unknown agent falls back to the * group
    assert _spark_verdicts(spark, body, "otherbot", urls) == [
        False, False, False, False,
    ]


def test_blank_lines_do_not_split_an_agent_run(spark):
    # RFC 9309 ABNF: startgrouplines separated only by empty lines are
    # ONE group — so this body is a single {eelbot, *} group and the
    # Disallow binds eelbot too (the intuitive "two groups" reading is
    # wrong per spec and per the reference parsers)
    body = "User-agent: eelbot\n\nUser-agent: *\nDisallow: /\n"
    assert _spark_verdicts(
        spark, body, "eelbot", ["http://h.example/x"]
    ) == [False]


def test_exact_group_with_no_rules_means_allow_all(spark):
    # a NON-group record (sitemap) ends the agent run, so here the
    # eelbot group really is empty: allow-all, NOT fall-through to *
    body = (
        "User-agent: eelbot\nSitemap: http://h.example/s.xml\n"
        "User-agent: *\nDisallow: /\n"
    )
    assert _spark_verdicts(
        spark, body, "eelbot", ["http://h.example/x"]
    ) == [True]


def test_no_rules_and_null_body_mean_allowed(spark):
    df = spark.createDataFrame([("http://h.example/x",)], "url: string")
    empty = df.select(
        R.robots_allowed(
            R.robots_rules(F.lit(""), "eelbot"), F.col("url")
        ).alias("ok")
    ).first()["ok"]
    null_body = df.select(
        R.robots_allowed(
            R.robots_rules(F.lit(None).cast("string"), "eelbot"),
            F.col("url"),
        ).alias("ok")
    ).first()["ok"]
    assert empty is True and null_body is True


def test_path_query_extraction(spark):
    # fragment dropped, authority stripped, empty path -> '/',
    # scheme-less input starts at its first '/'
    body = "User-agent: *\nDisallow: /b?x\nDisallow: /frag\n"
    urls = [
        "http://h.example",            # empty path -> '/': allowed
        "http://h.example/b?x=1",      # query matched: blocked
        "http://h.example/frag#sec",   # fragment dropped: blocked
        "h.example/b?x=1",             # scheme-less: still blocked
    ]
    assert _spark_verdicts(spark, body, "any", urls) == [
        True, False, False, False,
    ]


def test_crawl_delay_group_scoped(spark):
    body = (
        "User-agent: eelbot\nCrawl-delay: 2.5\nDisallow: /x\n\n"
        "User-agent: *\nCrawl-delay: 10\n"
    )
    df = spark.range(1)
    got = df.select(
        R.robots_crawl_delay(F.lit(body), "eelbot").alias("mine"),
        R.robots_crawl_delay(F.lit(body), "otherbot").alias("star"),
        R.robots_crawl_delay(F.lit("User-agent: *\nDisallow: /"), "x").alias("none"),
        R.robots_crawl_delay(
            F.lit("User-agent: *\nCrawl-delay: soon"), "x"
        ).alias("junk"),
    ).first()
    assert got["mine"] == 2.5
    assert got["star"] == 10.0
    assert got["none"] is None
    assert got["junk"] is None  # malformed value ignored, not an error


def test_sitemaps_global(spark):
    body = (
        "User-agent: a\nDisallow: /\n"
        "Sitemap: https://h.example/sitemap.xml\n"
        "User-agent: b\n"
        "SITEMAP: https://h.example/s2.xml.gz\n"
        "Sitemap:\n"  # empty: skipped
    )
    got = spark.range(1).select(
        R.robots_sitemaps(F.lit(body)).alias("s")
    ).first()["s"]
    assert got == [
        "https://h.example/sitemap.xml",
        "https://h.example/s2.xml.gz",
    ]


@pytest.fixture(scope="module")
def frontier(spark):
    rows = [
        (f"http://site{i % 3}.example/p{i % 4}/d{i}", i) for i in range(24)
    ]
    return spark.createDataFrame(rows, "url: string, i: long")


def test_filter_by_robots_end_to_end(spark, frontier):
    robots = spark.createDataFrame(
        [
            ("site0.example", "User-agent: eelbot\nDisallow: /p1/\n"),
            ("SITE1.example", "User-agent: *\nDisallow: /\nAllow: /p2/\n"),
            # duplicate host row: collapsed deterministically (longest
            # body wins), never multiplied through the join
            ("site1.example", "# stale dup"),
            ("dead.example", None),  # fetched, no body -> allow-all
        ],
        "host: string, robots_body: string",
    )
    out = R.filter_by_robots(frontier, "url", robots, agent="eelbot")
    kept = sorted(r["url"] for r in out.collect())
    for u in kept:
        if "site0" in u:
            assert "/p1/" not in u
        if "site1" in u:
            assert "/p2/" in u
    # site2 has no robots row: kept wholesale by default
    assert sum("site2" in u for u in kept) == 8
    assert out.columns == frontier.columns  # helper columns dropped

    strict = R.filter_by_robots(
        frontier, "url", robots, agent="eelbot", keep_unknown_hosts=False
    )
    assert strict.where(F.col("url").contains("site2")).count() == 0


def test_filter_by_robots_plan_broadcasts(spark, frontier):
    robots = spark.createDataFrame(
        [("site0.example", "User-agent: *\nDisallow: /p1/")],
        "host: string, robots_body: string",
    )
    plan = R.filter_by_robots(
        frontier, "url", robots, agent="eelbot"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
