"""Text-analysis functions: hand-computed expectations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eel_spark.functions import text as TX


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat and the dog sat in the garden"),          # en
        (1, "der hund und die katze ist nicht auf dem tisch"), # de
        (2, "el perro y el gato es una mascota con pelo"),     # es
        (3, "xyzzy plugh qwerty"),                             # und
        (4, "  spaced   out   text  "),
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_token_count(docs):
    out = {r["doc_id"]: r["n"] for r in docs.select("doc_id", TX.token_count("text").alias("n")).collect()}
    assert out[0] == 9
    assert out[3] == 3
    assert out[4] == 3  # empties filtered


def test_whitespace_ratio(docs):
    r = docs.filter("doc_id = 0").select(TX.whitespace_ratio("text").alias("w")).first()["w"]
    text = "the cat and the dog sat in the garden"
    assert r == text.count(" ") / len(text)


def test_lang_id(docs):
    out = {r["doc_id"]: r["lang"] for r in docs.select("doc_id", TX.lang_id("text").alias("lang")).collect()}
    assert out[0] == "en"
    assert out[1] == "de"
    assert out[2] == "es"
    assert out[3] == "und"


def test_normalized_text(spark):
    df = spark.createDataFrame([("  A   B\tC  ",)], "t: string")
    assert df.select(TX.normalized_text("t").alias("n")).first()["n"] == "a b c"


def test_fingerprint_matches_dup(spark):
    df = spark.createDataFrame([("abc def",), ("ABC   DEF",), ("other",)], "t: string")
    fps = [r["f"] for r in df.select(TX.fingerprint(TX.normalized_text("t")).alias("f")).collect()]
    assert fps[0] == fps[1] != fps[2]
    assert len(fps[0]) == 16


def test_quality_score_range(spark):
    df = spark.createDataFrame(
        [("the cat sat on the mat and the dog sat on the rug today",), ("x",)],
        "t: string",
    )
    scores = [r["q"] for r in df.select(
        TX.quality_score("t", TX.LANG_MARKERS["en"]).alias("q")
    ).collect()]
    assert 0.0 <= scores[1] < scores[0] <= 1.0


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([("abcd efghij x",)], "t: string")
    # ceil(4/4)+ceil(6/4)+ceil(1/4) = 1+2+1 = 4
    assert df.select(TX.bpe_ish_token_count("t").alias("n")).first()["n"] == 4


def test_top_token_fraction(spark):
    df = spark.createDataFrame(
        [(0, "a a a b c"), (1, "a b c d"), (2, "")],
        "doc_id: long, t: string",
    )
    out = {r["doc_id"]: r["f"] for r in df.select(
        "doc_id", TX.top_token_fraction("t").alias("f")
    ).collect()}
    assert out[0] == 3 / 5
    assert out[1] == 1 / 4
    assert out[2] == 0.0


def test_top_bigram_fraction(spark):
    # bigrams of "x y x y x": [x y, y x, x y, y x] -> top 'x y' = 2/4
    df = spark.createDataFrame(
        [(0, "x y x y x"), (1, "solo"), (2, "a b")],
        "doc_id: long, t: string",
    )
    out = {r["doc_id"]: r["f"] for r in df.select(
        "doc_id", TX.top_bigram_fraction("t").alias("f")
    ).collect()}
    assert out[0] == 2 / 4
    assert out[1] == 0.0  # <2 tokens, no bigrams
    assert out[2] == 1.0


def test_duplicate_line_fraction(spark):
    df = spark.createDataFrame(
        [
            (0, "buy now\nbuy now\nbuy now\nunique line"),
            (1, "one line only"),
            (2, "a\n\n  \nb"),  # blank lines ignored
        ],
        "doc_id: long, t: string",
    )
    out = {r["doc_id"]: r["f"] for r in df.select(
        "doc_id", TX.duplicate_line_fraction("t").alias("f")
    ).collect()}
    assert out[0] == 2 / 4
    assert out[1] == 0.0
    assert out[2] == 0.0


def test_pii_counts_and_redaction(spark):
    text = (
        "contact alice.smith+hr@example.co.uk or bob@test.io, "
        "server 192.168.0.1, call +1 555-123-4567"
    )
    df = spark.createDataFrame([(text,)], "t: string")
    row = df.select(
        TX.pii_email_count("t").alias("emails"),
        TX.pii_ipv4_count("t").alias("ips"),
        TX.pii_phone_count("t").alias("phones"),
        TX.redact_pii("t").alias("clean"),
    ).first()
    assert row["emails"] == 2
    assert row["ips"] == 1
    assert row["phones"] == 1
    assert row["clean"] == (
        "contact <EMAIL> or <EMAIL>, server <IP>, call <PHONE>"
    )


def test_redact_pii_matches_duckdb_oracle(spark):
    """The PII regexes are restricted to Java∩RE2 syntax so a DuckDB
    oracle can mirror them verbatim — assert engine agreement."""
    duckdb = pytest.importorskip("duckdb")
    texts = [
        "mail x@y.com twice x@y.com",
        "ip 10.0.0.1 then 255.255.255.255 end",
        "call 555 123 4567 now",
        "no pii here at all",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t: string")
    got = [r["c"] for r in df.select(TX.redact_pii("t").alias("c")).collect()]
    con = duckdb.connect()
    for text, spark_out in zip(texts, got):
        (duck_out,) = con.execute(
            "SELECT regexp_replace(regexp_replace(regexp_replace(?, ?, '<EMAIL>', 'g'),"
            " ?, '<IP>', 'g'), ?, '<PHONE>', 'g')",
            [text, TX.PII_EMAIL, TX.PII_IPV4, TX.PII_PHONE],
        ).fetchone()
        assert spark_out == duck_out


def test_text_kernels_total_on_null_and_empty(spark):
    """Every text kernel must be a total function: null/empty documents
    produce NULL or a defined zero, never an ANSI DIVIDE_BY_ZERO crash
    (Spark 4 default) or a silent -1 from size(null)."""
    df = spark.createDataFrame(
        [(1, "hello world hello"), (2, None), (3, ""), (4, "   ")],
        "id long, text string",
    )
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            TX.token_count("text").alias("tc"),
            TX.whitespace_ratio("text").alias("ws"),
            TX.mean_token_length("text").alias("ml"),
            TX.quality_score("text", ["the"]).alias("q"),
            TX.top_token_fraction("text").alias("tf"),
            TX.top_bigram_fraction("text").alias("bf"),
            TX.duplicate_line_fraction("text").alias("dl"),
            TX.lang_id("text").alias("lang"),
            TX.fingerprint("text").alias("fp"),
        ).collect()
    }
    ok = rows[1]
    assert ok["tc"] == 3 and abs(ok["tf"] - 2 / 3) < 1e-9 and ok["q"] >= 0.0
    for rid in (2, 3, 4):
        r = rows[rid]
        assert r["q"] == 0.0, r
        assert r["tf"] == 0.0 and r["bf"] == 0.0 and r["dl"] == 0.0, r
        assert r["lang"] == "und", r
        assert r["ml"] is None or r["ml"] == 0.0, r


def test_url_host_and_registered_domain(spark):
    from eel_spark.functions.text import url_host, url_registered_domain

    df = spark.createDataFrame(
        [
            (1, "https://News.Example.com/a/b?q=1"),
            (2, "http://user:pw@sub.shop.example.co.uk:8080/x"),
            (3, "example.com/plain"),
            (4, "not a url at all"),
            (5, None),
        ],
        "id: long, url: string",
    )
    out = {
        r["id"]: (r["h"], r["d"])
        for r in df.select(
            "id",
            url_host("url").alias("h"),
            url_registered_domain("url").alias("d"),
        ).collect()
    }
    assert out[1] == ("news.example.com", "example.com")
    assert out[2] == ("sub.shop.example.co.uk", "example.co.uk")
    assert out[3] == ("example.com", "example.com")
    assert out[4] == (None, None)      # junk input: no bogus host
    assert out[5] == (None, None)


def test_filter_blocked_hosts(spark):
    from eel_spark.functions.text import filter_blocked_hosts

    df = spark.createDataFrame(
        [
            (1, "https://spam.example.com/x"),      # subdomain of blocked
            (2, "https://example.com/y"),           # blocked exactly
            (3, "https://good.org/z"),
            (4, "https://bad.co.uk/w"),             # ccSLD blocked
            (5, "https://notbad.co.uk/v"),
        ],
        "id: long, url: string",
    )
    kept = {
        r["id"]
        for r in filter_blocked_hosts(
            df, "url", ["Example.com", "bad.co.uk"]
        ).collect()
    }
    assert kept == {3, 5}
    # plan: blocklist is broadcast, corpus not shuffled
    plan = filter_blocked_hosts(df, "url", ["example.com"])._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan[:800]


def test_url_edge_forms_and_blocklist_normalization(spark):
    from eel_spark.functions.text import (
        filter_blocked_hosts,
        url_host,
        url_registered_domain,
    )

    df = spark.createDataFrame(
        [
            (1, "  https://example.com/padded  "),   # whitespace-padded
            (2, "http://example.com./rootdot"),      # trailing-dot FQDN
            (3, "http://1.2.3.4/rawip"),             # IPv4 literal
            (4, "http://5.6.3.4/other"),
        ],
        "id: long, url: string",
    )
    out = {
        r["id"]: (r["h"], r["d"])
        for r in df.select(
            "id",
            url_host("url").alias("h"),
            url_registered_domain("url").alias("d"),
        ).collect()
    }
    assert out[1] == ("example.com", "example.com")
    assert out[2] == ("example.com", "example.com")
    # IP literals pass through whole - no octet slicing
    assert out[3] == ("1.2.3.4", "1.2.3.4")

    # padded/root-dot/raw-IP forms are all blockable; unrelated IPs that
    # share trailing octets are NOT aliased together
    kept = {
        r["id"]
        for r in filter_blocked_hosts(
            df, "url", ["example.com", "1.2.3.4"]
        ).collect()
    }
    assert kept == {4}
    # host-form blocklist entries normalize to their registered domain
    kept2 = {
        r["id"]
        for r in filter_blocked_hosts(df, "url", ["www.example.com"]).collect()
    }
    assert kept2 == {3, 4}
    # a bare string blocklist is a type error, not a silent no-op
    import pytest as _pytest
    with _pytest.raises(TypeError, match="iterable"):
        filter_blocked_hosts(df, "url", "example.com")


# --- Gopher quality rule bundle ---------------------------------------------


def _gopher_rows(spark, docs, **kw):
    from eel_spark.functions.text import gopher_keep, gopher_quality_flags

    df = spark.createDataFrame([(d,) for d in docs], "text STRING")
    return df.select(
        gopher_quality_flags("text", **kw).alias("f"),
        gopher_keep("text", **kw).alias("keep"),
    ).collect()


GOOD_DOC = (
    "the growth of open data has changed how teams plan their work and "
    "share results with the public every season\n"
    "people that have clear goals tend to finish more tasks and waste "
    "less time than groups with vague plans\n"
    "good tools help but habits matter more when the load gets heavy and "
    "the days turn long for everyone involved\n"
    "review what you built each week and adjust the plan so that small "
    "errors never grow into large failures over time"
)


def test_gopher_good_doc_keeps(spark):
    r = _gopher_rows(spark, [GOOD_DOC])[0]
    assert r["keep"] is True
    assert all(r["f"][k] for k in r["f"].asDict())


def test_gopher_each_rule_fails_alone(spark):
    base_words = GOOD_DOC.split()
    cases = {
        # too short
        "word_count_ok": "the dog and the cat have fun with that",
        # 50+ one-char words: mean length < 3
        "mean_word_length_ok": "the of be to and that have with " + "a b " * 30,
        # hashes everywhere
        "symbol_ratio_ok": GOOD_DOC.replace(" ", " # "),
        # every line a bullet
        "bullet_ratio_ok": "\n".join(
            "- " + " ".join(base_words[i : i + 10]) for i in range(0, 80, 10)
        ),
        # every line ends with ellipsis
        "ellipsis_ratio_ok": "\n".join(
            " ".join(base_words[i : i + 10]) + " ..." for i in range(0, 80, 10)
        ),
        # numbers, not words
        "alpha_word_ratio_ok": "the of and that be to have with "
        + " ".join(str(1000 + i) for i in range(60)),
        # no required stopwords at all
        "stopword_ok": " ".join(f"word{i} item{i} thing{i}" for i in range(20)),
        # one line repeated
        "duplicate_line_ok": "\n".join(["all work and no play makes life dull"] * 12),
        # one bigram dominates
        "top_bigram_ok": "the of be to and that have with " + "buy now " * 40,
    }
    for rule, doc in cases.items():
        r = _gopher_rows(spark, [doc])[0]
        assert r["f"][rule] is False, (rule, r["f"].asDict())
        assert r["keep"] is False, rule


def test_gopher_null_and_empty(spark):
    from eel_spark.functions.text import gopher_keep

    df = spark.createDataFrame([(None,), ("",), ("   ",)], "text STRING")
    assert [r["k"] for r in df.select(gopher_keep("text").alias("k")).collect()] == [
        False, False, False,
    ]


def test_gopher_null_doc_per_rule_semantics(spark):
    """NULL docs fail exactly the two count-threshold rules and pass the
    vacuous ratio/line rules — rule-level pass-rate reporting must not
    charge a NULL doc with nine failures."""
    r = _gopher_rows(spark, [None])[0]["f"].asDict()
    assert r["word_count_ok"] is False and r["stopword_ok"] is False
    for rule, ok in r.items():
        if rule not in ("word_count_ok", "stopword_ok"):
            assert ok is True, (rule, r)


def test_gopher_thresholds_are_tunable(spark):
    # relaxing min_words rescues the short doc
    doc = "the dog and the cat have fun with that plan of the day"
    strict = _gopher_rows(spark, [doc])[0]
    relaxed = _gopher_rows(spark, [doc], min_words=5)[0]
    assert strict["keep"] is False and relaxed["keep"] is True


# --- URL canonicalization ----------------------------------------------------


def _canon(spark, urls, **kw):
    from eel_spark.functions.text import canonical_url

    df = spark.createDataFrame([(u,) for u in urls], "u STRING")
    return [r["c"] for r in df.select(canonical_url("u", **kw).alias("c")).collect()]


def test_canonical_url_variants_collapse(spark):
    variants = [
        "HTTP://WWW.Example.com:80/a/b/?utm_source=x&b=2&a=1#frag",
        "http://example.com/a/b?a=1&b=2",
        "http://user:pw@example.com./a/b/?b=2&a=1&fbclid=zzz",
        "example.com/a/b?b=2&a=1",
    ]
    got = _canon(spark, variants)
    assert got == ["http://example.com/a/b?a=1&b=2"] * 4


def test_canonical_url_parts(spark):
    cases = {
        "https://Example.com": "https://example.com/",
        "https://example.com:443/x": "https://example.com/x",
        "https://example.com:8443/x": "https://example.com:8443/x",
        "http://example.com/?utm_campaign=a&utm_medium=b": "http://example.com/",
        "http://example.com/p?flag&z=1&a": "http://example.com/p?a&flag&z=1",
        "http://www2.example.com/": "http://www2.example.com/",
    }
    got = _canon(spark, list(cases))
    assert got == list(cases.values())


def test_canonical_url_null_and_garbage(spark):
    got = _canon(spark, [None, "", "   ", "not a url at all  "])
    assert got == [None] * 4


def test_canonical_url_keep_www(spark):
    got = _canon(spark, ["http://www.example.com/x"], strip_www=False)
    assert got == ["http://www.example.com/x"]


# ---------------------------------------------------------------------------
# HTML / markup → text extraction
# ---------------------------------------------------------------------------


def _h2t(spark, html):
    return spark.createDataFrame([(html,)], "h string").select(
        TX.html_to_text("h").alias("t")
    ).first()["t"]


def _main(spark, html, **kw):
    return spark.createDataFrame([(html,)], "h string").select(
        TX.extract_main_content("h", **kw).alias("t")
    ).first()["t"]


def test_html_script_subtree_removed(spark):
    # content is code, not text — including markup-looking strings and
    # legacy comment hiding; attributes and case don't matter
    assert _h2t(
        spark,
        '<p>a</p><SCRIPT type="x">var s="</p>"; if (i<9) {}<!-- hide --></SCRIPT><p>b</p>',
    ) == "a\nb"


def test_html_style_subtree_removed(spark):
    assert _h2t(spark, "<style>p { color: red; }\n.x>div{}</style><p>kept</p>") == "kept"


def test_html_comments_removed(spark):
    assert _h2t(spark, "x<!-- multi\nline <p>markup</p> inside -->y") == "xy"


def test_html_block_tags_become_lines_inline_tags_glue(spark):
    assert _h2t(
        spark,
        "<h1>Title</h1><div>one <b>bold</b> line</div><ul><li>i1</li><li>i2</li></ul>"
        "<span>glued</span><em>together</em>",
    ) == "Title\none bold line\ni1\ni2\ngluedtogether"
    # <br> and self-closing forms break lines too
    assert _h2t(spark, "a<br/>b<BR >c") == "a\nb\nc"


def test_html_entity_decode_core_set_and_order(spark):
    assert _h2t(
        spark,
        "&lt;tag&gt; &quot;q&quot; &#34;n&#34; it&apos;s it&#39;s a&nbsp;b x&#160;y &amp; &#38;",
    ) == "<tag> \"q\" \"n\" it's it's a b x y & &"
    # &amp; decodes LAST: double-escaped text yields the literal entity
    assert _h2t(spark, "&amp;lt;still-escaped&amp;gt;") == "&lt;still-escaped&gt;"


def test_html_whitespace_normalization(spark):
    assert _h2t(
        spark, "<p>  a\t\tb   c  </p>\n\n\n<p>   </p><p>d</p>"
    ) == "a b c\nd"
    # NULL propagates (scan-side expression, no special-casing)
    row = spark.createDataFrame([(None,)], "h string").select(
        TX.html_to_text("h").alias("t")
    ).first()
    assert row["t"] is None


def test_extract_main_content_heuristics(spark):
    html = (
        "<h1>Short Title</h1>"
        '<div id="nav"><a href="/">Home</a>&nbsp;<a href="/n">Next page</a></div>'
        "<p>This line has plenty of words and no links at all today.</p>"
        '<p>Mostly <a href="x">a very long anchor text body here</a> link.</p>'
        '<div class="footer"><a href="/a">About</a></div>'
    )
    # keeps only the long low-link-density line, in document order
    assert _main(spark, html) == (
        "This line has plenty of words and no links at all today."
    )
    # min_words loosened: the title and link-light lines come back
    assert _main(spark, html, min_words=2).splitlines()[0] == "Short Title"
    # link density loosened to 1.0: anchor-heavy lines survive
    assert "Mostly a very long anchor text body here link." in _main(
        spark, html, max_link_density=1.0
    )
    # attribute-heavy INLINE widget soup drops under a text-ratio floor
    # (block-tag markup is consumed by the line split — the ratio
    # measures inline markup density within a line)
    soup = (
        '<p><span data-a="1" data-b="2" data-widget="xxxxxxxxxxxxxxxxxxxxxx">'
        "tiny words here now ok</span></p>"
        "<p>normal paragraph with enough plain words to be kept</p>"
    )
    kept = _main(spark, soup, min_words=3, min_text_ratio=0.5)
    assert kept == "normal paragraph with enough plain words to be kept"
    assert _main(spark, "<p>too short</p>") == ""


def test_extract_main_content_composes_with_boilerplate_removal(spark):
    """The crawl-cleaning stack: per-doc main content first, then the
    corpus-level frequent-line pass."""
    from eel_spark.operators.dedup import remove_boilerplate_lines

    banner = "Subscribe to our newsletter for great offers every week"
    docs = spark.createDataFrame(
        [
            (
                i,
                f"<h1>T{i}</h1><p>{banner}</p>"
                f"<p>unique body {i} with several plain words kept</p>"
                '<div><a href="/">Home</a> <a href="/x">More links</a></div>',
            )
            for i in range(6)
        ],
        "doc_id: long, html: string",
    )
    main = docs.select(
        "doc_id", TX.extract_main_content("html").alias("text")
    )
    out = remove_boilerplate_lines(main, "text", "doc_id", min_docs=3)
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    assert texts[2] == "unique body 2 with several plain words kept"
    assert all(banner not in t for t in texts.values())


def test_html_extraction_plan_jvm_only(spark):
    """Both extractors are scan-side Catalyst expressions — zero Python
    stages (the gated set's standing contract)."""
    df = spark.createDataFrame([("<p>x</p>",)], "h string").select(
        TX.html_to_text("h").alias("a"),
        TX.extract_main_content("h").alias("b"),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_html_links_three_quote_forms_and_entities(spark):
    html = (
        '<a href="https://a.example/x?p=1&amp;q=2">one</a>'
        "<A HREF='https://b.example/y'>two</A>"
        "<a class='z' href=https://c.example/raw>three</a>"
        "<a name='anchor-without-href'>skip</a>"
        "<script>var a = '<a href=\"https://fake.example\">';</script>"
        "<!-- <a href='https://commented.example'>no</a> -->"
    )
    row = spark.createDataFrame([(html,)], "h string").select(
        TX.html_links("h").alias("l")
    ).first()
    assert row["l"] == [
        "https://a.example/x?p=1&q=2",   # entity-decoded
        "https://b.example/y",           # single-quoted, case-insensitive
        "https://c.example/raw",         # unquoted
    ]


def test_html_links_frontier_composition(spark):
    """The crawl-frontier stack: extract → canonicalize → URL-dedup."""
    from eel_spark.operators.dedup import dedup_by_url

    docs = spark.createDataFrame(
        [
            (1, '<a href="http://Site.example/p/">x</a>'),
            (2, "<a href='http://site.example/p?utm_source=f'>y</a>"),
            (3, '<a href="http://other.example/q">z</a>'),
        ],
        "doc_id long, html string",
    )
    frontier = docs.select(
        F.explode(TX.html_links("html")).alias("url")
    ).select(F.lit(0).alias("id"), "url")
    out = dedup_by_url(
        frontier.withColumn("id", F.monotonically_increasing_id()), "url", "id"
    )
    # the two site.example variants canonicalize together
    assert out.count() == 2


def test_html_title_and_lang(spark):
    rows = spark.createDataFrame(
        [
            (1, '<html lang="EN-us"><head><title> A &amp; B </title></head></html>'),
            (2, "<html><head></head><body>no title</body></html>"),
            (3, "<html lang=fr><title>T1</title><title>T2</title></html>"),
        ],
        "i long, h string",
    ).select(
        "i", TX.html_title("h").alias("t"), TX.html_lang("h").alias("l")
    )
    got = {r["i"]: (r["t"], r["l"]) for r in rows.collect()}
    assert got[1] == ("A & B", "en-us")
    assert got[2] == (None, None)
    assert got[3] == ("T1", "fr")  # first title wins


def test_html_links_hardened_attribute_parsing(spark):
    """r13 review (second pass): quote-aware attribute scanning and a
    real attribute boundary before href."""
    html = (
        # legal '>' inside an earlier quoted attribute must not lose href
        '<a title="a > b" href="https://real.example/page">x</a>'
        # data-href/ng-href are NOT outlinks; the anchor's real href is
        '<a data-href="https://tracker.example/t" href=/real>y</a>'
        # CSS content strings must not inject frontier entries
        "<style>a:after { content: '<a href=\"https://fake.example\">' }</style>"
    )
    row = spark.createDataFrame([(html,)], "h string").select(
        TX.html_links("h").alias("l")
    ).first()
    assert row["l"] == ["https://real.example/page", "/real"]


def test_html_title_ignores_script_strings_and_lang_keeps_digits(spark):
    rows = spark.createDataFrame(
        [
            (1, '<script>var t="<title>Loading</title>";</script>'
                "<title>Real</title>"),
            (2, '<html lang="es-419"><title>T</title></html>'),
        ],
        "i long, h string",
    ).select("i", TX.html_title("h").alias("t"), TX.html_lang("h").alias("l"))
    got = {r["i"]: (r["t"], r["l"]) for r in rows.collect()}
    assert got[1][0] == "Real"
    assert got[2] == ("T", "es-419")  # BCP 47 numeric region subtag


def test_html_lang_ignores_script_and_comment_decoys(spark):
    """r13 advice: a commented-out or JS-string '<html lang=...>' that
    precedes the real tag must not supply the language."""
    rows = spark.createDataFrame(
        [
            (1, '<!-- <html lang="xx"> --><html lang="de"><title>T</title>'),
            (2, '<script>var h=\'<html lang="yy">\';</script><html lang=pt-br>'),
            (3, '<!-- <html lang="xx"> --><html><body>no real lang</body></html>'),
        ],
        "i long, h string",
    ).select("i", TX.html_lang("h").alias("l"))
    got = {r["i"]: r["l"] for r in rows.collect()}
    assert got == {1: "de", 2: "pt-br", 3: None}


RESOLVE_CASES = [
    # (base, ref) — expectations computed from urllib.parse.urljoin at
    # test time, so the table asserts PARITY, not a frozen snapshot
    ("http://h/a/b", ""), ("http://h/a/b#bf", ""), ("http://h/a/b", "#f"),
    ("http://h/a/b?q", "#f"), ("http://h/a/b?q", "?x"), ("http://h/a/b?q", "?"),
    ("http://h/a/b", "c"), ("http://h/a/b/", "c"), ("http://h/a/b", "./c"),
    ("http://h/a/b", "../c"), ("http://h/a/b", "../../../c"),
    ("http://h/a/b", "//x/y"), ("http://h/a/b", "/c/./d/../e"),
    ("http://h/a/b", "c/../../d"), ("http://h/a/b", "HTTP:c"),
    ("http://h/a/b", "HTTPS://x/y"), ("http://h/a/b", "mailto:x@y"),
    ("http://h/a/b", "http://x/./y?q#f"), ("http://h", "a"),
    ("http://h?bq", "a"), ("http://h/a/", ".."), ("http://h/a/b", "../.."),
    ("http://h/a/b", "."), ("http://h/a/b", "a//b"), ("http://h/a/", "a//b"),
    ("http://h/a/b", "/a//b"), ("http://h/a/b", "///y"),
    ("http://h/a/b", "//"), ("http://h/a/b", "http://"),
    ("HTTP://H/a/b", "c"), ("http://h/a/b", "b\nc"), ("http://h/a/b", "\tc"),
    ("http://h/a/b", " c"), ("http://h/a/b", "c "),
    ("http://h/a/b", "?x#f"), ("http://h/a/b/", "../../../../x"),
    ("http://h/", "c"), ("http://h/a/b", "c."), ("http://h/a/b", "..."),
    ("http://h/a/b", "./"), ("http://h/a/b", "../"),
    ("http://u:p@h:8080/a/b?q#f", "c?z"),
    ("https://site.example/dir/page.html", "../img/x.png?v=2#top"),
    ("https://site.example/dir/", "sub/./a/../b"),
]


def test_resolve_url_parity_with_urljoin(spark):
    """resolve_url must agree with urllib.parse.urljoin on the hostile
    case table (r13 verdict #1) — dot-segments, protocol-relative,
    query/fragment-only refs, scheme quirks, WHATWG char stripping."""
    from urllib.parse import urljoin

    df = spark.createDataFrame(
        [(i, b, r) for i, (b, r) in enumerate(RESOLVE_CASES)],
        "i long, base string, ref string",
    ).select("i", TX.resolve_url("base", "ref").alias("got"))
    got = {r["i"]: r["got"] for r in df.collect()}
    for i, (b, r) in enumerate(RESOLVE_CASES):
        assert got[i] == urljoin(b, r), (b, r, got[i], urljoin(b, r))


def test_resolve_url_null_and_chain_plan(spark):
    """NULL propagates; the full frontier chain html_links →
    resolve_url → canonical_url stays ONE scan-side projection —
    zero exchanges, zero Python evals."""
    from eel_spark.session import get_session  # noqa: F401 (session fixture)

    nulls = spark.createDataFrame(
        [(None, "a"), ("http://h/x", None)], "base string, ref string"
    ).select(TX.resolve_url("base", "ref").alias("got"))
    assert [r["got"] for r in nulls.collect()] == [None, None]

    pages = spark.createDataFrame(
        [
            ("http://site.example/dir/page",
             '<a href="../up">u</a><a href="other">o</a>'
             '<a href="//cdn.example/x">c</a>'),
        ],
        "url string, html string",
    )
    frontier = (
        pages.select("url", F.explode(TX.html_links("html")).alias("href"))
        # per the docstring: resolve in its OWN projection, then
        # canonicalize the attribute — one scan-side stage, no tree
        # duplication
        .select(TX.resolve_url("url", F.col("href")).alias("abs"))
        .select(TX.canonical_url("abs").alias("u"))
    )
    assert sorted(r["u"] for r in frontier.collect()) == [
        "http://cdn.example/x",
        "http://site.example/dir/other",
        "http://site.example/up",
    ]
    plan = frontier._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_cjk_script_aware_token_counts(spark):
    """r13 verdict #4: whitespace-free scripts must get SANE counts via
    the script-aware fallback, not silently collapse to ~1 token —
    and the default stays byte-identical for oracle-mirroring."""
    ja = "国境の長いトンネルを抜けると雪国であった"  # 20 CJK chars, no spaces
    th = "ภาษาไทยไม่มีช่องว่าง"  # Thai, no spaces
    mixed = "Spark で 分散処理"  # latin word + spaced CJK runs
    en = "plain english text"
    df = spark.createDataFrame(
        [(1, ja), (2, th), (3, mixed), (4, en), (5, None)],
        "i long, t string",
    ).select(
        "i",
        TX.token_count("t").alias("plain"),
        TX.token_count("t", script_aware=True).alias("aware"),
        TX.bpe_ish_token_count("t", script_aware=True).alias("bpe"),
    )
    got = {r["i"]: r for r in df.collect()}
    assert got[1]["plain"] == 1 and got[1]["aware"] == len(ja)
    assert got[2]["plain"] == 1 and got[2]["aware"] == len(th)
    # mixed: 'Spark' + 1 char each for で and the run 分散処理 (4 chars)
    assert got[3]["aware"] == 1 + 1 + 4
    # latin text identical under both modes; NULL propagates
    assert got[4]["plain"] == got[4]["aware"] == 3
    assert got[5]["plain"] is None or got[5]["plain"] == -1  # size(null)
    # char-level BPE estimate ~1 token/char on the pure-CJK doc
    assert got[1]["bpe"] == len(ja)


def test_cjk_gopher_flags_script_aware(spark):
    """A 60-char CJK doc passes word_count with script_aware=True
    (fails it silently under the default \\s split); the anglocentric
    rules stay VISIBLE failures, per the docstring contract."""
    doc = "雪国の夜は長く静かである" * 5  # 60 Han/kana chars, no spaces
    df = spark.createDataFrame([(doc,)], "t string").select(
        TX.gopher_quality_flags("t").alias("plain"),
        TX.gopher_quality_flags(
            "t", script_aware=True, min_mean_word_len=1.0,
            min_alpha_word_ratio=0.0, min_stopword_hits=0,
        ).alias("aware"),
    )
    row = df.first()
    assert row["plain"]["word_count_ok"] is False  # 1 giant token
    assert row["aware"]["word_count_ok"] is True   # 60 char-tokens
    assert row["aware"]["mean_word_length_ok"] is True
    # untuned anglocentric rules fail loudly, not silently pass
    df2 = spark.createDataFrame([(doc,)], "t string").select(
        TX.gopher_quality_flags("t", script_aware=True).alias("s")
    )
    s = df2.first()["s"]
    assert s["mean_word_length_ok"] is False  # mean len 1.0 < 3.0 default
    assert s["stopword_ok"] is False


def test_cjk_chunking_tokenizer_hook(spark):
    """chunk_documents with the char-level tokenizer + joiner='' keeps
    chunk sizes honest on CJK and reassembles text without inserted
    separators."""
    from eel_spark.operators.packing import chunk_documents

    doc = "".join("春夏秋冬雨雪風雷山川海空"[i % 12] for i in range(25))
    df = spark.createDataFrame([(7, doc)], "doc_id long, text string")
    out = chunk_documents(
        df, "text", "doc_id", chunk_tokens=10,
        tokenizer=lambda c: TX.tokens(
            TX.segment_no_space_scripts(c), r"\s+"
        ),
        joiner="",
    ).orderBy("chunk_index").collect()
    assert [r["n_tokens"] for r in out] == [10, 10, 5]
    assert "".join(r["text"] for r in out) == doc
    # default split is unchanged for latin corpora
    latin = spark.createDataFrame(
        [(1, "a b c d e")], "doc_id long, text string"
    )
    base = chunk_documents(latin, "text", "doc_id", 3).collect()
    assert sorted(r["text"] for r in base) == ["a b c", "d e"]
