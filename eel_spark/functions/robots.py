"""robots.txt parsing and matching — RFC 9309 (Robots Exclusion
Protocol) as pure-Catalyst expressions, completing the crawl front:

    WARC → html_to_text / html_links → resolve_url → canonical_url
         → **robots_allowed** → the frontier the fetcher may crawl

The protocol, in the shape this module implements (all public — RFC
9309 plus the sitemaps.org ``Sitemap:`` extension and the de-facto
``Crawl-delay``):

* a robots body is line-records ``key: value`` with ``#`` comments;
  keys are case-insensitive, rule values (path patterns) are not;
* **groups** are runs of ``User-agent`` lines followed by rules; every
  group whose agent token equals the crawler's product token
  (case-insensitively) contributes rules; only when NO group matches
  exactly does the ``*`` group apply (RFC 9309 §2.2.1 — and an exact
  group with zero rules means allow-all, NOT fall-through to ``*``);
* rule paths support ``*`` (any run of octets) and a trailing ``$``
  (end anchor); an empty rule value has no effect (§2.2.2);
* the verdict for a URL is the rule with the **longest pattern** (in
  octets) matching its path?query; ``Allow`` wins length ties; no
  matching rule means allowed (§2.2.2).

Scale shape: robots bodies live in a small per-host dimension (one row
per fetched robots.txt — thousands to low millions of hosts), so
:func:`robots_rules` runs ONCE per host and the compiled rule array
rides a broadcast join onto the frontier (:func:`filter_by_robots`);
the frontier itself is never shuffled and the per-URL work is a
bounded rule-array scan. Wildcard-free patterns (the overwhelming
majority in real robots files) match via JVM ``startsWith`` — a regex
is compiled only for rules that actually use ``*``/``$``.

Out of scope, documented: percent-encoding equivalence (§2.2.2's
"octets in the URI ... are percent-encoding-normalized" — patterns
match the literal path; normalize URLs upstream with
:func:`~eel_spark.functions.text.canonical_url`), and the 500 KiB
parse cap (enforce at fetch time; the fold parses what it is given).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from eel_spark.functions.text import _c, url_host

__all__ = [
    "robots_rules",
    "robots_allowed",
    "robots_crawl_delay",
    "robots_sitemaps",
    "filter_by_robots",
]

#: regex metacharacters a rule path must match literally — everything
#: Java regex treats specially EXCEPT ``*`` (kept as the RFC wildcard;
#: the trailing ``$`` anchor is split off before escaping)
_RX_SPECIALS = r"([.^$+?(){}\[\]|\\])"

_RULES_TYPE = (
    "array<struct<allow:boolean,pattern:string,rx:string,plen:int>>"
)


def _kv_lines(body: Column) -> Column:
    """``array<struct<k,v>>`` of the body's line records: comments
    stripped, CR/whitespace trimmed, key lowercased, value = everything
    after the FIRST colon (sitemap values contain colons)."""
    lines = F.transform(
        F.split(body, "\n"),
        lambda l: F.trim(
            F.regexp_replace(F.regexp_replace(l, "\r", ""), "#.*$", "")
        ),
    )
    return F.transform(
        F.filter(lines, lambda l: F.instr(l, ":") > 0),
        lambda l: F.struct(
            F.lower(F.trim(F.substring_index(l, ":", 1))).alias("k"),
            F.trim(
                F.substring(l, F.instr(l, ":") + F.lit(1), F.length(l))
            ).alias("v"),
        ),
    )


def _agent_token(v: Column) -> Column:
    """The product token of a ``User-agent`` value, lowercased —
    letters/digits/``_``/``-`` up to the first other character, so
    'EelBot/1.2 (+http://…)' matches the token 'eelbot' (the reference
    matchers do the same split)."""
    return F.lower(F.regexp_extract(v, r"^([A-Za-z0-9_-]+)", 1))


def _group_fold(body: Column, agent: str) -> Column:
    """Fold the line records into the crawler's effective group — a
    struct of (rules, crawl_delay) pairs for the exact-token groups and
    the ``*`` groups separately, selection applied by the callers.

    The accumulator walks RFC 9309's grammar: a ``User-agent`` line
    either extends the current run of agent lines or (after rules)
    starts a new group; ANY other record ends the run. Rules append to
    the exact and/or star collections according to which agents the
    current group names; ``saw_exact`` distinguishes "exact group with
    no rules" (allow-all) from "no exact group" (fall back to ``*``).
    Pure Catalyst — ``aggregate`` is the loop, robots bodies are KB-
    scale so the per-row fold is bounded.
    """
    agent_lc = agent.lower()
    empty_rules = F.array().cast(
        "array<struct<allow:boolean,pattern:string>>"
    )
    zero = F.struct(
        F.lit(False).alias("in_agents"),
        F.lit(False).alias("cur_exact"),
        F.lit(False).alias("cur_star"),
        F.lit(False).alias("saw_exact"),
        empty_rules.alias("rex"),
        empty_rules.alias("rstar"),
        F.lit(None).cast("double").alias("cd_exact"),
        F.lit(None).cast("double").alias("cd_star"),
    )

    def step(acc: Column, p: Column) -> Column:
        k, v = p["k"], p["v"]
        is_ua = k == "user-agent"
        tok = _agent_token(v)
        ex = F.when(
            acc["in_agents"], acc["cur_exact"] | (tok == agent_lc)
        ).otherwise(tok == F.lit(agent_lc))
        st = F.when(
            acc["in_agents"], acc["cur_star"] | (v == "*")
        ).otherwise(v == F.lit("*"))
        is_rule = k.isin("allow", "disallow") & (v != "")
        rule = F.struct((k == "allow").alias("allow"), v.alias("pattern"))
        cd = (k == "crawl-delay") & v.rlike(r"^\d+(\.\d+)?$")
        return F.struct(
            is_ua.alias("in_agents"),
            F.when(is_ua, ex).otherwise(acc["cur_exact"]).alias("cur_exact"),
            F.when(is_ua, st).otherwise(acc["cur_star"]).alias("cur_star"),
            (acc["saw_exact"] | (is_ua & ex)).alias("saw_exact"),
            F.when(
                is_rule & acc["cur_exact"],
                F.concat(acc["rex"], F.array(rule)),
            )
            .otherwise(acc["rex"])
            .alias("rex"),
            F.when(
                is_rule & acc["cur_star"],
                F.concat(acc["rstar"], F.array(rule)),
            )
            .otherwise(acc["rstar"])
            .alias("rstar"),
            F.coalesce(
                acc["cd_exact"],
                F.when(cd & acc["cur_exact"], v.cast("double")),
            ).alias("cd_exact"),
            F.coalesce(
                acc["cd_star"],
                F.when(cd & acc["cur_star"], v.cast("double")),
            ).alias("cd_star"),
        )

    return F.aggregate(_kv_lines(body), zero, step)


def _compile_rule(rule: Column) -> Column:
    """Attach the match machinery to a parsed (allow, pattern) pair:
    ``rx`` — an anchored Java regex, built ONLY when the pattern uses
    ``*`` or a trailing ``$`` (else NULL and matching is a plain
    ``startsWith``) — and ``plen``, the pattern's octet length, the
    RFC's specificity measure for longest-match precedence."""
    pattern = rule["pattern"]
    anchored = pattern.endswith("$")
    body = F.when(
        anchored, F.substring(pattern, 1, F.length(pattern) - 1)
    ).otherwise(pattern)
    escaped = F.regexp_replace(body, _RX_SPECIALS, r"\\$1")
    rx = F.concat(
        F.lit("^"),
        F.replace(escaped, F.lit("*"), F.lit(".*")),
        F.when(anchored, F.lit("$")).otherwise(F.lit("")),
    )
    needs_rx = anchored | F.contains(pattern, F.lit("*"))
    return F.struct(
        rule["allow"].alias("allow"),
        pattern.alias("pattern"),
        F.when(needs_rx, rx).alias("rx"),
        F.octet_length(pattern).cast("int").alias("plen"),
    )


def robots_rules(body: Column | str, agent: str = "*") -> Column:
    """The effective rule set of a robots.txt body for ``agent``'s
    product token, as ``array<struct<allow, pattern, rx, plen>>`` —
    the column :func:`robots_allowed` consumes.

    Group selection per RFC 9309 §2.2.1: all groups naming the token
    case-insensitively merge; the ``*`` groups apply only when none
    does. NULL body (host never fetched / no robots.txt) → NULL, which
    :func:`robots_allowed` treats as allow-all (the protocol's default
    for an absent file).

    Compute this ONCE on the per-host robots dimension and join the
    compiled array onto the frontier — not per URL (the fold + regex
    compilation amortize across every URL of the host).
    """
    g = _group_fold(_c(body), agent)
    rules = F.when(g["saw_exact"], g["rex"]).otherwise(g["rstar"])
    return F.transform(rules, _compile_rule)


def _path_query(url: Column) -> Column:
    """The path?query slice of a URL — what robots rules match against
    (§2.2.2); fragment dropped, authority stripped, empty path → '/'.
    Scheme-less input is treated as starting at its first '/'."""
    u0 = F.substring_index(_c(url), "#", 1)
    stripped = F.regexp_replace(u0, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    u = F.when(u0.startswith("/"), u0).otherwise(
        F.regexp_replace(stripped, r"^[^/?]*", "")
    )
    return F.when(
        (u == "") | u.startswith("?"), F.concat(F.lit("/"), u)
    ).otherwise(u)


def robots_allowed(rules: Column, url: Column | str) -> Column:
    """Whether ``url`` may be fetched under ``rules`` (a
    :func:`robots_rules` column) — RFC 9309 §2.2.2 longest-match:
    among matching rules the one with the most pattern octets decides;
    ``Allow`` wins ties; no match (or no/NULL rules — no robots.txt)
    means allowed.

    Per-URL cost is a scan of the host's rule array: ``startsWith``
    for wildcard-free patterns (the hot path — real robots rules are
    overwhelmingly plain prefixes), regex only where the rule used
    ``*``/``$``. No shuffle, no Python.
    """
    path = _path_query(url)
    matched = F.filter(
        F.coalesce(rules, F.lit(None).cast(_RULES_TYPE)),
        lambda r: F.when(
            r["rx"].isNull(), path.startswith(r["pattern"])
        ).otherwise(F.rlike(path, r["rx"])),
    )
    best = F.aggregate(
        matched,
        F.struct(F.lit(-1).alias("plen"), F.lit(True).alias("allow")),
        lambda acc, r: F.when(
            (r["plen"] > acc["plen"])
            | ((r["plen"] == acc["plen"]) & r["allow"] & ~acc["allow"]),
            F.struct(r["plen"].alias("plen"), r["allow"].alias("allow")),
        ).otherwise(acc),
    )
    return F.coalesce(best["allow"], F.lit(True))


def robots_crawl_delay(body: Column | str, agent: str = "*") -> Column:
    """The ``Crawl-delay`` (seconds, double; NULL when absent) the
    body requests of ``agent`` — group-scoped like the rules (an exact
    group's delay wins; the ``*`` group's applies only when no exact
    group matched), first well-formed numeric value per scope wins.
    Not in RFC 9309 but honored by most large crawlers; feed it to the
    fetch scheduler's per-host pacing."""
    g = _group_fold(_c(body), agent)
    return F.coalesce(
        g["cd_exact"], F.when(~g["saw_exact"], g["cd_star"])
    )


def robots_sitemaps(body: Column | str) -> Column:
    """Every ``Sitemap:`` URL in the body (sitemaps.org extension) as
    ``array<string>`` — sitemap records are global, not group-scoped,
    so this is a plain key filter over the line records. Feed the
    result to the frontier alongside harvested outlinks."""
    kv = _kv_lines(_c(body))
    return F.transform(
        F.filter(kv, lambda p: (p["k"] == "sitemap") & (p["v"] != "")),
        lambda p: p["v"],
    )


def filter_by_robots(
    df: DataFrame,
    url_col: str,
    robots: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    body_col: str = "robots_body",
    keep_unknown_hosts: bool = True,
) -> DataFrame:
    """Drop frontier rows their host's robots.txt disallows for
    ``agent`` — the politeness gate between frontier dedup and the
    fetch scheduler.

    ``robots`` is the per-host robots dimension: one row per fetched
    robots.txt with the hostname in ``host_col`` (lowercase; matched
    against :func:`~eel_spark.functions.text.url_host` of the URL) and
    the raw body text in ``body_col``. Hosts absent from the dimension
    (robots.txt never fetched, 404, …) are kept when
    ``keep_unknown_hosts`` (the RFC default for an absent file) or
    dropped for a fetch-robots-first policy.

    Scale shape: rules compile once per host on the (small) dimension,
    which BROADCASTS into a left join keyed on the derived host — the
    frontier never shuffles, and the per-row verdict is the bounded
    rule-array scan of :func:`robots_allowed`. Duplicate hosts in the
    dimension are collapsed first (duplicates would multiply frontier
    rows through the join).
    """
    rules_dim = (
        robots.groupBy(F.lower(F.col(host_col)).alias("__robots_host"))
        # duplicate hosts are a data bug; collapse DETERMINISTICALLY
        # (longest body, lexicographic tiebreak — F.first under groupBy
        # is partition-order-dependent and would make the verdict for a
        # duplicated host flap between runs)
        .agg(
            F.max_by(
                F.col(body_col),
                F.struct(
                    F.octet_length(F.col(body_col)).alias("n"),
                    F.col(body_col).alias("b"),
                ),
            ).alias("__body")
        )
        .select(
            "__robots_host",
            robots_rules(F.col("__body"), agent).alias("__rules"),
        )
    )
    joined = df.withColumn("__host", url_host(F.col(url_col))).join(
        F.broadcast(rules_dim),
        F.col("__host") == F.col("__robots_host"),
        "left",
    )
    known = F.col("__robots_host").isNotNull()
    verdict = robots_allowed(F.col("__rules"), F.col(url_col))
    keep = F.when(known, verdict).otherwise(F.lit(keep_unknown_hosts))
    return joined.where(keep).drop("__host", "__robots_host", "__rules")
