"""Rotated-out driver queries stay oracle-verified here: the 50-slot
driver registry moved these slots to round-6 operator families, but each
rotated query remains implemented and must keep matching its DuckDB
oracle (same harness as test_tpch.py, sf0.001)."""

from __future__ import annotations

import pytest

from eel_spark.queries import UNGATED_ORACLE, UNGATED_QUERIES
from tests.conftest import SF_DIR, assert_df_matches_oracle

ROTATED = {
    "q10_returned_items",
    "q12_priority_lines",
    "q14_promo_revenue",
    "q17_small_quantity_revenue",
    "ops_pivot_event_counts",
    # round-7 second rotation: slots freed for scd2_order_priority and
    # topk_frequent_tokens (q6's filter-agg shape is covered by q1/q19;
    # the hash-mod sample by sampling_hash_split's md5 buckets)
    "q6_forecast_revenue",
    "ops_sample_mod",
    # round-8 third rotation: slots freed for funnel_view_purchase,
    # retention_weekly_cohorts and cdc_order_snapshots (zip/cartesian,
    # min_by/max_by and take/drop slices stay pytest-oracled here and
    # fully covered by the DataStream unit tests)
    "ops_zip_cartesian",
    "ops_minmax_by",
    "ops_ordered_slices",
    # round-8 fourth rotation: slot freed for scd2_enrich_orders (q20's
    # semi-join/scalar-threshold shape stays covered by q2/q11/q16/q21)
    "q20_promo_part_suppliers",
    # round-9 rotation: slot freed for funnel_convert_latency (the exact
    # percentile shape stays covered by rollup_quantile_daily's
    # order-statistic oracle + ops_window_frames)
    "ops_percentiles",
    # round-10 rotation: slot freed for text_bm25_multi_stats (the
    # tokenize+explode shape stays gated via text_token_stats; the Avro
    # container-layer duty moved to the new slot, which also scans via
    # table_via_avro)
    "ops_explode_tokens",
    # round-11 rotation: slot freed for retrieval_rrf_fused (the
    # union/intersect/except shape stays covered gated by the
    # q2/q16/q21/q22 anti/semi joins)
    "ops_set_operations",
    # round-12 seventh rotation (directed by the r11 verdict): slot
    # freed for anomaly_hourly_events; the groupingSets time-bucket
    # aggregate shape stays gated via ops_sessionize and oracled via
    # ops_gapfill_hourly / rollup_quantile_daily
    "ops_tumbling_window",
    # round-13 eighth rotation (directed by the r12 verdict): slot
    # freed for sampling_leakage_split; q4's EXISTS de-correlation is
    # also exercised gated by q21's anti/semi chain
    "q4_order_priority",
    # round-14 ninth rotation (directed by the r13 verdict): slot freed
    # for text_html_extract (the crawl pipeline's first stage);
    # ops_project_derive's projection/derive shape is exercised by
    # every gated query, and its ORC-source duty stays oracled here at
    # 2 SFs plus the ORC pushdown plan assert in test_plans.py
    "ops_project_derive",
}

# Registered ungated WITHOUT a DuckDB oracle: bench-visible companions
# whose correctness lives elsewhere. dedup_minhash_realtext keeps the
# full-weight natural-text signature workload in bench.py HEADLINE and
# its planted-recall gate in-query (plus tests/test_dedup.py); its
# machinery is oracle-gated exactly by the driver's dedup_minhash_pairs
# deterministic-corpus slot.
NO_ORACLE_UNGATED = {"dedup_minhash_realtext"}

# Oracled queries born ungated (never held a driver slot — the registry
# is capped at 50): same two-SF pytest oracle discipline as the rotated
# set. text_bm25_stats gates BM25's integer sufficient statistics; the
# ln()-bearing score formula is verified in tests/test_retrieval.py.
# (anomaly_hourly_events was born here in r11 and rotated INTO the
# driver gate in r12, trading places with ops_tumbling_window;
# sampling_leakage_split likewise rotated INTO the gate in r13,
# trading places with q4_order_priority; text_html_extract was born
# here in r13 and rotated INTO the gate in r14, trading places with
# ops_project_derive.)
# warc_html_extract (born r14): the WARC ingestion edge end-to-end —
# archives built from `documents` with the text_html_extract plant,
# read through the REAL binaryFile→mapInPandas→HTTP-split→decode→
# html_to_text chain, DuckDB building the expected extraction from the
# original text (framing, gzip members, payload fidelity, UTF-8 decode
# and the extractor all gated by one per-doc md5).
# crawl_frontier_fold (born r14): the frontier stage end-to-end —
# synthetic pages with relative hrefs in all three quoting dialects,
# html_links → resolve_url → canonical_url → per-URL counts, vs a
# DuckDB oracle that constructs the expected canonical frontier
# ARITHMETICALLY from doc_id (harvest, RFC 3986 fold, tracking strip
# and trailing-slash normalization all gated by one count hash).
# crawl_robots_filter (born r14): the frontier's politeness gate —
# per-host RFC 9309 robots bodies folded to rule arrays, broadcast
# onto a synthetic frontier, longest-match verdict per URL; DuckDB
# derives the expected surviving set arithmetically from doc_id's
# decimal digits (group selection, wildcard/anchor compilation and
# precedence all gated by the surviving row set).
# crawl_fetch_plan (born r14): the frontier's last stage — per-host
# polite fetch ordering; DuckDB re-derives host, broadcast-joined
# delays, running row_number, offset arithmetic and the per-host wave
# budget with its own window function over the same synthetic frontier.
EXTRA_ORACLED = {
    "text_bm25_stats",
    "warc_html_extract",
    "crawl_frontier_fold",
    "crawl_robots_filter",
    "crawl_fetch_plan",
}

ORACLED_UNGATED = ROTATED | EXTRA_ORACLED


def test_rotation_inventory():
    # every rotated query is still registered (ungated) with its oracle
    assert set(UNGATED_QUERIES) == ORACLED_UNGATED | NO_ORACLE_UNGATED
    assert set(UNGATED_ORACLE) == ORACLED_UNGATED


@pytest.mark.parametrize("name", sorted(ORACLED_UNGATED))
def test_ungated_query_matches_oracle(spark, oracle, name):
    df = UNGATED_QUERIES[name](spark, SF_DIR)
    assert_df_matches_oracle(df, oracle, UNGATED_ORACLE[name])


SF01_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def oracle_sf01():
    import duckdb

    from tests.conftest import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF01_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLED_UNGATED))
def test_ungated_query_matches_oracle_sf01(spark, oracle_sf01, name):
    """Second-SF discipline (the round-4 lesson: SF-tuned constants hide
    at a single scale factor) — the ungated tier must hold at the
    driver's own sf0.01, not just the fast sf0.001 tier."""
    df = UNGATED_QUERIES[name](spark, SF01_DIR)
    assert_df_matches_oracle(df, oracle_sf01, UNGATED_ORACLE[name])


@pytest.mark.parametrize("name", sorted(NO_ORACLE_UNGATED))
def test_no_oracle_ungated_self_gate(spark, name):
    """No-oracle ungated queries carry an in-query self-verification
    gate that EMPTIES the output on regression — so non-empty output is
    the check (dedup_minhash_realtext: planted near-dup recall ≥ 0.9
    over natural text, zero rows otherwise)."""
    df = UNGATED_QUERIES[name](spark, SF_DIR)
    assert df.count() > 0


def test_html_extract_oracle_parity_on_hostile_text(spark, tmp_path):
    """r13 review: the slot's premise is 'arbitrary corpora cannot
    break the plant' — markup chars, U+000B (the one char Java's \\s
    matches but RE2's does not), CRs, NULL and empty text must all
    keep the construction oracle string-exact."""
    import duckdb

    rows = [
        (0, "plain words enough to pass the five word floor"),
        (1, "markup <b>bold</b> & <script>x</script> injected here ok"),
        (2, "vertical\x0btab and\rcarriage returns \t tabs   runs"),
        (3, None),
        (4, ""),
        (5, "   \t  "),
        (6, "short one"),
    ]
    sf = tmp_path / "sf_hostile"
    sf.mkdir()
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(sf / "documents.parquet")
    )
    # the ninth rotation moved text_html_extract INTO the gated
    # registry — resolve it from there (the hostile-corpus duty stays
    # in this suite either way)
    from eel_spark.queries import ORACLE, QUERIES

    df = QUERIES["text_html_extract"](spark, str(sf))
    cols = sorted(df.columns)
    srows = sorted(tuple(str(r[c]) for c in cols) for r in df.collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    res = con.execute(ORACLE["text_html_extract"])
    names = [d[0] for d in res.description]
    idx = [names.index(c) for c in sorted(names)]
    drows = sorted(tuple(str(row[i]) for i in idx) for row in res.fetchall())
    con.close()
    assert sorted(names) == cols
    assert srows == drows
