"""Round-7 gated queries: CORRECTNESS coverage for the round-6 operator
families that previously lived only in pytest — gap filling, paragraph
dedup, fuzzy (edit-distance) join, deterministic hash splits, and the
mergeable DDSketch quantile rollup. Each runs the REAL library operator
on the shared test tables and carries a DuckDB oracle that derives the
same answer independently (SURVEY.md §6 conventions: integer-cents
money, no raw TIMESTAMP output, stable cross-engine hashes only).
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from eel_spark.datastream import DataStream
from eel_spark.queries.registry import query
from eel_spark.queries.tables import cents, sql_cents, table

# -- gap filling (operators/rollups.fill_time_gaps) -------------------------

_GAPFILL_SQL = f"""
WITH base AS (
  SELECT event_type, date_trunc('hour', ts) AS b,
         COUNT(*) AS n, SUM({sql_cents('value')}) AS v_cents
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT event_type, MIN(b) AS lo, MAX(b) AS hi FROM base GROUP BY 1
), spine AS (
  SELECT event_type,
         UNNEST(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP),
                                INTERVAL 1 HOUR)) AS b
  FROM bounds
), joined AS (
  SELECT s.event_type, s.b, COALESCE(base.n, 0) AS n, base.v_cents
  FROM spine s LEFT JOIN base ON s.event_type = base.event_type
                             AND s.b = CAST(base.b AS TIMESTAMP)
)
SELECT event_type,
       CAST(EPOCH(b) AS BIGINT) AS bucket_start,
       n,
       CAST(LAST_VALUE(v_cents IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY b
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS v_cents
FROM joined
"""


@query("ops_gapfill_hourly", _GAPFILL_SQL)
def ops_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataStream:
    """time_bucket_gapfill shape (operators/rollups.fill_time_gaps): the
    hourly per-event-type rollup has real holes (~6% of the grid at
    sf0.01); every hour in each type's [min, max] range must come back —
    counts zero-filled, the money measure carried forward (LOCF). The
    rollup is one scan + one shuffle (time_rollup); the spine is
    sequence+explode per group (no calendar cross join); LOCF is one
    running last(ignorenulls) window per group."""
    from eel_spark.operators.rollups import fill_time_gaps, time_rollup
    from eel_spark.queries.registry import pin

    ev = table(spark, sf_dir, "events").df
    # the rollup feeds BOTH gapfill branches (the per-group bounds
    # aggregate and the spine's left join) — pinned, the corpus scans
    # once; unpinned, each branch re-derives the full rollup lineage
    rolled = pin(
        time_rollup(
            ev,
            "ts",
            {"n": F.count(F.lit(1)), "v_cents": F.sum(cents("value"))},
            granularities=["hour"],
            extra_keys=["event_type"],
        ).select("event_type", "bucket_start", "n", "v_cents")
    )
    filled = fill_time_gaps(
        rolled,
        "bucket_start",
        "1 hour",
        keys=["event_type"],
        fill={"n": "zero", "v_cents": "locf"},
    )
    return DataStream(
        filled.select(
            "event_type",
            F.unix_timestamp("bucket_start").alias("bucket_start"),
            "n",
            "v_cents",
        )
    )


# -- paragraph-level exact dedup (operators/dedup.dedup_paragraphs) ---------

_BOILER = (
    "please subscribe to our newsletter for updates and share this "
    "article with your friends today"
)

_PARA_SQL = f"""
WITH built AS (
  SELECT doc_id,
         substr(text, 1, 40) AS head,
         'closing remarks for document ' || CAST(doc_id AS VARCHAR) AS tail,
         (doc_id % 7 = 0) AS no_boiler
  FROM documents
), winner AS (
  SELECT MIN(doc_id) AS w FROM built WHERE NOT no_boiler
)
SELECT doc_id,
       CASE WHEN no_boiler OR doc_id = (SELECT w FROM winner)
            THEN head || chr(10) || chr(10) ||
                 CASE WHEN no_boiler THEN '' ELSE '{_BOILER}' || chr(10) || chr(10) END
                 || tail
            ELSE head || chr(10) || chr(10) || tail
       END AS text
FROM built
"""


@query("dedup_paragraphs_boilerplate", _PARA_SQL)
def dedup_paragraphs_boilerplate(spark: SparkSession, sf_dir: str) -> DataStream:
    """RefinedWeb-style exact paragraph dedup
    (operators/dedup.dedup_paragraphs): a boilerplate paragraph planted
    in 6/7 of the corpus (the classic crawl footer) must survive only in
    its global first occurrence; every other document is rebuilt without
    it, and documents that never had it pass through byte-identical.
    Only (hash, id, pos) triples shuffle — paragraph text never leaves
    its task."""
    from eel_spark.operators.dedup import dedup_paragraphs

    docs = table(spark, sf_dir, "documents").df
    built = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat_ws(
                "\n\n",
                F.substring("text", 1, 40),
                F.concat(F.lit("closing remarks for document "), F.col("doc_id")),
            ),
        )
        .otherwise(
            F.concat_ws(
                "\n\n",
                F.substring("text", 1, 40),
                F.lit(_BOILER),
                F.concat(F.lit("closing remarks for document "), F.col("doc_id")),
            )
        )
        .alias("text"),
    )
    return DataStream(
        dedup_paragraphs(built, "text", "doc_id", min_chars=50)
    )


# -- fuzzy edit-distance join (operators/joins.fuzzy_join) ------------------

_FUZZY_SQL = """
WITH c AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 500)
SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
       levenshtein(a.c_name, b.c_name) AS distance
FROM c a, c b
WHERE a.c_custkey < b.c_custkey
  AND levenshtein(a.c_name, b.c_name) <= 1
"""


@query("fuzzy_join_customer_names", _FUZZY_SQL)
def fuzzy_join_customer_names(spark: SparkSession, sf_dir: str) -> DataStream:
    """Edit-distance self-join (operators/joins.fuzzy_join) on customer
    names within 1 edit — the record-linkage shape. The oracle is the
    brute-force cross product; the operator must reach the same pairs
    through q-gram/segment blocking + capped buckets with no
    BroadcastNestedLoopJoin (plan-asserted in tests/test_plans.py's
    sibling)."""
    from eel_spark.operators.joins import fuzzy_join

    c = (
        table(spark, sf_dir, "customer")
        .df.filter(F.col("c_custkey") <= 500)
        .select("c_custkey", "c_name")
    )
    out = fuzzy_join(
        c, c, "c_name", "c_name", "c_custkey", "c_custkey", max_distance=1
    )
    return DataStream(
        out.filter(F.col("c_custkey") < F.col("c_custkey_r")).select(
            F.col("c_custkey").alias("custkey_a"),
            F.col("c_custkey_r").alias("custkey_b"),
            "distance",
        )
    )


# -- deterministic hash split (operators/sampling.hash_split) ---------------

# bounds over the 20-bit bucket space, exactly as hash_split computes them
_DENOM = 1 << 20
_B_TRAIN = format(int(0.8 * _DENOM), "05x")
_B_VAL = format(int(0.9 * _DENOM), "05x")

_SPLIT_SQL = f"""
WITH b AS (
  SELECT n_chars,
         substr(md5('7' || chr(31) || CAST(doc_id AS VARCHAR)), 1, 5) AS h
  FROM documents
)
SELECT CASE WHEN h < '{_B_TRAIN}' THEN 'train'
            WHEN h < '{_B_VAL}' THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM b GROUP BY 1
"""


@query("sampling_hash_split", _SPLIT_SQL)
def sampling_hash_split(spark: SparkSession, sf_dir: str) -> DataStream:
    """Deterministic 80/10/10 train/val/test assignment
    (operators/sampling.hash_split, md5 mode): the same document lands
    in the same split on every run, every engine — the oracle recomputes
    the assignment from md5 hex independently. Pure projection, no
    shuffle before the tiny 3-row aggregate."""
    from eel_spark.operators.sampling import hash_split

    docs = table(spark, sf_dir, "documents").df
    split = hash_split(
        docs,
        {"train": 0.8, "val": 0.1, "test": 0.1},
        ["doc_id"],
        seed=7,
        hash="md5",
    )
    return DataStream(
        split.groupBy("split").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


# -- mergeable quantile rollup (operators/rollups.quantile_rollup_aggs) -----

_Q_ALPHA = 0.05
_Q_MINV = 0.01
_Q_GAMMA = (1.0 + _Q_ALPHA) / (1.0 - _Q_ALPHA)
_Q_LG = math.log(_Q_GAMMA)


def _sql_dd_bucket(v: str, minv: float = _Q_MINV, lg: float = _Q_LG,
                   n_buckets: int = 128) -> str:
    """DuckDB twin of ddsketch_bucket (same python-inlined log(gamma)
    literal the Spark side uses, so both engines divide by the identical
    double). Parameterized so other sketch-oracled queries (ops5's
    funnel latency) share the one mirror implementation."""
    top = int(n_buckets) - 1
    return (
        f"CASE WHEN {v} IS NULL OR CAST({v} AS DOUBLE) < {minv!r} THEN 0 "
        f"ELSE CAST(LEAST(GREATEST(CEIL(LN(CAST({v} AS DOUBLE) / {minv!r})"
        f" / {lg!r}) + 1, 1), {top}) AS INT) END"
    )


_QROLL_SQL = f"""
WITH v AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS d, value FROM events
), r AS (
  SELECT d, value,
         ROW_NUMBER() OVER (PARTITION BY d ORDER BY value NULLS FIRST) AS rn,
         COUNT(*) OVER (PARTITION BY d) AS n
  FROM v
)
SELECT d AS bucket_date, MAX(n) AS n,
  MAX(CASE WHEN rn = GREATEST(CAST(CEIL(0.5 * n) AS BIGINT), 1)
           THEN {_sql_dd_bucket('value')} END) AS p50_bucket,
  MAX(CASE WHEN rn = GREATEST(CAST(CEIL(0.95 * n) AS BIGINT), 1)
           THEN {_sql_dd_bucket('value')} END) AS p95_bucket
FROM r GROUP BY d
"""


@query("rollup_quantile_daily", _QROLL_SQL)
def rollup_quantile_daily(spark: SparkSession, sf_dir: str) -> DataStream:
    """Mergeable DDSketch quantile rollup
    (operators/rollups.quantile_rollup_aggs + time_rollup): daily p50/p95
    of event value via the fixed-size log-bucket histogram — the
    continuous-aggregate form whose partials re-merge losslessly. The
    comparison is on the BUCKET INDEX of each quantile: bucket index is
    monotone in value, so the sketch's rank fold lands in exactly the
    bucket of the true nearest-rank quantile, which the oracle computes
    from the exact order statistic — an integer identity, immune to
    cross-libm pow/exp ulp drift (the midpoint-value estimate is not).
    """
    from eel_spark.operators.rollups import (
        quantile_bucket_from_histogram,
        quantile_rollup_aggs,
        time_rollup,
    )

    ev = table(spark, sf_dir, "events").df
    aggs, _ = quantile_rollup_aggs(
        ["value"], alpha=_Q_ALPHA, min_value=_Q_MINV, n_buckets=128
    )
    aggs["n"] = F.count(F.lit(1))
    rolled = time_rollup(ev, "ts", aggs, granularities=["day"])
    return DataStream(
        rolled.select(
            F.to_date("bucket_start").alias("bucket_date"),
            "n",
            quantile_bucket_from_histogram("value_qhist", 0.5).alias("p50_bucket"),
            quantile_bucket_from_histogram("value_qhist", 0.95).alias("p95_bucket"),
        )
    )


# -- leakage-safe split (operators/sampling.leakage_safe_split) -------------
# GATED since round 13 (eighth rotation, directed by the r12 verdict —
# born ungated in r11; the slot came from q4_order_priority, whose
# EXISTS de-correlation shape stays covered gated by q21's anti/semi
# chain and ungated-oracled at 2 SFs). The oracle derives the
# exact-duplicate cluster representative (min doc_id per normalized
# content md5) and the md5-bucket split assignment independently, so a
# single moved document — the split-leakage bug this operator exists to
# prevent — flips the hash.

# text is coalesced to '' BEFORE normalizing in both engines: DuckDB's
# md5(NULL) is NULL (all NULL-text docs would cluster together under
# MIN OVER h) while the Spark side's inner equi-join on a NULL hash
# would drop the back-join and fall back to per-doc ids — coalescing
# symmetrically removes the latent cross-engine divergence (r11 advice)
_LEAKAGE_NORM = (
    "trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g'))"
)

_LEAKAGE_SPLIT_SQL = f"""
WITH h AS (
  SELECT doc_id, md5({_LEAKAGE_NORM}) AS h FROM documents
), rep AS (
  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY h) AS rep FROM h
), b AS (
  SELECT doc_id, rep,
         substr(md5('11' || chr(31) || CAST(rep AS VARCHAR)), 1, 5) AS hx
  FROM rep
)
SELECT doc_id,
       CASE WHEN hx < '{_B_TRAIN}' THEN 'train'
            WHEN hx < '{_B_VAL}' THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


@query("sampling_leakage_split", _LEAKAGE_SPLIT_SQL)
def sampling_leakage_split(spark: SparkSession, sf_dir: str) -> DataStream:
    """Leakage-safe 80/10/10 split (operators/sampling.
    leakage_safe_split, md5 mode): every document hashes on its
    exact-duplicate cluster representative (min doc_id per normalized
    content hash), so byte-identical documents can never straddle
    train/test. Per-doc assignment rows — the strictest shape the
    oracle can check."""
    from eel_spark.functions.text import normalized_text
    from eel_spark.operators.sampling import leakage_safe_split

    docs = table(spark, sf_dir, "documents").df
    # NULL text coalesces to '' before hashing — mirrors the oracle's
    # coalesce so both engines agree on NULL-text cluster membership
    hdf = docs.select(
        "doc_id",
        F.md5(
            normalized_text(
                F.coalesce(F.col("text"), F.lit(""))
            ).cast("binary")
        ).alias("__h"),
    )
    clusters = hdf.join(
        hdf.groupBy("__h").agg(F.min("doc_id").alias("component")), on="__h"
    ).select(F.col("doc_id").alias("node"), "component")
    split = leakage_safe_split(
        docs,
        {"train": 0.8, "val": 0.1, "test": 0.1},
        "doc_id",
        clusters=clusters,
        seed=11,
        hash="md5",
    )
    return DataStream(split.select("doc_id", "split"))


# -- robust time-series anomaly report (operators/anomaly) -------------------
# GATED since round 12 (seventh rotation, directed by the r11 verdict —
# born ungated in r11; the slot came from ops_tumbling_window). §6
# notes: medians of integer counts are exact binary doubles (halves),
# MADs exact quarters — dev4/mad4 ship them as exact BIGINTs; the flag
# compares c·(dev/mad) > cutoff with the SAME operation order in both
# engines (multiply after the divide), so the boolean itself is gated
# too. The oracle's back-joins are NULL-SAFE (IS NOT DISTINCT FROM) to
# mirror robust_outliers' eqNullSafe — a NULL-keyed series scores like
# any other in both engines (r11 advice).

_ANOMALY_SQL = """
WITH b AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), m AS (
  SELECT event_type, quantile_cont(CAST(n AS DOUBLE), 0.5) AS med
  FROM b GROUP BY 1
), d AS (
  SELECT b.event_type, b.bucket, b.n, abs(CAST(b.n AS DOUBLE) - m.med) AS dev
  FROM b JOIN m ON b.event_type IS NOT DISTINCT FROM m.event_type
), md AS (
  SELECT event_type, quantile_cont(dev, 0.5) AS mad FROM d GROUP BY 1
)
SELECT d.event_type,
       strftime(d.bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
       d.n,
       CAST(round(4 * d.dev) AS BIGINT) AS dev4,
       CAST(round(4 * md.mad) AS BIGINT) AS mad4,
       CASE WHEN md.mad = 0 THEN d.dev > 0
            ELSE 0.6745 * (d.dev / md.mad) > 3.5 END AS is_outlier
FROM d JOIN md ON d.event_type IS NOT DISTINCT FROM md.event_type
"""


@query("anomaly_hourly_events", _ANOMALY_SQL)
def anomaly_hourly_events(spark: SparkSession, sf_dir: str) -> DataStream:
    """Modified z-score ingest monitoring (operators/anomaly.
    timeseries_anomalies): hourly event counts per event_type scored
    against their own series' median/MAD. Every bucket row ships its
    flag plus exact integer-scaled deviation/MAD, so the oracle gates
    the order statistics AND the outlier decision."""
    from eel_spark.operators.anomaly import timeseries_anomalies

    ev = table(spark, sf_dir, "events").df
    # exact=True OPT-IN: the oracle gates exact order statistics, and
    # hourly buckets per event_type are bounded groups — the documented
    # contract for the buffering path (the r12 default is the sketch)
    rep = timeseries_anomalies(
        ev, "ts", by=["event_type"], granularity="hour", exact=True
    )
    return DataStream(
        rep.select(
            "event_type",
            F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "n",
            F.round(
                F.abs(F.col("n").cast("double") - F.col("median")) * 4
            ).cast("long").alias("dev4"),
            F.round(F.col("mad") * 4).cast("long").alias("mad4"),
            "is_outlier",
        )
    )
