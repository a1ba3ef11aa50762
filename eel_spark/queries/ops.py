"""Operator-demonstration queries: one gated query per DataStream operator
family from SURVEY.md §2.1 (projection, schema surgery, set ops, cartesian,
explode, value replacement, deterministic sampling, argmax, windows, pivot,
ordered prefix ops), each with a DuckDB oracle.

These are intentionally small, surgical queries: the point is that each
reference operator, re-expressed on Spark, produces oracle-identical
results — the TPC-H suite covers the heavy plan shapes.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from eel_spark.datastream import DataStream
from eel_spark.queries.tables import (
    cents,
    money_sum,
    sql_cents,
    sql_money_sum,
    table,
    table_via_avro,
    table_via_orc,
)
from eel_spark.queries.registry import query


# -- projection / filter / derive (ops §2.1 #1,2,3,28,32,19,21) -------------

_OPS_DERIVE_SQL = """
SELECT p_partkey AS part_id,
       p_retailprice,
       ROUND(p_retailprice * 0.9, 4) AS sale_price,
       UPPER(p_brand) AS brand
FROM part
WHERE p_size >= 25 AND p_type <> 'PROMO'
"""


@query("ops_project_derive", _OPS_DERIVE_SQL, gated=False)
def ops_project_derive(spark: SparkSession, sf_dir: str) -> DataStream:
    """projection + filter + add_field + rename_field + remove_fields —
    all column pruning/pushdown-friendly (scan reads 5 columns only).

    Rotated to the ungated tier in r14 (ninth rotation, directed by the
    r13 verdict) to free a gate slot for text_html_extract: the
    projection/derive shape is exercised by literally every gated
    query. The ORC-source correctness duty this row carries
    (``table_via_orc`` — every other oracled query scans parquet)
    moves with it to the 2-SF pytest oracle in test_ungated.py, plus
    the ORC plan assert in test_plans.py."""
    return (
        table_via_orc(spark, sf_dir, "part")
        .filter("p_size >= 25 AND p_type <> 'PROMO'")
        .add_field("sale_price", expr=F.round(F.col("p_retailprice") * 0.9, 4))
        .add_field("brand", expr=F.upper("p_brand"))
        .rename_field("p_partkey", "part_id")
        .projection("part_id", "p_retailprice", "sale_price", "brand")
    )


# -- value replacement / null handling / JSON extraction (§2.1 #25,31,20 +
#    semi-structured props) — one scan of events exercises all four ---------

_OPS_REPLACE_SQL = """
SELECT CASE WHEN event_type = 'error' THEN 'incident' ELSE event_type END AS event_type,
       CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN COALESCE(NULLIF(props, '{}'), '<empty>') = '<empty>'
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_empty_props
FROM events
GROUP BY 1, 2
"""


@query("ops_replace_json_props", _OPS_REPLACE_SQL)
def ops_replace_json_props(spark: SparkSession, sf_dir: str) -> DataStream:
    """replace_value (update) + replaceNullValues on a synthesized null +
    JSON property extraction via ``from_json`` with an explicit schema
    (vectorized JVM parse, no schema-inference scan) — one events scan,
    one shuffle."""
    ev = (
        table(spark, sf_dir, "events")
        .projection("event_type", "props")
        .replace_value("event_type", "error", "incident")
        .add_field("k_bucket", expr=F.from_json("props", "k BIGINT")["k"] % 10)
        .map_field("props", F.nullif(F.col("props"), F.lit("{}")))
        .replace_null_values("<empty>", subset=["props"])
    )
    out = ev.df.groupBy("event_type", "k_bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("props") == "<empty>", 1).otherwise(0)
        ).alias("n_empty_props"),
    )
    return DataStream(out)


# -- deterministic sample (§2.1 #26) ----------------------------------------

_OPS_SAMPLE_SQL = f"""
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE (l_orderkey * 31 + l_linenumber) % 10 <> 0
"""


@query("ops_sample_mod", _OPS_SAMPLE_SQL, gated=False)
def ops_sample_mod(spark: SparkSession, sf_dir: str) -> DataStream:
    """sample(k) semantics (keep all but every k-th row) with a
    deterministic key — cluster-size-independent, unlike the reference's
    shared counter (DataStream.scala:665)."""
    return (
        table(spark, sf_dir, "lineitem")
        .projection("l_orderkey", "l_linenumber", "l_quantity")
        .filter((F.col("l_orderkey") * 31 + F.col("l_linenumber")) % 10 != 0)
    )


# -- set operations (§2.1 #27,29,30) ----------------------------------------

_OPS_SETOPS_SQL = """
WITH big_spenders AS (SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000),
     builders     AS (SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING')
SELECT custkey, 'both' AS tag FROM (SELECT custkey FROM big_spenders INTERSECT SELECT custkey FROM builders)
UNION ALL
SELECT custkey, 'builder_only' AS tag
FROM (SELECT custkey FROM builders EXCEPT ALL SELECT DISTINCT custkey FROM big_spenders)
"""


@query("ops_set_operations", _OPS_SETOPS_SQL, gated=False)
def ops_set_operations(spark: SparkSession, sf_dir: str) -> DataStream:
    """union + intersection + subtract + distinct — all shuffle-based
    distributed set ops (the reference collects one side to the driver).

    Rotated to the ungated tier in round 11 (registry capped at 50): its
    set-op shape stays covered gated by the q2/q16/q21/q22 anti/semi
    joins; the freed slot went to retrieval_rrf_fused (queries/ops5.py),
    the hybrid-retrieval fusion path's driver CORRECTNESS row."""
    spenders = (
        table(spark, sf_dir, "orders")
        .filter("o_totalprice > 300000")
        .projection("o_custkey")
        .rename_field("o_custkey", "custkey")
    )
    builders = (
        table(spark, sf_dir, "customer")
        .filter("c_mktsegment = 'BUILDING'")
        .projection("c_custkey")
        .rename_field("c_custkey", "custkey")
    )
    both = builders.intersection(spenders).add_field("tag", "both")
    only = builders.subtract(DataStream(spenders.df.distinct())).add_field(
        "tag", "builder_only"
    )
    return both.union(only)


# -- explode (§2.1 #33) -----------------------------------------------------

_OPS_EXPLODE_SQL = """
SELECT token, COUNT(*) AS freq
FROM (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents WHERE doc_id < 100)
WHERE token <> ''
GROUP BY token
ORDER BY freq DESC, token
LIMIT 25
"""


@query("ops_explode_tokens", _OPS_EXPLODE_SQL, gated=False)
def ops_explode_tokens(spark: SparkSession, sf_dir: str) -> DataStream:
    """explode over a split array — JVM generator, no Python flatMap.

    Rotated to the ungated tier in round 10 (registry capped at 50): its
    tokenize+explode shape is covered gated by text_token_stats, and its
    Avro-scan duty moved to text_bm25_multi_stats (queries/ops5.py), the
    slot that took its place. Input still flows through the Avro
    container layer (``table_via_avro``) here for the 2-SF pytest
    oracle."""
    docs = (
        table_via_avro(spark, sf_dir, "documents")
        .filter("doc_id < 100")
        .add_field("tokens", expr=F.split("text", " "))
        .projection("tokens")
        .explode("tokens", alias="token")
        .filter("token <> ''")
    )
    counted = docs.group_by("token").count("freq").to_datastream()
    return DataStream(counted.df.orderBy(F.desc("freq"), F.asc("token")).limit(25))


# -- window: lag/sessionize -------------------------------------------------

_OPS_SESSION_SQL = """
SELECT user_id, COUNT(*) AS n_sessions, CAST(SUM(n_events) AS BIGINT) AS n_events
FROM (
  SELECT user_id, session_id, COUNT(*) AS n_events
  FROM (
    SELECT user_id, event_id,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
    FROM (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800000000 OR
                       LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
  )
  GROUP BY user_id, session_id
)
GROUP BY user_id
"""


@query("ops_sessionize", _OPS_SESSION_SQL)
def ops_sessionize(spark: SparkSession, sf_dir: str) -> DataStream:
    """Gap-based sessionization: lag → flag → running sum → two-level agg.
    The streaming twin (session_window / applyInPandasWithState) lives in
    eel_spark.streaming; this is the batch-exact version."""
    ev = table(spark, sf_dir, "events").df
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lagged = ev.withColumn("prev_ts", F.lag("ts").over(wo))
    flagged = lagged.withColumn(
        "new_session",
        F.when(
            F.col("prev_ts").isNull()
            | (F.unix_micros("ts") - F.unix_micros("prev_ts") > 1800 * 1_000_000),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(run))
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    out = per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"), F.sum("n_events").alias("n_events")
    )
    return DataStream(out)


# -- pivot ------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

_OPS_PIVOT_SQL = """
SELECT user_id,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'click'    THEN 1 END), 0) AS BIGINT) AS click,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'error'    THEN 1 END), 0) AS BIGINT) AS error,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS BIGINT) AS purchase,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'signup'   THEN 1 END), 0) AS BIGINT) AS signup,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'view'     THEN 1 END), 0) AS BIGINT) AS view
FROM events GROUP BY user_id
"""


@query("ops_pivot_event_counts", _OPS_PIVOT_SQL, gated=False)
def ops_pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataStream:
    """Pivot with an explicit value list — single-pass, no second scan to
    discover distinct values (the at-scale rule for pivot)."""
    ev = table(spark, sf_dir, "events").df
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, subset=_EVENT_TYPES)
    )
    return DataStream(out)


# -- ordered prefix ops: takeWhile + drop(n) composed over one order --------

_OPS_SLICES_SQL = """
SELECT event_id, user_id, value FROM (
  SELECT event_id, user_id, value FROM events
  WHERE event_id < (SELECT COALESCE(MIN(event_id), 9223372036854775807)
                    FROM events WHERE NOT (value < 495.0))
  ORDER BY event_id
  OFFSET 100
)
"""


# rotated to the ungated tier in round 8 (slot moved to the funnel/
# retention/CDC families); oracle stays green in tests/test_ungated.py
@query("ops_ordered_slices", _OPS_SLICES_SQL, gated=False)
def ops_ordered_slices(spark: SparkSession, sf_dir: str) -> DataStream:
    """take_while then drop(n) composed over one explicit total order
    (SURVEY.md §3 — Spark has no implicit row order): windowed
    running-AND prefix, then sort + offset. No driver iteration."""
    return (
        table(spark, sf_dir, "events")
        .projection("event_id", "user_id", "value")
        .take_while(F.col("value") < 495.0, order_by=["event_id"])
        .drop(100, order_by=["event_id"])
    )


# -- tumbling time buckets (batch twin of streaming windows) ----------------

_OPS_TUMBLING_SQL = f"""
SELECT CASE WHEN GROUPING(h) = 0 THEN 'hour'
            WHEN GROUPING(d) = 0 THEN 'day'
            ELSE 'month' END AS granularity,
       CAST(EPOCH(COALESCE(h, d, m)) AS BIGINT) AS bucket_start,
       event_type,
       COUNT(*) AS n,
       {sql_money_sum(sql_cents('value'))} AS total_value
FROM (SELECT date_trunc('hour', ts) AS h, date_trunc('day', ts) AS d,
             date_trunc('month', ts) AS m, event_type, value
      FROM events)
GROUP BY GROUPING SETS ((h, event_type), (d, event_type), (m, event_type))
"""


# rotated to the ungated tier in round 12 (seventh rotation, directed by
# the r11 verdict: the slot moved to anomaly_hourly_events). The
# time-bucket aggregate shape stays gated via ops_sessionize and oracled
# via ops_gapfill_hourly / rollup_quantile_daily; this query keeps its
# 2-SF pytest oracle in tests/test_ungated.py.
@query("ops_tumbling_window", _OPS_TUMBLING_SQL, gated=False)
def ops_tumbling_window(spark: SparkSession, sf_dir: str) -> DataStream:
    """Tumbling aggregation at hour/day/month granularities in ONE pass —
    operators/rollups.py:time_rollup (native groupingSets over date_trunc
    buckets: one scan, one shuffle for all granularities; the hypertable
    continuous-aggregate shape). The streaming tumbling version
    (watermark + window()) is in eel_spark.streaming."""
    from eel_spark.operators.rollups import time_rollup

    ev = table(spark, sf_dir, "events").df
    rolled = time_rollup(
        ev,
        "ts",
        {"n": F.count(F.lit(1)), "total_value": money_sum(cents("value"))},
        granularities=["hour", "day", "month"],
        extra_keys=["event_type"],
    )
    out = rolled.select(
        "granularity",
        F.unix_timestamp("bucket_start").alias("bucket_start"),
        "event_type",
        "n",
        "total_value",
    )
    return DataStream(out)
