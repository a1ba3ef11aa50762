"""Analytics operator shapes beyond the plain group-by family: rollup /
cube hierarchies, window frames, as-of joins, argmin/argmax aggregates,
interpolated percentiles. All DuckDB-oracle-gated.

Exactness notes follow SURVEY.md §6: money via integer cents, floats
rounded to 4 decimals on both sides, every ordering tie-broken by a
unique key, timestamps emitted as epoch micros (never raw TIMESTAMP).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from eel_spark.datastream import DataStream
from eel_spark.queries.registry import query
from eel_spark.queries.tables import cents, money_sum, sql_cents, sql_money_sum, table


# ---------------------------------------------------------------------------
# rollup / cube (hierarchical aggregation — eel has no analogue; Spark and
# every warehouse engine treat these as first-class)
# ---------------------------------------------------------------------------

_HIERARCHIES_SQL = f"""
SELECT 'rollup' AS src, l_returnflag AS dim1, l_linestatus AS dim2,
       GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
       COUNT(*) AS n, {sql_money_sum(sql_cents('l_quantity'))} AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
UNION ALL
SELECT 'cube' AS src, event_type AS dim1, CAST(user_id % 4 AS VARCHAR) AS dim2,
       GROUPING(event_type) * 2 + GROUPING(user_id % 4) AS gid,
       COUNT(*) AS n, CAST(NULL AS DOUBLE) AS sum_qty
FROM events
GROUP BY CUBE (event_type, user_id % 4)
"""


@query("ops_grouping_hierarchies", _HIERARCHIES_SQL)
def ops_grouping_hierarchies(spark: SparkSession, sf_dir: str) -> DataStream:
    """ROLLUP (detail → per-flag → grand total) and CUBE (all 4 grouping
    sets) each in ONE pass — Spark expands grouping sets map-side, no
    N-scans-for-N-levels. Union-tagged so one gated query covers both
    hierarchies."""
    li = table(spark, sf_dir, "lineitem").df
    rollup = li.rollup("l_returnflag", "l_linestatus").agg(
        (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")).alias("gid"),
        F.count(F.lit(1)).alias("n"),
        money_sum(cents("l_quantity")).alias("sum_qty"),
    ).select(
        F.lit("rollup").alias("src"),
        F.col("l_returnflag").alias("dim1"),
        F.col("l_linestatus").alias("dim2"),
        "gid", "n", "sum_qty",
    )
    ev = table(spark, sf_dir, "events").df.withColumn(
        "user_bucket", F.col("user_id") % 4
    )
    cube = ev.cube("event_type", "user_bucket").agg(
        (F.grouping("event_type") * 2 + F.grouping("user_bucket")).alias("gid"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        F.lit("cube").alias("src"),
        F.col("event_type").alias("dim1"),
        F.col("user_bucket").cast("string").alias("dim2"),
        "gid", "n",
        F.lit(None).cast("double").alias("sum_qty"),
    )
    return DataStream(rollup.unionByName(cube))


# ---------------------------------------------------------------------------
# window frames: moving aggregate + lag/lead + ntile
# ---------------------------------------------------------------------------

_FRAMES_SQL = """
SELECT event_id, user_id,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
         / 100.0 AS moving_avg,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         / 100.0 AS running_value,
       LAG(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_event,
       LEAD(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_event,
       NTILE(4) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS quartile
FROM events
WHERE user_id < 8
"""


@query("ops_window_frames", _FRAMES_SQL)
def ops_window_frames(spark: SparkSession, sf_dir: str) -> DataStream:
    """Bounded-frame moving average + unbounded running sum (both exact
    cents), lag/lead, ntile — one window spec shared by all five
    functions → a single sort per partition."""
    ev = table(spark, sf_dir, "events").filter("user_id < 8").df
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = wo.rowsBetween(-3, Window.currentRow)
    run = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = ev.select(
        "event_id",
        "user_id",
        (
            F.sum(cents("value")).over(frame).cast("double")
            / F.count(F.lit(1)).over(frame)
            / F.lit(100.0)
        ).alias("moving_avg"),
        (
            F.sum(cents("value")).over(run).cast("double") / F.lit(100.0)
        ).alias("running_value"),
        F.lag("event_id").over(wo).alias("prev_event"),
        F.lead("event_id").over(wo).alias("next_event"),
        F.ntile(4).over(wo).alias("quartile"),
    )
    return DataStream(out)


# ---------------------------------------------------------------------------
# as-of join (the time-series primitive Spark lacks natively)
# ---------------------------------------------------------------------------

_ASOF_SQL = """
WITH purchases AS (
  SELECT user_id, ts, MAX(CAST(ROUND(value * 100) AS BIGINT)) AS p_cents
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, ts
)
SELECT e.event_id, e.user_id,
       epoch_us(p.ts) AS last_purchase_us,
       CAST(p.p_cents AS DOUBLE) / 100.0 AS last_purchase_value
FROM events e
ASOF LEFT JOIN purchases p
  ON e.user_id = p.user_id AND e.ts >= p.ts
"""


@query("ops_asof_join", _ASOF_SQL)
def ops_asof_join(spark: SparkSession, sf_dir: str) -> DataStream:
    """As-of join: each event annotated with the latest purchase at or
    before it, per user.

    Spark realization (no ASOF keyword): union the probe and build sides
    tagged, one window pass per user ordered by (ts, build-first), and
    ``last(..., ignorenulls)`` carries the most recent build row forward.
    Cost: ONE shuffle + sort on (user_id) — same asymptotics as a merge
    as-of join, no per-row subqueries, no range cross-join blowup.
    """
    ev = table(spark, sf_dir, "events").df
    purchases = (
        ev.filter("event_type = 'purchase'")
        .groupBy("user_id", "ts")
        .agg(F.max(cents("value")).alias("p_cents"))
    )
    probe = ev.select(
        "event_id", "user_id", "ts",
        F.lit(0).alias("__build"),
        F.lit(None).cast("long").alias("p_us"),
        F.lit(None).cast("long").alias("p_cents"),
    )
    build = purchases.select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id", "ts",
        F.lit(1).alias("__build"),
        F.unix_micros("ts").alias("p_us"),
        "p_cents",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.desc("__build"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        probe.unionByName(build)
        .withColumn("last_purchase_us", F.last("p_us", ignorenulls=True).over(w))
        .withColumn(
            "last_purchase_value",
            F.last("p_cents", ignorenulls=True).over(w).cast("double") / F.lit(100.0),
        )
        .filter("__build = 0")
        .select("event_id", "user_id", "last_purchase_us", "last_purchase_value")
    )
    return DataStream(out)


# ---------------------------------------------------------------------------
# argmin/argmax aggregates (minBy/maxBy, DataStream.scala:515,534)
# ---------------------------------------------------------------------------

# tie-break: value-cents scaled then event_id → unique ordering key both sides
_MINMAX_SQL = f"""
SELECT event_type,
       MIN_BY(event_id, {sql_cents('value')} * 1000000000000 + event_id) AS min_event,
       MAX_BY(event_id, {sql_cents('value')} * 1000000000000 + event_id) AS max_event,
       {sql_money_sum(sql_cents('value'))} AS total_value
FROM events
GROUP BY event_type
"""


# rotated to the ungated tier in round 8 (slot moved to the funnel/
# retention/CDC families); oracle stays green in tests/test_ungated.py
@query("ops_minmax_by", _MINMAX_SQL, gated=False)
def ops_minmax_by(spark: SparkSession, sf_dir: str) -> DataStream:
    """min_by/max_by single-pass argmin/argmax (the distributed answer to
    the reference's driver-side minBy/maxBy) with a unique composite key
    so ties are deterministic."""
    ev = table(spark, sf_dir, "events").df
    key = cents("value") * F.lit(1_000_000_000_000) + F.col("event_id")
    out = ev.groupBy("event_type").agg(
        F.min_by("event_id", key).alias("min_event"),
        F.max_by("event_id", key).alias("max_event"),
        money_sum(cents("value")).alias("total_value"),
    )
    return DataStream(out)


# ---------------------------------------------------------------------------
# interpolated percentiles
# ---------------------------------------------------------------------------

_PCT_SQL = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 4) AS p50,
       ROUND(quantile_cont(value, 0.9), 4) AS p90,
       ROUND(quantile_cont(value, 0.99), 4) AS p99
FROM events
GROUP BY event_type
"""


@query("ops_percentiles", _PCT_SQL, gated=False)
def ops_percentiles(spark: SparkSession, sf_dir: str) -> DataStream:
    """Exact interpolated percentiles per group (Spark ``percentile`` ≡
    DuckDB ``quantile_cont``). At 100 TB the drop-in is
    ``approx_percentile`` (t-digest, mergeable, no global sort) — exact
    here because the oracle demands determinism.

    Rotated to the ungated tier in round 9 (slot freed for
    funnel_convert_latency): the exact-percentile shape stays covered by
    rollup_quantile_daily (order-statistic oracle) + ops_window_frames,
    and this query remains DuckDB-oracled at two SFs by
    tests/test_ungated.py."""
    ev = table(spark, sf_dir, "events").df
    out = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )
    return DataStream(out)


# ---------------------------------------------------------------------------
# range join (point-in-interval) — bucketized, never nested-loop
# ---------------------------------------------------------------------------

_RANGE_SQL = f"""
SELECT p_partkey, COUNT(*) AS n_lines, {sql_money_sum(sql_cents('l_extendedprice'))} AS total_price
FROM part JOIN lineitem
  ON l_quantity BETWEEN p_size - 2 AND p_size + 2
WHERE p_brand = 'Brand#1'
GROUP BY p_partkey
"""


@query("ops_range_join", _RANGE_SQL)
def ops_range_join(spark: SparkSession, sf_dir: str) -> DataStream:
    """Point-in-interval join via binning (operators/joins.py:range_join):
    lineitem quantities against ±2 size windows of one brand's parts.
    A naive inequality join is a BroadcastNestedLoopJoin (O(n·m) pair
    evals); binning makes it an equi-join on bin id + residual filter."""
    from eel_spark.operators.joins import range_join

    li = table(spark, sf_dir, "lineitem").projection(
        "l_quantity", "l_extendedprice"
    ).df
    part = (
        table(spark, sf_dir, "part")
        .filter("p_brand = 'Brand#1'")
        .projection("p_partkey", "p_size").df
        .withColumn("lo", F.col("p_size") - 2)
        .withColumn("hi", F.col("p_size") + 2)
    )
    joined = range_join(li, part, "l_quantity", "lo", "hi", bin_width=5.0)
    out = joined.groupBy("p_partkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        money_sum(cents("l_extendedprice")).alias("total_price"),
    )
    return DataStream(out)


# ---------------------------------------------------------------------------
# stream combinators: concat (positional zip) + cartesian in one pipeline
# ---------------------------------------------------------------------------

_ZIP_CARTESIAN_SQL = """
WITH a AS (SELECT n_nationkey, n_name,
                  ROW_NUMBER() OVER (ORDER BY n_nationkey) AS rn
           FROM nation),
     b AS (SELECT n_name AS alpha_name,
                  ROW_NUMBER() OVER (ORDER BY n_name) AS rn
           FROM nation)
SELECT a.n_nationkey, a.n_name, b.alpha_name, r.r_name
FROM a JOIN b USING (rn)
CROSS JOIN region r
"""


# rotated to the ungated tier in round 8 (see above)
@query("ops_zip_cartesian", _ZIP_CARTESIAN_SQL, gated=False)
def ops_zip_cartesian(spark: SparkSession, sf_dir: str) -> DataStream:
    """concat (DataStream.scala:380) — positional zip of two streams over
    explicit per-side orders (SURVEY.md §3: no implicit row order in a
    distributed engine) — then cartesian (DataStream.scala:267) with a
    small dim → BroadcastNestedLoopJoin; the reference materializes the
    right side on the driver for both ops."""
    nation = table(spark, sf_dir, "nation")
    left = nation.projection("n_nationkey", "n_name")
    right = DataStream(
        nation.df.select(F.col("n_name").alias("alpha_name"))
    )
    zipped = left.concat(
        right, order_left=["n_nationkey"], order_right=["alpha_name"]
    )
    return zipped.cartesian(table(spark, sf_dir, "region").projection("r_name"))
