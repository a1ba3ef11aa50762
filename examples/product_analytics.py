"""Warehouse product-analytics pipeline over the event log and the
orders table: funnel conversion -> time-to-convert percentiles ->
cohort retention -> snapshot CDC feed -> SCD2 dimension maintenance ->
leakage-free point-in-time enrichment.

Usage: python examples/product_analytics.py [sf_dir]
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from eel_spark.operators.cdc import snapshot_diff
from eel_spark.operators.funnel import (
    funnel_report,
    funnel_times,
    retention_cohorts,
)
from eel_spark.operators.rollups import (
    quantile_from_histogram,
    quantile_rollup_aggs,
)
from eel_spark.operators.scd2 import scd2_enrich, scd2_merge
from eel_spark.queries.tables import table
from eel_spark.session import get_session

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_session("product-analytics-example")
work = tempfile.mkdtemp(prefix="eel_pa_")

events = table(spark, sf_dir, "events").df
steps = {
    "view": F.col("event_type") == "view",
    "click": F.col("event_type") == "click",
    "purchase": F.col("event_type") == "purchase",
}

# 1. first-touch funnel: one user-key shuffle however many steps
report = funnel_report(events, "user_id", "ts", steps, within="7 days")
for r in report.collect():
    print(f"funnel step {r['step']} {r['step_name']:9s} "
          f"users={r['users']:6d} conversion={r['conversion']}")

# 2. time-to-convert p50/p95 via the mergeable DDSketch histogram
times = funnel_times(events, "user_id", "ts", steps, within="7 days")
lat = times.select(
    (F.unix_micros("purchase") - F.unix_micros("view")).alias("lat_us")
).filter(F.col("lat_us").isNotNull())
aggs, _ = quantile_rollup_aggs(["lat_us"], min_value=6e7, n_buckets=128)
hist = lat.agg(aggs["lat_us_qhist"].alias("lat_us_qhist"))
row = hist.select(
    quantile_from_histogram("lat_us_qhist", 0.5, min_value=6e7).alias("p50"),
    quantile_from_histogram("lat_us_qhist", 0.95, min_value=6e7).alias("p95"),
).first()
print(f"view->purchase latency p50={row['p50']/8.64e10:.1f}d "
      f"p95={row['p95']/8.64e10:.1f}d (sketch estimate)")

# 3. cohort retention triangle anchored on first signup
retention = retention_cohorts(
    events, "user_id", "ts", "week",
    cohort_filter=F.col("event_type") == "signup",
)
print(f"retention cells: {retention.count()}")

# 4. CDC between two order snapshots (digest join, one shuffle per side)
orders = table(spark, sf_dir, "orders").df
base = orders.select("o_orderkey", "o_custkey", "o_orderpriority",
                     F.col("o_orderdate").cast("date").alias("d"))
old_snap = base.where(F.col("o_orderkey") % 5 != 0)
new_snap = base.where(F.col("o_orderkey") % 7 != 0)
feed = snapshot_diff(old_snap, new_snap, "o_orderkey")
print("cdc feed:", {r["change_type"]: r["n"] for r in
                    feed.groupBy("change_type").agg(
                        F.count(F.lit(1)).alias("n")).collect()})

# 5. SCD2 dimension: customer priority history maintained incrementally
dim_path = os.path.join(work, "cust_priority_scd2")
obs = orders.select("o_custkey", "o_orderpriority", "o_orderkey",
                    F.col("o_orderdate").cast("date").alias("d"))
stats = scd2_merge(spark, dim_path, obs, "o_custkey",
                   ["o_orderpriority"], "d", ["o_orderkey"], n_buckets=8)
print(f"scd2 merge: {stats['new_keys']} new keys, "
      f"{stats['closed']} closed versions")

# 6. leakage-free feature: priority the customer held 45 days before
# each order (binned interval join — the deep-version-chain path)
facts = orders.select(
    "o_orderkey", "o_custkey",
    F.date_sub(F.col("o_orderdate").cast("date"), 45).alias("lookback"),
)
enriched = scd2_enrich(facts, spark, dim_path, "o_custkey", "lookback",
                       attrs=["o_orderpriority"], bin_days=30)
n_total = enriched.count()
n_known = enriched.where(F.col("o_orderpriority").isNotNull()).count()
print(f"point-in-time enrich: {n_known}/{n_total} orders had 45-day-old "
      f"priority state (rest pre-date their customer's history)")

shutil.rmtree(work, ignore_errors=True)
print("product analytics pipeline complete")
