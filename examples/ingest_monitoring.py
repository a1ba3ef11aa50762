"""Ingest monitoring for a crawling pipeline — the composition the
stores make free: an event stream maintains the exactly-once rollup
store (streaming_rollup_sink; per-batch partials, replay-idempotent),
the store's re-merged hourly counts feed gap filling (a crawler that
went DARK is a missing bucket, not a small one) and the robust
median/MAD anomaly scorer (timeseries_anomalies' engine, Iglewicz-
Hoaglin modified z-score), and the flagged buckets are the alert feed.

Why median/MAD and not mean/stddev: the very spike you hunt inflates a
stddev and masks itself; order statistics don't move. Why gap-fill
first: robust_outliers scores the buckets it SEES — an outage produces
no bucket, so zeros must be materialized before scoring or the most
severe failure mode is invisible.

Scale shape: the store holds per-(batch, granularity) partials (KB per
batch), the re-merge is one map-side-combinable groupBy, the gap spine
is sequence+explode per series, and the scorer is two grouped
percentile_approx aggregates (the bounded-memory default) joined back
broadcast — nothing here rescans event history.

Usage: python examples/ingest_monitoring.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from eel_spark.operators.anomaly import robust_outliers
from eel_spark.operators.rollups import fill_time_gaps, read_rollup
from eel_spark.session import get_session
from eel_spark.streaming import streaming_rollup_sink

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_session("ingest-monitoring-example")

events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
    "event_id", "event_type", "ts"
)

with tempfile.TemporaryDirectory() as work:
    # --- simulate the arriving stream: three waves of the feed, plus a
    # planted incident wave — one hour where a feed duplicates itself
    # 25x (the classic double-ingest) --------------------------------------
    spike_hour = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("h")
    ).first()["h"]
    incident = (
        events.where(F.date_trunc("hour", F.col("ts")) == spike_hour)
        .crossJoin(spark.range(25).select(F.col("id").alias("__rep")))
        .select(
            (F.col("event_id") * 100 + F.col("__rep") + 10_000_000)
            .alias("event_id"),
            "event_type",
            "ts",
        )
    )
    src = os.path.join(work, "waves")
    os.makedirs(src)
    for i in range(3):
        events.where(F.col("event_id") % 3 == i).write.parquet(
            f"{src}/w{i}"
        )
    incident.write.parquet(f"{src}/w_incident")

    stream = (
        spark.readStream.schema("event_id BIGINT, event_type STRING, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    store = os.path.join(work, "rollup_store")
    q = streaming_rollup_sink(
        stream,
        store,
        os.path.join(work, "ck"),
        "ts",
        aggs={"n": F.count(F.lit(1))},
        granularities=["hour"],
        extra_keys=["event_type"],
    )
    assert q.awaitTermination(400), "streaming rollup sink did not finish"

    # --- store upkeep: the same scheduler that runs this monitor owns
    # the store's depth. store_maintenance_report is the one dashboard
    # shape every incremental store emits; maintain() triggers the
    # store's own compactor once the measured batch depth crosses the
    # policy (the 4 ingest waves above exceed max_batches=2 here, so
    # the compaction actually fires) ---------------------------------------
    from eel_spark.operators.maintenance import maintain, store_maintenance_report

    store_maintenance_report(spark, store).show(truncate=False)
    res = maintain(spark, store, max_batches=2, merges={"n": F.sum("n")},
                   extra_keys=["event_type"])
    print(f"store maintenance: {res['action']} "
          f"(batches {res['before']['n_batches']} -> "
          f"{res['after']['n_batches']}, files "
          f"{res['before']['n_files']} -> {res['after']['n_files']})")
    assert res["action"] == "compacted"

    # --- the monitoring read: re-merge partials, materialize silent
    # hours as zeros, score each series against its own median/MAD ---------
    counts = read_rollup(
        spark, store, merges={"n": F.sum("n")}, extra_keys=["event_type"]
    ).select("event_type", "bucket_start", "n")
    # GLOBAL fill bounds, not each series' own min/max: a feed that
    # stops emitting and STAYS dark has no buckets after its last event
    # — per-series default bounds would never materialize the trailing
    # zeros, and the ongoing outage (the most realistic one) would be
    # invisible to the scorer. In production, end = wall clock.
    lo, hi = counts.agg(
        F.min("bucket_start"), F.max("bucket_start")
    ).first()
    filled = fill_time_gaps(
        counts, "bucket_start", "1 hour", keys=["event_type"],
        fill={"n": "zero"}, start=lo, end=hi,
    )
    scored = robust_outliers(filled, "n", by=["event_type"])
    # the production alert guard: on a SPARSE series (median ~0) the
    # MAD degenerates to 0 and ANY deviation flags (mod_z NULL — the
    # documented degenerate rule), so a 0→1 hour would page someone.
    # Keep scored spikes (mod_z set) and degenerate flags only when the
    # deviation is material IN EITHER DIRECTION: a 10x jump, or a drop
    # to <=1/10 of a series that normally carries real volume (the
    # dark-hour case — n=0 must page on a steady feed, not on one that
    # was already near-silent).
    alerts = scored.where(
        F.col("is_outlier")
        & (
            F.col("mod_z").isNotNull()
            | (F.col("n") >= 10 * F.greatest(F.col("median"), F.lit(1.0)))
            | (
                (F.col("median") >= 10)
                & (F.col("n") <= F.col("median") / 10)
            )
        )
    ).select(
        "event_type", "bucket_start", "n", "median",
        F.round("mod_z", 1).alias("mod_z"),
    )
    rows = alerts.orderBy(F.desc("n")).collect()
    print(f"alert feed: {len(rows)} flagged (event_type, hour) buckets")
    for r in rows[:8]:
        print(f"  {r['event_type']:10s} {r['bucket_start']} "
              f"n={r['n']:6d} median={r['median']:.0f} mod_z={r['mod_z']}")
    # the planted double-ingest hour must be among the alerts for every
    # event type that has events in that hour (filtered driver-side —
    # the alert feed is already collected)
    spiked_types = {
        r["event_type"] for r in rows if r["bucket_start"] == spike_hour
    }
    present_types = {
        r["event_type"]
        for r in events.where(
            F.date_trunc("hour", F.col("ts")) == spike_hour
        ).select("event_type").distinct().collect()
    }
    assert present_types <= spiked_types, (present_types, spiked_types)
    print(f"planted 25x double-ingest hour flagged for all "
          f"{len(present_types)} event types present in it")

spark.stop()
