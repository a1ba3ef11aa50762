"""Structured Streaming: micro-batch window aggs, rolling sink, stateful
sessionization — driven end-to-end with availableNow triggers over the
static events table replayed as a file stream."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from eel_spark.streaming import (
    EventStream,
    rolling_parquet_stream_sink,
    session_window_agg,
    sessionize_stateful,
    tumbling_window_agg,
)

SF = "/root/testdata/sf0.001"


def _run_available_now(df, tmp_path, name, output_mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_tumbling_window_stream(spark, tmp_path):
    events = EventStream(spark, SF + "/events.parquet").stream()
    agg = tumbling_window_agg(events, window="1 hour", watermark="0 seconds")
    # complete mode: in append mode the final window is (correctly) withheld
    # because the watermark never passes its end; complete emits everything,
    # so the batch cross-check below can demand exact equality.
    _run_available_now(agg, tmp_path, "tumbling", output_mode="complete")
    got = spark.sql("SELECT * FROM tumbling").collect()
    assert len(got) > 0
    # cross-check against the batch twin
    batch = (
        spark.read.parquet(f"{SF}/events.parquet")
        .withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    batch_n = {(r["w"]["start"], r["event_type"]): r["n"] for r in batch.collect()}
    stream_n = {(r["window_start"], r["event_type"]): r["n"] for r in got}
    assert stream_n == batch_n


def test_session_window_stream(spark, tmp_path):
    events = EventStream(spark, SF + "/events.parquet").stream()
    agg = session_window_agg(events, gap="30 minutes", watermark="0 seconds")
    # complete mode: append would (correctly) withhold sessions the
    # watermark hasn't closed yet, so totals wouldn't match the batch twin.
    _run_available_now(agg, tmp_path, "sessions", output_mode="complete")
    got = spark.sql("SELECT * FROM sessions").collect()
    assert len(got) > 0
    assert all(r["session_end"] > r["session_start"] for r in got)
    # session counts per user must sum to the user's event count
    totals = {}
    for r in got:
        totals[r["user_id"]] = totals.get(r["user_id"], 0) + r["n_events"]
    batch = (
        spark.read.parquet(f"{SF}/events.parquet").groupBy("user_id").count().collect()
    )
    assert totals == {r["user_id"]: r["count"] for r in batch}


def test_rolling_parquet_sink(spark, tmp_path):
    events = EventStream(spark, SF + "/events.parquet").stream()
    out = str(tmp_path / "rolled")
    q = rolling_parquet_stream_sink(
        events, out, str(tmp_path / "ckpt_roll"), max_records_per_file=200
    )
    q.awaitTermination(120)
    files = glob.glob(os.path.join(out, "*.parquet"))
    assert len(files) >= 5  # 1000 events / 200 per file
    assert spark.read.parquet(out).count() == 1000


def test_stateful_sessionize(spark, tmp_path):
    events = EventStream(spark, SF + "/events.parquet").stream()
    sess = sessionize_stateful(events)
    _run_available_now(sess, tmp_path, "stateful", output_mode="update")
    got = spark.sql("SELECT * FROM stateful").collect()
    assert len(got) > 0
    by_user = {r["user_id"]: r for r in got}
    batch = (
        spark.read.parquet(f"{SF}/events.parquet").groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    )
    for r in batch:
        assert by_user[r["user_id"]]["n_events"] == r["n"]
