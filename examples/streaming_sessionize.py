"""Replay the events table as a stream and run watermarked session
windows plus the custom stateful sessionizer.

Usage: python examples/streaming_sessionize.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import tempfile

from eel_spark.session import get_session
from eel_spark.streaming import EventStream, session_window_agg

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_session("streaming-example")

events = EventStream(spark, f"{sf_dir}/events.parquet").stream()
sessions = session_window_agg(events, gap="30 minutes", watermark="0 seconds")

ckpt = tempfile.mkdtemp(prefix="ckpt_")
q = (
    sessions.writeStream.format("memory").queryName("sessions")
    .outputMode("complete").option("checkpointLocation", ckpt)
    .trigger(availableNow=True).start()
)
q.awaitTermination(120)
spark.sql(
    "SELECT user_id, COUNT(*) AS n_sessions, SUM(n_events) AS events "
    "FROM sessions GROUP BY user_id ORDER BY user_id"
).show(10)
