"""Managed-table lifecycle: ingest with schema evolution -> file listing
-> watcher-triggered incremental loads -> compaction -> exactly-once
streaming replays -> profile/expectations gate -> MERGE-style upsert.

Usage: python examples/table_management.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from eel_spark.datastream import DataStream
from eel_spark.session import get_session
from eel_spark.sources import HiveSink, HiveTable
from eel_spark.sources.hdfs import HdfsSource, HdfsWatcher
from eel_spark.streaming import EventStream, idempotent_batch_sink

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_session("table-mgmt-example")
work = tempfile.mkdtemp(prefix="eel_mgmt_")

# 1. initial load into a managed table
nation = DataStream(spark.read.parquet(f"{sf_dir}/nation.parquet"))
spark.sql("DROP TABLE IF EXISTS demo_nation")
n = HiveSink("demo_nation", mode="overwrite").write(nation)
print(f"initial load: {n} rows")

# 2. schema evolution: a new upstream field appears — evolution=True adds
#    the column (old rows read NULL) instead of erroring
enriched = DataStream(
    spark.read.parquet(f"{sf_dir}/nation.parquet")
    .limit(3)
    .withColumn("n_nationkey", F.col("n_nationkey") + 1000)
    .withColumn("iso_code", F.upper(F.substring("n_name", 1, 2)))
)
HiveSink("demo_nation", mode="append", evolution=True).write(enriched)
spark.table("demo_nation").orderBy(F.desc("n_nationkey")).show(5)

# 3. list the table's files with ownership/permission metadata
warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
listing = HdfsSource(os.path.join(warehouse, "demo_nation", "*")).to_datastream(spark)
listing.projection("name", "length", "permission").df.show(5, truncate=False)

# 4. watcher: detect newly landed files between polls (driver-side
#    orchestration; the streaming file source is the exactly-once data path)
inbox = os.path.join(work, "inbox")
os.makedirs(inbox)
watcher = HdfsWatcher(spark, os.path.join(inbox, "*", "*.parquet"))
print("fresh files, poll 1:", len(watcher.poll_once()))
nation.df.limit(5).coalesce(1).write.mode("overwrite").parquet(
    os.path.join(inbox, "batch1.parquet")
)
print("fresh files, poll 2:", len(watcher.poll_once()))

# 5. compaction: many small files -> bounded files, partition scheme kept
t = HiveTable(spark, "demo_nation")
t.compact(target_files=1)
print("post-compaction stats:", t.stats())

# 6. exactly-once streaming load: replaying the same batches overwrites
#    their own batch_id partitions instead of duplicating
out = os.path.join(work, "events_exactly_once")
events = EventStream(spark, f"{sf_dir}/events.parquet").stream()
q = idempotent_batch_sink(events, out, os.path.join(work, "ck1"))
q.awaitTermination(60)
first = spark.read.parquet(out).count()
q2 = idempotent_batch_sink(events, out, os.path.join(work, "ck2"))  # replay
q2.awaitTermination(60)
print(f"rows after load: {first}; after full replay: {spark.read.parquet(out).count()}")

# 7. pre-publish gate: profile the landed table, then enforce
#    expectations in one pass each (the CI shape — raise_on_failure)
from eel_spark.operators import expectations as E
from eel_spark.operators.profile import profile

landed = spark.read.parquet(out)
for col in profile(landed, cols=["event_id", "value"]):
    print("profile:", col["name"], {k: col[k] for k in ("nulls", "min", "max") if k in col})
ok, report = E.validate(
    landed,
    [E.row_count_between(1), E.not_null("event_id"), E.unique("event_id")],
    raise_on_failure=True,
)
print("expectations:", [(r["check"], r["passed"]) for r in report])

# 8. MERGE-style upsert: correct a slice of rows + append new ones, by
#    key, rewriting only the touched batch_id partitions
from eel_spark.operators.upsert import upsert_parquet

fixes = landed.limit(50).withColumn("value", F.col("value") * 0.0)
news = landed.limit(20).withColumn("event_id", F.col("event_id") + 10_000_000)
stats = upsert_parquet(
    spark, out, fixes.unionByName(news), "event_id", partition_col="batch_id"
)
print("upsert:", stats, "| rows now:", spark.read.parquet(out).count())

spark.sql("DROP TABLE demo_nation")
