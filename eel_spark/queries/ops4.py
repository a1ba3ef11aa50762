"""Round-7 gated queries: CORRECTNESS coverage for the round-7 operator
families — SCD2 dimension versioning (operators/scd2.py) and
certified-exact heavy hitters (operators/frequency.py). Same oracle
conventions as ops3.py (SURVEY.md §6): no raw TIMESTAMP output, every
computed column aliased identically on both sides, deterministic total
orders wherever ordering affects values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eel_spark.queries.registry import query
from eel_spark.queries.tables import table

# -- SCD2 rebuild from a change log (operators/scd2.scd2_from_changes) ------

_SCD2_ASOF_DATE = "1995-06-17"

_SCD2_SQL = f"""
WITH obs AS (
  SELECT o_custkey, o_orderpriority,
         CAST(o_orderdate AS DATE) AS d, o_orderkey,
         LAG(o_orderpriority) OVER (
           PARTITION BY o_custkey
           ORDER BY CAST(o_orderdate AS DATE), o_orderkey
         ) AS prev
  FROM orders
), changes AS (
  SELECT o_custkey, o_orderpriority, d, o_orderkey
  FROM obs WHERE prev IS NULL OR prev <> o_orderpriority
), versions AS (
  SELECT o_custkey, o_orderpriority,
         d AS valid_from,
         LEAD(d) OVER w AS valid_to,
         LEAD(d) OVER w IS NULL AS is_current
  FROM changes
  WINDOW w AS (PARTITION BY o_custkey ORDER BY d, o_orderkey)
)
SELECT o_custkey, o_orderpriority, valid_from, valid_to, is_current
FROM versions
WHERE valid_from <= DATE '{_SCD2_ASOF_DATE}'
  AND (valid_to IS NULL OR valid_to > DATE '{_SCD2_ASOF_DATE}')
"""


@query("scd2_order_priority", _SCD2_SQL)
def scd2_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 write + temporal READ, end-to-end: each customer's
    order-priority change log is merged into a bucketed SCD2 table
    (``scd2_merge`` — collapse, splice, partitioned layout, batch
    fingerprint/markers), then ``read_scd2_asof`` reconstructs the
    dimension state as of {asof} from the written files. The oracle
    derives the same as-of state straight from the change log with an
    interval predicate, so one hash-mismatch anywhere in the
    collapse → write → as-of read chain fails the row. ``o_orderkey``
    is the deterministic tiebreaker for same-day changes (SURVEY §6).
    The full version-chain equality and the current-read partition
    pruning stay asserted in tests/test_scd2.py."""
    import os
    from datetime import date

    from eel_spark.operators.scd2 import read_scd2_asof, scd2_merge
    from eel_spark.queries.tables import fresh_scoped_tmpdir

    obs = (
        table(spark, sf_dir, "orders")
        .projection("o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey")
        .df.withColumn("d", F.col("o_orderdate").cast("date"))
    )
    # per-invocation dir (a fixed path keyed on sf_dir would race two
    # concurrent gate/bench runs); fresh_scoped_tmpdir eagerly reaps the
    # previous invocation's dir for this (query, sf_dir) scope, so
    # repeated in-session passes hold O(1) dirs — atexit backstops the
    # last one
    tag = sf_dir.strip("/").replace("/", "_")
    root = fresh_scoped_tmpdir(f"eel_scd2_gate_{tag}")
    path = os.path.join(root, "dim")
    scd2_merge(
        spark, path, obs, "o_custkey", ["o_orderpriority"], "d",
        ["o_orderkey"], n_buckets=16,
    )
    t = date.fromisoformat(_SCD2_ASOF_DATE)
    return read_scd2_asof(spark, path, t).select(
        "o_custkey", "o_orderpriority", "valid_from", "valid_to", "is_current"
    )


scd2_order_priority.__doc__ = scd2_order_priority.__doc__.format(
    asof=_SCD2_ASOF_DATE
)


# -- certified-exact heavy hitters (operators/frequency.py) -----------------

_TOPK_SQL = """
SELECT token, cnt FROM (
  SELECT token, COUNT(*) AS cnt
  FROM (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents)
  WHERE token <> ''
  GROUP BY token
)
ORDER BY cnt DESC, token
LIMIT 20
"""


@query("topk_frequent_tokens", _TOPK_SQL)
def topk_frequent_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus tokens via ``exact_topk_frequent`` — the
    Misra-Gries candidate pass bounds the shuffle to candidate keys
    (the full-vocabulary shuffle never happens), then exact counts +
    the exactness certificate prove the answer equals the oracle's
    brute-force GROUP BY. The synthetic corpus's vocabulary fits the
    default capacity, so nothing trims here (the certificate is
    bound=0); the trimming/refusal paths are property-tested in
    tests/test_frequency.py."""
    from eel_spark.operators.frequency import exact_topk_frequent

    tokens = (
        table(spark, sf_dir, "documents")
        .df.select(F.explode(F.split("text", " ")).alias("token"))
        .where(F.col("token") != "")
    )
    return exact_topk_frequent(tokens, "token", k=20, capacity=4096)
