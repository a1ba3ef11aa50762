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

_SCD2_SQL = """
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
)
SELECT o_custkey, o_orderpriority,
       d AS valid_from,
       LEAD(d) OVER w AS valid_to,
       LEAD(d) OVER w IS NULL AS is_current
FROM changes
WINDOW w AS (PARTITION BY o_custkey ORDER BY d, o_orderkey)
"""


@query("scd2_order_priority", _SCD2_SQL)
def scd2_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension rebuild: each customer's order-priority history as
    version rows — consecutive orders with the same priority collapse,
    a change closes the open version (``valid_to`` = the next version's
    ``valid_from``) and opens a new one. ``o_orderkey`` is the
    deterministic tiebreaker for same-day changes (SURVEY §6: ordering
    that affects values must be total). Plan: ONE hash exchange on the
    key — change-detect lag and validity lead share it
    (plan-asserted in tests/test_scd2.py)."""
    from eel_spark.operators.scd2 import scd2_from_changes

    obs = (
        table(spark, sf_dir, "orders")
        .projection("o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey")
        .df.withColumn("d", F.col("o_orderdate").cast("date"))
    )
    return scd2_from_changes(
        obs, "o_custkey", ["o_orderpriority"], "d", ["o_orderkey"]
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
