"""TPC-H-style analytical queries over the test star schema, expressed
through the eel_spark DataStream API (the same operator surface the
reference exposes: filter → group_by → agg → join — DataStream.scala,
GroupedDataStream.scala), with DuckDB oracle SQL alongside each query.

Scale notes per query are in the docstrings; the common rules:
- dimension joins are broadcast (region/nation/customer/supplier/part are
  tiny relative to fact tables at any SF),
- aggregates are partial+final hash aggregations,
- filters are expressed declaratively so they push to the parquet scan,
- money aggregation uses exact integer-cents (see tables.py docstring).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from eel_spark.datastream import DataStream
from eel_spark.queries.tables import (
    cents, money_avg, money_sum,
    sql_cents, sql_money_avg, sql_money_sum, table,
)

QUERIES = {}
ORACLE = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str):
            out = fn(spark, sf_dir)
            return out.df if isinstance(out, DataStream) else out
        wrapped.__name__ = name
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLE[name] = oracle
        return wrapped
    return deco


# integer-cents building blocks shared by the money queries (see tables.py):
# qc: quantity in cents; epc: extendedprice in cents; dc/tc: discount/tax
# in cents; per-row products are exact integers at scale 4 / 6.
_QC = sql_cents("l_quantity")
_EPC = sql_cents("l_extendedprice")
_DC = sql_cents("l_discount")
_TC = sql_cents("l_tax")
_DISC4 = f"({_EPC}) * (100 - {_DC})"            # scale-4 integer
_CHARGE6 = f"({_DISC4}) * (100 + {_TC})"        # scale-6 integer


def _qc():
    return cents("l_quantity")


def _epc():
    return cents("l_extendedprice")


def _disc4():
    return _epc() * (100 - cents("l_discount"))


def _charge6():
    return _disc4() * (100 + cents("l_tax"))


# ---------------------------------------------------------------------------
# Q1 — pricing summary report (TPC-H Q1 shape)
# ---------------------------------------------------------------------------

_Q1_SQL = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_money_sum(_QC)} AS sum_qty,
  {sql_money_sum(_EPC)} AS sum_base_price,
  {sql_money_sum(_DISC4, 4)} AS sum_disc_price,
  {sql_money_sum(_CHARGE6, 6)} AS sum_charge,
  {sql_money_avg(_QC)} AS avg_qty,
  {sql_money_avg(_EPC)} AS avg_price,
  {sql_money_avg(_DC)} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("q1_pricing_summary", _Q1_SQL)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataStream:
    """Pricing summary: scan-heavy single-table agg.

    Scale: only the shipdate filter + 7 columns reach the scan (pushdown +
    pruning, verified in tests/test_plans.py); 6 distinct group keys →
    partial aggregation collapses ~everything map-side; no shuffle pressure
    at any SF. Exact integer-cents aggregation (tables.py) keeps the hot
    loop in long arithmetic inside WholeStageCodegen.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter("l_shipdate <= timestamp '1998-09-02 00:00:00'")
        .group_by("l_returnflag", "l_linestatus")
        .agg(
            money_sum(_qc()).alias("sum_qty"),
            money_sum(_epc()).alias("sum_base_price"),
            money_sum(_disc4(), 4).alias("sum_disc_price"),
            money_sum(_charge6(), 6).alias("sum_charge"),
            money_avg(_qc()).alias("avg_qty"),
            money_avg(_epc()).alias("avg_price"),
            money_avg(cents("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .to_datastream()
    )
