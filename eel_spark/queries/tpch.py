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

from eel_spark.queries.registry import query


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


# ---------------------------------------------------------------------------
# Q3 — shipping priority (join: customer ⋈ orders ⋈ lineitem, top-k)
# ---------------------------------------------------------------------------

_Q3_SQL = f"""
SELECT
  l_orderkey,
  {sql_money_sum(_DISC4, 4)} AS revenue,
  CAST(o_orderdate AS DATE) AS orderdate,
  o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("q3_shipping_priority", _Q3_SQL)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataStream:
    """Top-10 unshipped-revenue orders for one market segment.

    Scale: customer is a dimension at every SF → broadcast both joins'
    small sides; the lineitem shipdate filter pushes to the scan; the
    top-10 is a TakeOrderedAndProject (no global sort materialization).
    """
    cust = (
        table(spark, sf_dir, "customer")
        .filter("c_mktsegment = 'BUILDING'")
        .projection("c_custkey")
    )
    orders = (
        table(spark, sf_dir, "orders")
        .filter("o_orderdate < timestamp '1997-01-01 00:00:00'")
        .projection("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        "l_shipdate > timestamp '1997-01-01 00:00:00'"
    )
    joined = li.rename_field("l_orderkey", "o_orderkey").join(
        "o_orderkey",
        orders.join("o_custkey", cust.rename_field("c_custkey", "o_custkey")),
    )
    out = (
        joined.group_by(
            F.col("o_orderkey").alias("l_orderkey"),
            F.to_date("o_orderdate").alias("orderdate"),
            F.col("o_orderpriority"),
        )
        .agg(money_sum(_disc4(), 4).alias("revenue"))
        .to_datastream()
    )
    return DataStream(
        out.df.orderBy(F.desc("revenue"), F.asc("l_orderkey")).limit(10)
    ).projection("l_orderkey", "revenue", "orderdate", "o_orderpriority")


# ---------------------------------------------------------------------------
# Q4 — order priority checking (EXISTS semi-join)
# ---------------------------------------------------------------------------

_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""


@query("q4_order_priority", _Q4_SQL, gated=False)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataStream:
    """EXISTS → left-semi join; Spark never materializes the subquery,
    and the semi-join short-circuits per key.

    Rotated to the ungated tier in round 13 (eighth rotation, directed
    by the r12 verdict): the slot went to sampling_leakage_split; the
    EXISTS de-correlation shape stays gated via q21's anti/semi chain,
    and this query keeps its 2-SF pytest oracle in test_ungated.py."""
    orders = table(spark, sf_dir, "orders").filter(
        "o_orderdate >= timestamp '1996-01-01 00:00:00' AND "
        "o_orderdate < timestamp '1997-01-01 00:00:00'"
    )
    li = table(spark, sf_dir, "lineitem").projection("l_orderkey", "l_shipdate")
    semi = orders.df.join(
        li.df,
        on=[
            li.df.l_orderkey == orders.df.o_orderkey,
            li.df.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
        ],
        how="left_semi",
    )
    return (
        DataStream(semi)
        .group_by("o_orderpriority")
        .count("order_count")
        .to_datastream()
    )


# ---------------------------------------------------------------------------
# Q5 — local supplier volume (6-way join)
# ---------------------------------------------------------------------------

_Q5_SQL = f"""
SELECT n_name, {sql_money_sum(_DISC4, 4)} AS revenue
FROM customer
JOIN orders   ON c_custkey  = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


@query("q5_local_supplier_volume", _Q5_SQL)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataStream:
    """Classic star join: every dimension side broadcasts; the only
    shuffle is the final small group-by on n_name."""
    region = table(spark, sf_dir, "region").filter("r_name = 'ASIA'")
    nation = table(spark, sf_dir, "nation").rename_field("n_regionkey", "r_regionkey")
    asia_nations = nation.join("r_regionkey", region, broadcast_other=True)
    supplier = (
        table(spark, sf_dir, "supplier")
        .rename_field("s_nationkey", "n_nationkey")
        .join("n_nationkey", asia_nations.projection("n_nationkey", "n_name"),
              broadcast_other=True)
    )
    orders = table(spark, sf_dir, "orders").filter(
        "o_orderdate >= timestamp '1996-01-01 00:00:00' AND "
        "o_orderdate < timestamp '1998-01-01 00:00:00'"
    ).projection("o_orderkey", "o_custkey")
    cust = table(spark, sf_dir, "customer").projection("c_custkey", "c_nationkey")
    li = table(spark, sf_dir, "lineitem").projection(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    joined = (
        li.rename_field("l_suppkey", "s_suppkey")
        .join("s_suppkey", supplier, broadcast_other=True)
        .rename_field("l_orderkey", "o_orderkey")
        .join("o_orderkey", orders)
        .rename_field("o_custkey", "c_custkey")
        .join("c_custkey", cust, broadcast_other=True)
        .filter("c_nationkey = n_nationkey")
    )
    return (
        joined.group_by("n_name")
        .agg(money_sum(_disc4(), 4).alias("revenue"))
        .to_datastream()
    )


# ---------------------------------------------------------------------------
# Q6 — forecast revenue change (scan + scalar agg)
# ---------------------------------------------------------------------------

_Q6_SQL = f"""
SELECT {sql_money_sum(f"({_EPC}) * ({_DC})", 4)} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@query("q6_forecast_revenue", _Q6_SQL, gated=False)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataStream:
    """All three predicates push to the parquet scan (min/max row-group
    skipping at scale); global agg is a two-stage partial/final."""
    li = table(spark, sf_dir, "lineitem")
    rev = cents("l_extendedprice") * cents("l_discount")
    return (
        li.filter(
            "l_shipdate >= timestamp '1996-01-01 00:00:00' AND "
            "l_shipdate < timestamp '1997-01-01 00:00:00' AND "
            "l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
        )
        .aggregated()
        .agg(money_sum(rev, 4).alias("revenue"))
        .to_datastream()
    )


# ---------------------------------------------------------------------------
# Q10 — returned items (top-20 customers by lost revenue)
# ---------------------------------------------------------------------------

_Q10_SQL = f"""
SELECT c_custkey, c_name, {sql_money_sum(_DISC4, 4)} AS revenue, c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("q10_returned_items", _Q10_SQL, gated=False)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataStream:
    """Fact-side filters first, broadcast dims, TakeOrdered top-20."""
    orders = table(spark, sf_dir, "orders").filter(
        "o_orderdate >= timestamp '1996-01-01 00:00:00' AND "
        "o_orderdate < timestamp '1996-07-01 00:00:00'"
    ).projection("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").filter("l_returnflag = 'R'").projection(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation").projection("n_nationkey", "n_name")
    joined = (
        li.rename_field("l_orderkey", "o_orderkey")
        .join("o_orderkey", orders)
        .rename_field("o_custkey", "c_custkey")
        .join("c_custkey", cust, broadcast_other=True)
        .rename_field("c_nationkey", "n_nationkey")
        .join("n_nationkey", nation, broadcast_other=True)
    )
    grouped = (
        joined.group_by("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(money_sum(_disc4(), 4).alias("revenue"))
        .to_datastream()
    )
    return DataStream(
        grouped.df.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(20)
    ).projection("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")


# ---------------------------------------------------------------------------
# Q12 (adapted: no shipmode column) — priority classes per line volume
# ---------------------------------------------------------------------------

_Q12_SQL = """
SELECT
  o_orderpriority,
  CAST(SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN l_quantity <= 25 THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY o_orderpriority
"""


@query("q12_priority_lines", _Q12_SQL, gated=False)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataStream:
    """Conditional aggregation (SUM CASE) — single shuffle on the join key,
    group-by rides the same exchange under AQE."""
    orders = table(spark, sf_dir, "orders").projection("o_orderkey", "o_orderpriority")
    li = table(spark, sf_dir, "lineitem").filter(
        "l_shipdate >= timestamp '1996-01-01 00:00:00' AND "
        "l_shipdate < timestamp '1997-01-01 00:00:00'"
    ).projection("l_orderkey", "l_quantity")
    joined = li.rename_field("l_orderkey", "o_orderkey").join("o_orderkey", orders)
    return (
        joined.group_by("o_orderpriority")
        .agg(
            F.sum(F.when(F.col("l_quantity") > 25, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(F.col("l_quantity") <= 25, 1).otherwise(0)).alias("low_line_count"),
        )
        .to_datastream()
    )


# ---------------------------------------------------------------------------
# Q14 — promo revenue ratio
# ---------------------------------------------------------------------------

_Q14_SQL = f"""
SELECT
  100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_DISC4} ELSE 0 END) AS DOUBLE)
        / CAST(SUM({_DISC4}) AS DOUBLE) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
"""


@query("q14_promo_revenue", _Q14_SQL, gated=False)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataStream:
    """Ratio of exact integer sums → deterministic double; part is a
    broadcast dimension."""
    part = table(spark, sf_dir, "part").projection("p_partkey", "p_type")
    li = table(spark, sf_dir, "lineitem").filter(
        "l_shipdate >= timestamp '1996-09-01 00:00:00' AND "
        "l_shipdate < timestamp '1996-10-01 00:00:00'"
    )
    joined = li.rename_field("l_partkey", "p_partkey").join(
        "p_partkey", part, broadcast_other=True
    )
    promo = F.sum(F.when(F.col("p_type") == "PROMO", _disc4()).otherwise(F.lit(0)))
    total = F.sum(_disc4())
    return (
        joined.aggregated()
        .agg((F.lit(100.0) * promo.cast("double") / total.cast("double")).alias("promo_revenue"))
        .to_datastream()
    )


# ---------------------------------------------------------------------------
# Q18 — large volume customers (agg → having → join back)
# ---------------------------------------------------------------------------

_Q18_SQL = f"""
SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
       o_totalprice, {sql_money_sum(_QC)} AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM({_QC}) > 15000
)
GROUP BY c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


@query("q18_large_volume_customers", _Q18_SQL)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataStream:
    """Large-volume customers with ONE pass over the fact table.

    The r13 shape ran the textbook plan: aggregate lineitem for the
    HAVING list, semi-join orders against it, then join lineitem AGAIN
    and re-aggregate per order — two full fact-table scans and a second
    agg exchange. But the final ``sum(l_quantity)`` group includes
    ``o_orderkey``, and every other group column is functionally
    dependent on it (o_orderkey is the orders PK), so the per-order sum
    IS the value the HAVING aggregate already computed. Joining the
    filtered (orderkey, qty) aggregate straight to orders + customer
    returns the identical rows — all sums are exact integer cents, so
    there is no fold-order drift to re-verify — from one lineitem scan,
    no semi-join, and no second aggregation (plan: 2 scans of lineitem
    → 1, Exchange count 5 → 3; sf0.1 steady 1.44 → ~1.1 s)."""
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.group_by("l_orderkey")
        .agg(F.sum(_qc()).alias("qty_c"))
        .to_datastream()
        .filter("qty_c > 15000")
        .rename_field("l_orderkey", "o_orderkey")
    )
    orders = table(spark, sf_dir, "orders").projection(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = table(spark, sf_dir, "customer").projection("c_custkey", "c_name")
    joined = (
        orders.join("o_orderkey", big, broadcast_other=True)
        .rename_field("o_custkey", "c_custkey")
        .join("c_custkey", cust, broadcast_other=True)
    )
    out = joined.df.select(
        "c_name", "c_custkey", "o_orderkey",
        F.to_date("o_orderdate").alias("orderdate"),
        F.col("o_totalprice"),
        (F.col("qty_c").cast("double") / F.lit(100.0)).alias("sum_qty"),
    )
    return DataStream(
        out.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(100)
    ).projection("c_name", "c_custkey", "o_orderkey", "orderdate", "o_totalprice", "sum_qty")


# ---------------------------------------------------------------------------
# Q19 — disjunctive predicate revenue (OR-of-ANDs pushdown)
# ---------------------------------------------------------------------------

_Q19_SQL = f"""
SELECT {sql_money_sum(_DISC4, 4)} AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)
"""


@query("q19_disjunctive_revenue", _Q19_SQL)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataStream:
    """OR-of-ANDs across both join sides: Catalyst derives the common
    residual predicates and keeps part broadcast."""
    part = table(spark, sf_dir, "part").projection("p_partkey", "p_brand", "p_size")
    li = table(spark, sf_dir, "lineitem").projection(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    joined = li.rename_field("l_partkey", "p_partkey").join(
        "p_partkey", part, broadcast_other=True
    ).filter(
        "(p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20) OR "
        "(p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30) OR "
        "(p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)"
    )
    return (
        joined.aggregated().agg(money_sum(_disc4(), 4).alias("revenue")).to_datastream()
    )


# ---------------------------------------------------------------------------
# Q2-like — cheapest supplier per part (window dedup / argmin)
# ---------------------------------------------------------------------------

_Q2_SQL = """
SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal
FROM (
  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal,
         ROW_NUMBER() OVER (PARTITION BY p_partkey ORDER BY s_acctbal, s_suppkey) AS rn
  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
) WHERE rn = 1
ORDER BY p_partkey
"""


@query("q2_min_cost_supplier", _Q2_SQL)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataStream:
    """argmin-per-group via rank window with a unique tie-break; the
    distinct pair list shrinks the fact table before any join."""
    pairs = (
        table(spark, sf_dir, "lineitem")
        .projection("l_partkey", "l_suppkey")
        .df.distinct()
    )
    part = table(spark, sf_dir, "part").projection("p_partkey", "p_name").df
    supp = table(spark, sf_dir, "supplier").projection(
        "s_suppkey", "s_name", "s_acctbal"
    ).df
    from pyspark.sql import Window

    joined = (
        pairs.join(part, pairs.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), pairs.l_suppkey == supp.s_suppkey)
    )
    w = Window.partitionBy("p_partkey").orderBy(F.asc("s_acctbal"), F.asc("s_suppkey"))
    out = (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal")
    )
    return DataStream(out)


# ---------------------------------------------------------------------------
# Q22-like — rich inactive customers (scalar subquery + anti join)
# ---------------------------------------------------------------------------

_Q22_SQL = f"""
SELECT c_mktsegment, COUNT(*) AS numcust, {sql_money_sum(sql_cents('c_acctbal'))} AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(SUM({sql_cents('c_acctbal')}) AS DOUBLE) / COUNT(*) / 100.0
    FROM customer WHERE c_acctbal > 0.0
  )
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1998-08-01 00:00:00')
GROUP BY c_mktsegment
"""


@query("q22_rich_inactive", _Q22_SQL)
def q22_rich_inactive(spark: SparkSession, sf_dir: str) -> DataStream:
    """Scalar average (exact integer-cents → deterministic threshold),
    broadcast to every partition; NOT EXISTS → left-anti join. "Inactive"
    = no order since 1998-08-01 (the synthetic data gives every customer
    SOME order, so the pure no-orders-ever predicate selected zero rows
    at every SF — a vacuous correctness check; the anti-join shape is
    identical)."""
    cust = table(spark, sf_dir, "customer")
    avg_bal = (
        cust.filter("c_acctbal > 0.0")
        .aggregated()
        .agg(money_avg(cents("c_acctbal")).alias("avg_bal"))
        .to_datastream()
    )
    orders = (
        table(spark, sf_dir, "orders")
        .filter("o_orderdate >= TIMESTAMP '1998-08-01 00:00:00'")
        .projection("o_custkey")
    )
    rich = DataStream(cust.df.crossJoin(F.broadcast(avg_bal.df))).filter(
        "c_acctbal > avg_bal"
    )
    inactive = DataStream(
        rich.df.join(orders.df, rich.df.c_custkey == orders.df.o_custkey, "left_anti")
    )
    return (
        inactive.group_by("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money_sum(cents("c_acctbal")).alias("totacctbal"),
        )
        .to_datastream()
    )
