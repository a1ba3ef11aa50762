"""TPC-H query shapes 7-21 adapted to the test star schema.

The driver's tables are a trimmed TPC-H (no partsupp, no commit/receipt
dates, no comments), so each query keeps the *shape* that matters to the
engine — correlated EXISTS, scalar-subquery thresholds, multi-way joins
with per-year rollups, distribution-of-counts — re-targeted at columns
that exist. Exactness conventions are in tables.py; the common scale
rules (broadcast dims, pushed filters, partial aggregation) in tpch.py.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from eel_spark.datastream import DataStream
from eel_spark.queries.registry import query
from eel_spark.queries.tables import (
    cents, money_sum, sql_cents, sql_money_sum, table,
)

_EPC = sql_cents("l_extendedprice")
_DC = sql_cents("l_discount")
_DISC4 = f"({_EPC}) * (100 - {_DC})"


def _disc4():
    return cents("l_extendedprice") * (100 - cents("l_discount"))


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# ---------------------------------------------------------------------------

_Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year, {sql_money_sum(_DISC4, 4)} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate) AS l_year,
         l_extendedprice, l_discount
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@query("q7_nation_volume", _Q7_SQL)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataStream:
    """Bilateral trade volume (TPC-H Q7 shape: two aliases of the same
    dimension, symmetric pair filter, per-year rollup).

    Scale: nation joins broadcast both aliases; the pair predicate prunes
    before the orders join; one shuffle for the final 3-key group-by.
    """
    nation = table(spark, sf_dir, "nation").projection("n_nationkey", "n_name").df
    supp = table(spark, sf_dir, "supplier").projection("s_suppkey", "s_nationkey").df
    cust = table(spark, sf_dir, "customer").projection("c_custkey", "c_nationkey").df
    supp_n = supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey) \
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust_n = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey) \
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    orders = table(spark, sf_dir, "orders").projection("o_orderkey", "o_custkey").df
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(
            "l_shipdate >= timestamp '1996-01-01 00:00:00' AND "
            "l_shipdate < timestamp '1998-01-01 00:00:00'"
        )
        .projection("l_orderkey", "l_suppkey", "l_shipdate",
                    "l_extendedprice", "l_discount").df
    )
    joined = (
        li.join(F.broadcast(supp_n), li.l_suppkey == supp_n.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_n), orders.o_custkey == cust_n.c_custkey)
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        DataStream(joined)
        .group_by("supp_nation", "cust_nation",
                  F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(money_sum(_disc4(), 4).alias("revenue"))
        .to_datastream()
    )


# ---------------------------------------------------------------------------
# Q8 — market share of one supplier nation within a region
# ---------------------------------------------------------------------------

_Q8_SQL = f"""
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END) AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
         {_DISC4} AS volume,
         n2.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA'
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                        AND TIMESTAMP '1997-12-31 00:00:00'
    AND p_type = 'PROMO'
) all_nations
GROUP BY o_year
"""


@query("q8_market_share", _Q8_SQL)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataStream:
    """National market share (Q8 shape: 8-way join, conditional share).

    Scale: every dimension chain (part, supplier→nation, customer→nation→
    region) broadcasts; the fact table is filtered by the pushed orderdate
    range before the big join; ratio of exact integer sums → deterministic.
    """
    region = table(spark, sf_dir, "region").filter("r_name = 'ASIA'").df
    nation = table(spark, sf_dir, "nation").df
    asia_cust_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey")
    cust = table(spark, sf_dir, "customer").projection("c_custkey", "c_nationkey").df
    cust_asia = cust.join(
        F.broadcast(asia_cust_nations),
        cust.c_nationkey == asia_cust_nations.n_nationkey,
    ).select("c_custkey")
    supp_n = (
        table(spark, sf_dir, "supplier").projection("s_suppkey", "s_nationkey").df
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    part = table(spark, sf_dir, "part").filter("p_type = 'PROMO'").projection("p_partkey").df
    orders = table(spark, sf_dir, "orders").filter(
        "o_orderdate BETWEEN timestamp '1996-01-01 00:00:00' "
        "AND timestamp '1997-12-31 00:00:00'"
    ).projection("o_orderkey", "o_custkey", "o_orderdate").df
    li = table(spark, sf_dir, "lineitem").projection(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    ).df
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp_n), li.l_suppkey == supp_n.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_asia), orders.o_custkey == cust_asia.c_custkey)
        .withColumn("volume", _disc4())
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
    )
    share = (
        joined.groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                      .otherwise(F.lit(0))).cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share")
        )
    )
    return DataStream(share)


# ---------------------------------------------------------------------------
# Q9 — product profit by nation and year (retailprice as cost proxy)
# ---------------------------------------------------------------------------

_PROFIT4 = (
    f"({_DISC4}) - {sql_cents('p_retailprice')} * {sql_cents('l_quantity')}"
)

_Q9_SQL = f"""
SELECT nation, o_year, {sql_money_sum(_PROFIT4, 4)} AS sum_profit
FROM (
  SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
         l_extendedprice, l_discount, l_quantity, p_retailprice
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%widget%'
) profit
GROUP BY nation, o_year
"""


@query("q9_product_profit", _Q9_SQL)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataStream:
    """Profit rollup (Q9 shape). partsupp doesn't exist in the test data,
    so cost = p_retailprice × quantity — same join/agg shape, exact
    integer-cents arithmetic (scale-4 both terms).

    Scale: part filter (LIKE) evaluated JVM-side before broadcast; the only
    shuffles are orders⋈lineitem and the final (nation, year) group-by.
    """
    part = table(spark, sf_dir, "part").filter(
        "p_name LIKE '%widget%'"
    ).projection("p_partkey", "p_retailprice").df
    supp_n = (
        table(spark, sf_dir, "supplier").projection("s_suppkey", "s_nationkey").df
        .join(
            F.broadcast(table(spark, sf_dir, "nation").projection("n_nationkey", "n_name").df),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    orders = table(spark, sf_dir, "orders").projection("o_orderkey", "o_orderdate").df
    li = table(spark, sf_dir, "lineitem").projection(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    ).df
    profit4 = _disc4() - cents("p_retailprice") * cents("l_quantity")
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp_n), li.l_suppkey == supp_n.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
    )
    return (
        DataStream(joined)
        .group_by("nation", "o_year")
        .agg(money_sum(profit4, 4).alias("sum_profit"))
        .to_datastream()
    )


# ---------------------------------------------------------------------------
# Q11 — important parts (scalar-subquery threshold over an aggregation)
# ---------------------------------------------------------------------------

_Q11_SQL = f"""
SELECT l_partkey, {sql_money_sum(_DISC4, 4)} AS part_value
FROM lineitem
GROUP BY l_partkey
HAVING CAST(SUM({_DISC4}) AS DOUBLE) / 10000.0 > (
  SELECT CAST(SUM({_DISC4}) AS DOUBLE) / 10000.0 * 1.6
         / COUNT(DISTINCT l_partkey)
  FROM lineitem
)
ORDER BY part_value DESC, l_partkey
"""


@query("q11_important_parts", _Q11_SQL)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataStream:
    """Parts whose revenue exceeds 1.6× the mean per-part revenue (Q11
    shape: HAVING against a scalar subquery). TPC-H's spec fraction is
    SF-relative (0.0001/SF); a fixed fraction selects ZERO parts once
    the part count grows 10× (measured at sf0.1), so the threshold here
    is mean-relative — selectivity is stable at every SF (1 / 7 / 87
    rows at sf0.001/0.01/0.1) and the scalar-subquery shape is
    unchanged. No partsupp table, so value = discounted revenue; the
    threshold divides the EXACT cents total by the part count, keeping
    the comparison deterministic across engines.

    Scale: the per-part aggregate and the global total come from the same
    scan; the scalar total is broadcast to the HAVING filter — no
    driver-side threshold math.
    """
    li = table(spark, sf_dir, "lineitem").projection(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    per_part = (
        li.group_by("l_partkey")
        .agg(money_sum(_disc4(), 4).alias("part_value"))
        .to_datastream().df
    )
    total = li.aggregated().agg(
        (
            money_sum(_disc4(), 4) * F.lit(1.6)
            / F.countDistinct("l_partkey")
        ).alias("threshold")
    ).to_datastream().df
    out = (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )
    return DataStream(out)


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (left outer + double group-by)
# ---------------------------------------------------------------------------

_Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@query("q13_customer_distribution", _Q13_SQL)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataStream:
    """Distribution of orders-per-customer including zero-order customers
    (Q13 shape: outer join with an ON-clause filter, then a group-by of a
    group-by).

    Scale: COUNT(o_orderkey) over the outer join counts only matched rows
    (NULL-skipping), so no driver logic; the second group-by is tiny.
    """
    cust = table(spark, sf_dir, "customer").projection("c_custkey").df
    orders = table(spark, sf_dir, "orders").filter(
        "o_orderpriority <> '1-URGENT'"
    ).projection("o_orderkey", "o_custkey").df
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    dist = (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )
    return DataStream(dist)


# ---------------------------------------------------------------------------
# Q15 — top supplier(s) by revenue in a quarter (agg + scalar max)
# ---------------------------------------------------------------------------

_Q15_REV = f"""
  SELECT l_suppkey AS supplier_no, {sql_money_sum(_DISC4, 4)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
"""

_Q15_SQL = f"""
WITH revenue AS ({_Q15_REV})
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@query("q15_top_supplier", _Q15_SQL)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataStream:
    """Supplier(s) achieving the maximum quarterly revenue (Q15 shape:
    view reused twice — once aggregated to a scalar, once joined back).

    Scale: the revenue aggregate is computed once per branch off the same
    pushed-down scan; the scalar max broadcasts; supplier is a broadcast
    dim. Ties are kept (same as the reference query), order is total.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        "l_shipdate >= timestamp '1996-01-01 00:00:00' AND "
        "l_shipdate < timestamp '1996-04-01 00:00:00'"
    )
    revenue = (
        li.group_by(F.col("l_suppkey").alias("supplier_no"))
        .agg(money_sum(_disc4(), 4).alias("total_revenue"))
        .to_datastream().df
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("mr"))
    supp = table(spark, sf_dir, "supplier").projection("s_suppkey", "s_name").df
    out = (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("mr"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )
    return DataStream(out)


# ---------------------------------------------------------------------------
# Q16 — supplier count per part attribute group (distinct agg + NOT IN)
# ---------------------------------------------------------------------------

_Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'ECONOMY'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@query("q16_part_supplier_counts", _Q16_SQL)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataStream:
    """Distinct-supplier counts per part attribute triple (Q16 shape:
    anti-predicates + COUNT(DISTINCT)). The part/supplier relationship
    comes from observed lineitem pairs (no partsupp table).

    Scale: the DISTINCT pair projection shrinks the fact table before the
    join; COUNT(DISTINCT) is a two-phase expand-aggregate, no driver set.
    """
    pairs = (
        table(spark, sf_dir, "lineitem")
        .projection("l_partkey", "l_suppkey").df.distinct()
    )
    part = table(spark, sf_dir, "part").filter(
        "p_brand <> 'Brand#1' AND p_type <> 'ECONOMY' "
        "AND p_size IN (1, 4, 9, 16, 25, 36, 49)"
    ).projection("p_partkey", "p_brand", "p_type", "p_size").df
    out = (
        pairs.join(F.broadcast(part), pairs.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )
    return DataStream(out)


# ---------------------------------------------------------------------------
# Q17 — small-quantity revenue (correlated avg threshold, exact integer)
# ---------------------------------------------------------------------------

# qty < 0.2 * avg(qty per part)  ⟺  qty_cents * 5 * n < sum_qty_cents
# (exact integer comparison — no float threshold divergence between engines)
_Q17_SQL = f"""
SELECT {sql_money_sum(_EPC)} / 7.0 AS avg_yearly
FROM (
  SELECT l_extendedprice
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN (
    SELECT l_partkey AS agg_partkey,
           SUM({sql_cents('l_quantity')}) AS sum_qc,
           COUNT(*) AS n_li
    FROM lineitem GROUP BY l_partkey
  ) part_agg ON agg_partkey = l_partkey
  WHERE p_brand = 'Brand#3'
    AND {sql_cents('l_quantity')} * 5 * n_li < sum_qc
) small
"""


@query("q17_small_quantity_revenue", _Q17_SQL, gated=False)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataStream:
    """Revenue from unusually small orders (Q17 shape: correlated scalar
    avg per part, de-correlated into a self-aggregation + join). The
    0.2×avg threshold is evaluated as an exact integer cross-product
    (qc·5·n < Σqc), so Spark and the oracle agree bit-for-bit.

    Scale: the per-part aggregate is tiny relative to lineitem → AQE turns
    the self-join into a broadcast; p_brand filter prunes first.
    """
    li = table(spark, sf_dir, "lineitem").projection(
        "l_partkey", "l_quantity", "l_extendedprice"
    ).df
    part_agg = (
        li.groupBy(F.col("l_partkey").alias("agg_partkey"))
        .agg(
            F.sum(cents("l_quantity")).alias("sum_qc"),
            F.count(F.lit(1)).alias("n_li"),
        )
    )
    brand = table(spark, sf_dir, "part").filter("p_brand = 'Brand#3'") \
        .projection("p_partkey").df
    small = (
        li.join(F.broadcast(brand), li.l_partkey == brand.p_partkey)
        .join(part_agg, li.l_partkey == part_agg.agg_partkey)
        .filter(cents("l_quantity") * 5 * F.col("n_li") < F.col("sum_qc"))
    )
    out = small.agg(
        (money_sum(cents("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly")
    )
    return DataStream(out)


# ---------------------------------------------------------------------------
# Q20 — suppliers with significant volume of PROMO parts (nested semi-joins)
# ---------------------------------------------------------------------------

_Q20_SQL = f"""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_type = 'PROMO'
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_suppkey
  HAVING SUM({sql_cents('l_quantity')}) > 50000
)
ORDER BY s_suppkey
"""


@query("q20_promo_part_suppliers", _Q20_SQL, gated=False)
def q20_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataStream:
    """Suppliers who moved > 500 units of PROMO parts in a year (Q20
    shape: IN-subquery over a filtered aggregate → left-semi join).

    Scale: part filter broadcasts into the fact scan; the HAVING aggregate
    output is tiny → semi-join broadcasts under AQE.
    """
    part = table(spark, sf_dir, "part").filter("p_type = 'PROMO'") \
        .projection("p_partkey").df
    li = table(spark, sf_dir, "lineitem").filter(
        "l_shipdate >= timestamp '1996-01-01 00:00:00' AND "
        "l_shipdate < timestamp '1997-01-01 00:00:00'"
    ).projection("l_partkey", "l_suppkey", "l_quantity").df
    big_suppliers = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(cents("l_quantity")).alias("qty_c"))
        .filter(F.col("qty_c") > 50000)
        .select("l_suppkey")
    )
    supp = table(spark, sf_dir, "supplier").projection("s_suppkey", "s_name").df
    out = (
        supp.join(big_suppliers, supp.s_suppkey == big_suppliers.l_suppkey, "left_semi")
        .orderBy("s_suppkey")
    )
    return DataStream(out)


# ---------------------------------------------------------------------------
# Q21 — suppliers who alone were late on multi-supplier orders
# ---------------------------------------------------------------------------

# "late" (no receipt/commit dates in test data): shipped > 90 days after
# the order date. A supplier counts when it has a late line on a finished
# ('F') multi-supplier order and is the ONLY late supplier on that order —
# the same exists / not-exists structure as TPC-H Q21, de-correlated into
# one per-order aggregate.
_Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM (
  SELECT l.l_orderkey, l.l_suppkey
  FROM lineitem l
  JOIN orders ON o_orderkey = l.l_orderkey AND o_orderstatus = 'F'
  WHERE l.l_shipdate > o_orderdate + INTERVAL 90 DAY
  GROUP BY l.l_orderkey, l.l_suppkey
) late
JOIN (
  SELECT l.l_orderkey,
         COUNT(DISTINCT l.l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN l.l_shipdate > o_orderdate + INTERVAL 90 DAY
                             THEN l.l_suppkey END) AS n_late_supp
  FROM lineitem l
  JOIN orders ON o_orderkey = l.l_orderkey AND o_orderstatus = 'F'
  GROUP BY l.l_orderkey
) stats ON late.l_orderkey = stats.l_orderkey
JOIN supplier ON s_suppkey = late.l_suppkey
WHERE n_supp >= 2 AND n_late_supp = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


@query("q21_waiting_suppliers", _Q21_SQL)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataStream:
    """Q21 shape (EXISTS other-supplier AND NOT EXISTS other-late-supplier)
    de-correlated into a single per-order aggregate: n_supp ≥ 2 and
    n_late_supp = 1 together are exactly the two correlated subqueries.

    Scale: a TWO-LEVEL aggregation of lineitem⋈orders carries
    everything — level 1 collapses to one row per (order, supplier)
    with a was-it-ever-late flag (map-side partials, no Expand), level
    2 counts suppliers/late-suppliers per order and carries the late
    supplier id itself, so the qualifying order's single waiting
    supplier pops out of the filtered aggregate directly. The pre-r14
    layout ran a separate distinct(late-pairs) branch and
    sort-merge-joined it back (a second full shuffle of the joined rows
    plus an SMJ), and a one-level multi-distinct rewrite measured
    SLOWER (two count_distincts + collect_set force a 3-way Expand of
    the aggregation input). n_late_supp = 1 bounds the set at one
    element per surviving row. No correlated per-row subquery execution
    anywhere.
    """
    orders = table(spark, sf_dir, "orders").filter("o_orderstatus = 'F'") \
        .projection("o_orderkey", "o_orderdate").df
    li = table(spark, sf_dir, "lineitem").projection(
        "l_orderkey", "l_suppkey", "l_shipdate"
    ).df
    lo = li.join(orders, li.l_orderkey == orders.o_orderkey).withColumn(
        "is_late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
    )
    per_supp = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("is_late").cast("int")).alias("__late")
    )
    stats = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("__late").alias("n_late_supp"),
        F.collect_set(
            F.when(F.col("__late") == 1, F.col("l_suppkey"))
        ).alias("late_supps"),
    )
    supp = table(spark, sf_dir, "supplier").projection("s_suppkey", "s_name").df
    out = (
        stats.filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .select(F.explode("late_supps").alias("l_suppkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )
    return DataStream(out)
