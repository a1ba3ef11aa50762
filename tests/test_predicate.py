"""Predicate DSL (Predicate.scala:1 parity): tree construction, Column
compilation, SQL rendering, and — the part that matters at 100 TB — that
a source-attached predicate reaches the parquet scan as PushedFilters."""

from __future__ import annotations

from eel_spark import predicate as P
from eel_spark.sources import ParquetSource

SF = "/root/testdata/sf0.001"


def test_tree_fields_and_sql():
    p = (P.equals("a", 1) & P.gt("b", 2.5)) | ~P.not_equals("c", "x'y")
    assert p.fields() == ["a", "b", "c"]
    assert p.to_sql() == "((a = 1 AND b > 2.5) OR NOT (c <> 'x''y'))"


def test_factories_match_operator_overloads():
    assert P.and_(P.lt("x", 1), P.lte("x", 2)).to_sql() == (
        (P.lt("x", 1) & P.lte("x", 2)).to_sql()
    )
    assert P.or_(P.gte("x", 1), P.not_(P.equals("x", 0))).to_sql() == (
        (P.gte("x", 1) | ~P.equals("x", 0)).to_sql()
    )


def test_predicate_filters_rows(spark):
    src = ParquetSource(f"{SF}/nation.parquet").with_predicate(
        P.equals("n_regionkey", 0) | P.equals("n_regionkey", 1)
    )
    ds = src.to_datastream(spark)
    keys = {r["n_regionkey"] for r in ds.collect()}
    assert keys == {0, 1}


def test_predicate_reaches_parquet_scan(spark):
    """The compiled predicate must show up as PushedFilters on the scan
    (the reference hand-compiles this per format; Catalyst does it for
    every source from the one Column expression)."""
    src = ParquetSource(f"{SF}/lineitem.parquet").with_predicate(
        P.gt("l_quantity", 45.0)
    ).with_projection("l_orderkey", "l_quantity")
    df = src.to_datastream(spark).df
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters" in plan
    assert "GreaterThan(l_quantity,45.0)" in plan, plan
    # projection pruned the scan to the two referenced columns
    assert "l_extendedprice" not in plan.split("ReadSchema")[1][:200]


def test_sql_fragment_matches_column_compilation(spark, oracle):
    """to_sql() renders an engine-portable WHERE fragment (used for JDBC
    subqueries / hive partition_filter strings) that selects exactly the
    rows the Column compilation selects."""
    p = P.gte("n_regionkey", 2) & ~P.equals("n_name", "JAPAN")
    duck_n = oracle.execute(
        f"SELECT COUNT(*) FROM nation WHERE {p.to_sql()}"
    ).fetchone()[0]
    spark_n = (
        spark.read.parquet(f"{SF}/nation.parquet").filter(p.to_column()).count()
    )
    assert duck_n == spark_n > 0


def test_empty_composite_rejected():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least one predicate"):
        P.and_()
    with _pytest.raises(ValueError, match="at least one predicate"):
        P.or_()


def test_to_sql_identifier_quoting_and_nulls():
    """ADVICE round 4: odd identifiers quote with '""' escaping, NULL
    renders as IS (NOT) NULL on both compile targets, non-finite floats
    and NULL under ordering operators are rejected outright."""
    import math

    import pytest

    from eel_spark import predicate as P

    assert P.equals("plain_name", 1).to_sql() == "plain_name = 1"
    assert P.equals("odd name", 1).to_sql() == '"odd name" = 1'
    assert P.equals('we"ird', 1).to_sql() == '"we""ird" = 1'
    assert P.gt("k", 5).to_sql(quote_all=True) == '"k" > 5'

    assert P.equals("c", None).to_sql() == "c IS NULL"
    assert P.not_equals("c", None).to_sql() == "c IS NOT NULL"
    with pytest.raises(ValueError, match="NULL"):
        P.gt("c", None)
    for bad in (math.inf, -math.inf, math.nan):
        with pytest.raises(ValueError, match="non-finite"):
            P.equals("c", bad).to_sql()


def test_null_predicate_compiles_to_is_null(spark):
    from eel_spark import predicate as P
    from eel_spark.datastream import from_values

    ds = from_values(spark, ["k", "v"], [(1, "a"), (2, None), (3, "b")])
    got = ds.df.filter(P.equals("v", None).to_column()).collect()
    assert [r["k"] for r in got] == [2]
    got = ds.df.filter(P.not_equals("v", None).to_column()).collect()
    assert sorted(r["k"] for r in got) == [1, 3]


def test_to_sql_dialect_quoting():
    """MySQL's default sql_mode parses "col" as a string literal — a
    double-quoted identifier silently compares a constant. The quote
    parameter renders backticks / brackets per dialect, with the
    dialect's own escape doubling."""
    from eel_spark import predicate as P

    p = P.gt("n_nationkey", 9)
    assert p.to_sql(quote_all=True, quote="`") == "`n_nationkey` > 9"
    assert p.to_sql(quote_all=True, quote="[") == "[n_nationkey] > 9"
    assert P.equals("we`ird", 1).to_sql(quote="`") == "`we``ird` = 1"
    assert P.equals("we]ird", 1).to_sql(quote="[") == "[we]]ird] = 1"
    # composites thread the dialect through every leaf
    tree = (P.gt("a", 1) & ~P.equals("b", "x")).to_sql(quote_all=True, quote="`")
    assert tree == "(`a` > 1 AND NOT (`b` = 'x'))"


def test_jdbc_quote_char_from_url():
    from eel_spark.sources.jdbc import (
        BucketPartitionStrategy,
        HashPartitionStrategy,
        JdbcSource,
        quote_char_for_url,
    )
    from eel_spark import predicate as P

    assert quote_char_for_url("jdbc:mysql://h/db") == "`"
    assert quote_char_for_url("jdbc:mariadb://h/db") == "`"
    assert quote_char_for_url("jdbc:sqlserver://h;databaseName=db") == "["
    assert quote_char_for_url("jdbc:derby:memory:x;create=true") == '"'
    assert quote_char_for_url("jdbc:postgresql://h/db") == '"'

    src = JdbcSource("jdbc:mysql://h/db", "t", where=P.gt("n_nationkey", 9))
    assert "`n_nationkey` > 9" in src._read_table()
    # partition-strategy predicates run DB-side too — same dialect
    assert HashPartitionStrategy("k", 2).predicates("`")[0].startswith(
        "MOD(MOD(`k`, 2)"
    )
    assert BucketPartitionStrategy("k", [[1, 2]]).predicates("`") == [
        "`k` IN (1, 2)"
    ]
