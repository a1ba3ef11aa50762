"""CLI surface (eel-cli analogue): schema / stream / analyze / sql driven
in-process through main()."""

from __future__ import annotations

import json

from eel_spark.cli import main

SF = "/root/testdata/sf0.001"


def test_schema(capsys, spark):
    assert main(["schema", f"{SF}/nation.parquet"]) == 0
    out = capsys.readouterr().out
    assert "n_nationkey: int" in out and "n_name: string" in out


def test_stream_copy_with_filter(tmp_path, capsys, spark):
    dest = str(tmp_path / "nations_copy")
    rc = main([
        "stream", f"{SF}/nation.parquet", f"parquet:{dest}",
        "--filter", "n_regionkey = 0", "--projection", "n_nationkey,n_name",
    ])
    assert rc == 0
    assert "rows written" in capsys.readouterr().out
    got = spark.read.parquet(dest)
    assert got.columns == ["n_nationkey", "n_name"]
    assert got.count() == 5


def test_stream_to_csv_roundtrip(tmp_path, capsys, spark):
    dest = str(tmp_path / "region_csv")
    assert main(["stream", f"{SF}/region.parquet", f"csv:{dest}"]) == 0
    back = spark.read.option("header", "true").csv(dest)
    assert back.count() == 5


def test_analyze(capsys, spark):
    assert main(["analyze", f"{SF}/region.parquet"]) == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["rows"] == 5
    assert stats["columns"]["r_name"]["nulls"] == 0
    assert stats["columns"]["r_regionkey"]["min"] == "0"


def test_sql(capsys, spark):
    rc = main([
        "sql", "SELECT COUNT(*) AS n FROM r WHERE r_regionkey >= 0",
        "--table", f"r={SF}/region.parquet",
    ])
    assert rc == 0
    rows = [json.loads(line) for line in capsys.readouterr().out.splitlines()]
    assert rows == [{"n": 5}]


def test_fetch_and_apply_spec(capsys, spark):
    src = spark.read.parquet(f"{SF}/nation.parquet")
    src.write.mode("overwrite").format("parquet").partitionBy("n_regionkey") \
        .saveAsTable("spec_src")
    try:
        assert main(["fetch-spec", "spec_src"]) == 0
        spec = json.loads(capsys.readouterr().out)
        assert spec["table"] == "spec_src"
        assert {f["name"] for f in spec["partitioned_by"]} == {"n_regionkey"}
        assert {f["name"] for f in spec["fields"]} == {"n_nationkey", "n_name"}

        spec["table"] = "spec_clone"
        import json as _json, tempfile, os
        fd, path = tempfile.mkstemp(suffix=".json")
        with os.fdopen(fd, "w") as fh:
            _json.dump(spec, fh)
        assert main(["apply-spec", path]) == 0
        cols = {c.name: c.isPartition for c in spark.catalog.listColumns("spec_clone")}
        assert cols == {"n_nationkey": False, "n_name": False, "n_regionkey": True}
        os.unlink(path)
    finally:
        spark.sql("DROP TABLE IF EXISTS spec_src")
        spark.sql("DROP TABLE IF EXISTS spec_clone")


def test_stream_uri_options(spark, tmp_path, capsys):
    """eel-cli URI-option convention (CsvSourceParserTest parity):
    ``csv:/path?delimiter=;&header=false`` configures the component from
    the URI; unknown options error loudly."""
    from eel_spark.cli import main

    src_dir = tmp_path / "in.csv"
    import pandas as pd
    pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]}).to_csv(
        src_dir, sep=";", index=False
    )
    out = tmp_path / "out_csv"
    rc = main([
        "stream",
        f"csv:{src_dir}?delimiter=;&infer_schema=false",
        f"csv:{out}?delimiter=|&header=false",
    ])
    assert rc == 0
    body = "".join(p.read_text() for p in out.glob("*.csv"))
    assert "1|x" in body and "a|b" not in body  # | delim, no header

    import pytest
    with pytest.raises(SystemExit, match="unknown URI option"):
        main(["schema", f"csv:{src_dir}?bogus=1"])


def test_stream_hive_roundtrip(capsys, spark, tmp_path):
    """parquet → hive:db.table (partitioned) → hive source with partition
    pruning → csv: the eel-cli StreamMain hive-URI path end to end."""
    spark.sql("CREATE DATABASE IF NOT EXISTS cli_db")
    spark.sql("DROP TABLE IF EXISTS cli_db.nations")
    # DROP on a fresh metastore doesn't clear a stale managed-table dir
    # left by an earlier session — saveAsTable then fails with
    # LOCATION_ALREADY_EXISTS. Remove the location itself.
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/cli_db.db/nations", ignore_errors=True)
    rc = main([
        "stream", f"{SF}/nation.parquet",
        "hive:cli_db.nations?mode=overwrite",
        "--partition-by", "n_regionkey",
    ])
    assert rc == 0
    assert "25 rows written" in capsys.readouterr().out
    assert spark.table("cli_db.nations").count() == 25

    dest = str(tmp_path / "hive_out_csv")
    rc = main([
        "stream",
        "hive:cli_db.nations?partition_filter=n_regionkey%20%3D%200"
        "&projection=n_nationkey,n_name",
        f"csv:{dest}",
    ])
    assert rc == 0
    assert "5 rows written" in capsys.readouterr().out
    back = spark.read.option("header", "true").csv(dest)
    assert back.columns == ["n_nationkey", "n_name"]
    assert back.count() == 5


def test_stream_jdbc_roundtrip(capsys, spark, tmp_path):
    """parquet → jdbc:derby (embedded) → back out to parquet via the
    jdbc: URI scheme (the scheme prefix doubles as the URL prefix)."""
    db = f"{tmp_path}/cli_derby;create=true"
    drv = "org.apache.derby.jdbc.EmbeddedDriver"
    rc = main([
        "stream", f"{SF}/region.parquet",
        f"jdbc:derby:{db}?table=REGIONS&driver={drv}&mode=overwrite",
    ])
    assert rc == 0
    assert "5 rows written" in capsys.readouterr().out

    dest = str(tmp_path / "jdbc_back")
    rc = main([
        "stream", f"jdbc:derby:{db}?table=REGIONS&driver={drv}",
        f"parquet:{dest}",
    ])
    assert rc == 0
    assert spark.read.parquet(dest).count() == 5


def test_jdbc_uri_requires_table(spark):
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="table"):
        main(["schema", "jdbc:derby:memory:nope"])


def test_jdbc_uri_keeps_driver_query_params():
    """JDBC URLs carry their own '?' query strings; eel options ride
    after the LAST '?' so driver params stay inside the URL."""
    from eel_spark.cli import _split_format

    fmt, path, opts = _split_format(
        "jdbc:mysql://host/db?useSSL=false&serverTimezone=UTC?table=t&fetch_size=500"
    )
    assert fmt == "jdbc"
    assert path == "mysql://host/db?useSSL=false&serverTimezone=UTC"
    assert opts == {"table": "t", "fetch_size": "500"}


def test_jdbc_uri_single_question_mark_routes_driver_params():
    """ADVICE round 4: the conventional single-'?' spelling mixes driver
    params with eel options in one query string — unknown-to-eel keys
    must be re-attached to the JDBC URL, not die as unknown options."""
    from eel_spark.cli import _jdbc_parts, _split_format
    from eel_spark.sources import JdbcSource

    fmt, path, opts = _split_format(
        "jdbc:mysql://host/db?useSSL=false&table=t&fetch_size=500"
    )
    assert fmt == "jdbc"
    url, tbl, kwargs = _jdbc_parts(path, opts, JdbcSource)
    assert tbl == "t"
    assert url == "jdbc:mysql://host/db?useSSL=false"
    assert opts == {"fetch_size": "500"}  # only eel keys remain

    # the double-'?' spelling still works and composes with leftovers
    fmt, path, opts = _split_format(
        "jdbc:mysql://host/db?useSSL=false?table=t&ssl=on"
    )
    url, tbl, _ = _jdbc_parts(path, opts, JdbcSource)
    assert url == "jdbc:mysql://host/db?useSSL=false&ssl=on"
    assert tbl == "t" and opts == {}


def test_analyze_profile_fields(capsys, spark):
    assert main(["analyze", f"{SF}/region.parquet"]) == 0
    stats = json.loads(capsys.readouterr().out)
    key = stats["columns"]["r_regionkey"]
    assert key["mean"] == 2.0                   # keys 0..4
    assert key["approx_distinct"] == 5
    top = {e["value"]: e["count"] for e in key["top"]}
    assert all(c == 1 for c in top.values())
    assert stats["columns"]["r_name"]["type"] == "string"
