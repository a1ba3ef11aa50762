"""Command-line interface — the Spark-first analogue of eel-cli
(eel-cli/src/main/scala/io/eels/cli: ShowSchemaMain, StreamMain,
AnalyzeMain, plus an ad-hoc SQL runner standing in for SqlContext).

Commands:
  schema  <src>                      print the schema of a source
  stream  <src> <sink> [transforms]  copy source → sink (filter/projection
                                     /partitioning applied declaratively,
                                     so pushdown happens even for a copy)
  analyze <src> [--columns a,b]      per-column stats in ONE distributed
                                     pass (count/nulls/distinct/min/max)
  sql     <query> --table name=path  run SQL over registered parquet views
  fetch-spec <table>                 portable table spec JSON (FetchSpecMain)
  apply-spec <spec.json>             create a table from a spec (ApplySpecMain)

Source/sink syntax: ``format:path`` (``parquet:/data/x``); bare paths
infer format from the extension, defaulting to parquet. Catalog-backed
URIs (eel-cli HiveSourceParser / JdbcSourceParser analogues):
``hive:db.table?partition_filter=...`` reads/writes metastore tables;
``jdbc:<driver-url>?table=T`` wraps the full JDBC URL (the ``jdbc:``
scheme prefix doubles as the URL prefix, e.g.
``jdbc:derby:memory:db?table=T``).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F

from eel_spark.datastream import DataStream
from eel_spark.session import get_session
from eel_spark.sources import (
    CsvSink, CsvSource, JsonSink, JsonSource, OrcSink, OrcSource,
    ParquetSink, ParquetSource, TextSource,
)

_SOURCES = {
    "parquet": ParquetSource,
    "csv": CsvSource,
    "json": JsonSource,
    "orc": OrcSource,
    "text": TextSource,
}
_SINKS = {
    "parquet": ParquetSink,
    "csv": CsvSink,
    "json": JsonSink,
    "orc": OrcSink,
}
_EXT_FORMATS = {"parquet", "csv", "json", "orc", "txt", "text"}


def _split_format(uri: str, default: str = "parquet") -> tuple[str, str, dict]:
    """``csv:/path?delimiter=;&header=false`` → (fmt, path, options) — the
    eel-cli URI convention (CsvSourceParserTest / ParquetSourceParserTest):
    options ride on the URI, matched to the component's own parameters."""
    opts: dict[str, str] = {}
    if "?" in uri:
        # jdbc URLs may carry their own query string (mysql ?useSSL=...):
        # the eel options are the segment after the LAST '?', so
        # `jdbc:mysql://h/db?useSSL=false?table=t` keeps the driver params
        # inside the URL. Other schemes have no '?' in paths — first '?'
        # and last '?' coincide.
        split_fn = uri.rsplit if uri.startswith("jdbc:") else uri.split
        uri, qs = split_fn("?", 1)
        from urllib.parse import parse_qsl

        opts = dict(parse_qsl(qs, keep_blank_values=True))
    if ":" in uri and uri.split(":", 1)[0] in (*_SOURCES, "hive", "jdbc"):
        fmt, path = uri.split(":", 1)
        return fmt, path, opts
    ext = uri.rsplit(".", 1)[-1].lower()
    if ext in _EXT_FORMATS:
        return ("text" if ext == "txt" else ext), uri, opts
    return default, uri, opts


def _apply_uri_opts(cls, kwargs: dict, opts: dict) -> dict:
    """Coerce URI option strings onto the dataclass's typed fields;
    unknown keys error loudly (silent typos would drop user options)."""
    import dataclasses

    by_name = {f.name: f for f in dataclasses.fields(cls)}
    for k, v in opts.items():
        if k not in by_name:
            raise SystemExit(f"{cls.__name__}: unknown URI option '{k}'")
        t = by_name[k].type
        if "bool" in str(t):
            kwargs[k] = v.lower() in ("1", "true", "yes")
        elif "int" in str(t):
            kwargs[k] = int(v)
        elif "list" in str(t):
            kwargs[k] = v.split(",")
        else:
            kwargs[k] = v
    return kwargs


def _jdbc_parts(path: str, opts: dict, cls) -> tuple[str, str, dict]:
    """(url, table, kwargs) from a ``jdbc:`` URI — the scheme prefix is
    part of the JDBC URL itself, the table rides as a ``?table=`` option
    and an optional ``?driver=`` becomes a connection property.

    The conventional single-'?' spelling mixes driver params into the
    same query string (``jdbc:mysql://h/db?useSSL=false&table=t``):
    anything that is not a field of the eel component is re-attached to
    the JDBC URL instead of erroring as an unknown eel option."""
    import dataclasses
    from urllib.parse import urlencode

    tbl = opts.pop("table", None)
    if not tbl:
        raise SystemExit("jdbc URIs need ?table=<name> (or a subquery)")
    driver = opts.pop("driver", None)
    kwargs = {"properties": {"driver": driver}} if driver else {}
    eel_fields = {f.name for f in dataclasses.fields(cls)}
    driver_params = {k: opts.pop(k) for k in list(opts) if k not in eel_fields}
    url = f"jdbc:{path}"
    if driver_params:
        url += ("&" if "?" in url else "?") + urlencode(driver_params)
    return url, tbl, kwargs


def _source(uri: str):
    fmt, path, opts = _split_format(uri)
    if fmt == "hive":
        from eel_spark.sources import HiveSource

        return HiveSource(path, **_apply_uri_opts(HiveSource, {}, opts))
    if fmt == "jdbc":
        from eel_spark.sources import JdbcSource

        url, tbl, kwargs = _jdbc_parts(path, opts, JdbcSource)
        return JdbcSource(url, tbl, **_apply_uri_opts(JdbcSource, kwargs, opts))
    cls = _SOURCES[fmt]
    return cls(path, **_apply_uri_opts(cls, {}, opts))


def _sink(uri: str, args: argparse.Namespace):
    fmt, path, opts = _split_format(uri)
    if fmt == "hive":
        from eel_spark.sources import HiveSink

        kwargs = {}
        if args.partition_by:
            kwargs["partition_by"] = args.partition_by.split(",")
        return HiveSink(path, **_apply_uri_opts(HiveSink, kwargs, opts))
    if fmt == "jdbc":
        from eel_spark.sources import JdbcSink

        url, tbl, kwargs = _jdbc_parts(path, opts, JdbcSink)
        return JdbcSink(url, tbl, **_apply_uri_opts(JdbcSink, kwargs, opts))
    if fmt not in _SINKS:
        raise SystemExit(f"unsupported sink format: {fmt}")
    cls = _SINKS[fmt]
    kwargs = {}
    if fmt == "parquet":
        if args.max_records_per_file:
            kwargs["max_records_per_file"] = args.max_records_per_file
        if args.partition_by:
            kwargs["partition_by"] = args.partition_by.split(",")
    return cls(path, **_apply_uri_opts(cls, kwargs, opts))


def cmd_schema(args: argparse.Namespace) -> int:
    spark = get_session("eel-cli")
    schema = _source(args.src).schema(spark)
    if args.json:
        print(schema.json())
    else:
        for f in schema.fields:
            nullable = "" if f.nullable else " NOT NULL"
            print(f"{f.name}: {f.dataType.simpleString()}{nullable}")
    return 0


def cmd_stream(args: argparse.Namespace) -> int:
    spark = get_session("eel-cli")
    ds = _source(args.src).to_datastream(spark)
    if args.filter:
        ds = ds.filter(args.filter)
    if args.projection:
        ds = ds.projection(*args.projection.split(","))
    rows = ds.to(_sink(args.sink, args), parallelism=args.parallelism)
    print(f"{rows} rows written to {args.sink}")
    return 0


def cmd_analyze(args: argparse.Namespace) -> int:
    from eel_spark.operators.profile import profile

    spark = get_session("eel-cli")
    ds = _source(args.src).to_datastream(spark)
    cols = args.columns.split(",") if args.columns else ds.field_names
    report = profile(ds.df, cols)  # still ONE aggregation pass
    out = {"rows": report[0]["rows"] if report else 0, "columns": {}}
    for r in report:
        col = {
            "type": r["type"],
            "nulls": r["nulls"],
        }
        if "distinct_approx" in r:
            col["approx_distinct"] = r["distinct_approx"]
            # stringified min/max: stable JSON across date/decimal types
            col["min"] = None if r["min"] is None else str(r["min"])
            col["max"] = None if r["max"] is None else str(r["max"])
            col["top"] = [
                {"value": str(e["value"]), "count": e["count"]}
                for e in r["top"]
            ]
        if "mean" in r:
            col["mean"] = r["mean"]
            col["stddev"] = r["stddev"]
        out["columns"][r["name"]] = col
    print(json.dumps(out, indent=2, default=str))
    return 0


def cmd_fetch_spec(args: argparse.Namespace) -> int:
    from eel_spark.sources import HiveTable

    spark = get_session("eel-cli")
    print(json.dumps(HiveTable(spark, args.table).fetch_spec(), indent=2))
    return 0


def cmd_apply_spec(args: argparse.Namespace) -> int:
    from eel_spark.sources import HiveTable

    spark = get_session("eel-cli")
    with open(args.spec_file) as fh:
        spec = json.load(fh)
    t = HiveTable.apply_spec(spark, spec)
    print(f"table {t.table} ready")
    return 0


def cmd_sql(args: argparse.Namespace) -> int:
    spark = get_session("eel-cli")
    for spec in args.table or []:
        name, path = spec.split("=", 1)
        _source(path).to_datastream(spark).df.createOrReplaceTempView(name)
    result = DataStream(spark.sql(args.query))
    n = args.limit
    for r in result.take(n).collect():
        print(json.dumps(r.asDict(), default=str))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="eel_spark", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("schema", help="print the schema of a source")
    ps.add_argument("src")
    ps.add_argument("--json", action="store_true")
    ps.set_defaults(fn=cmd_schema)

    pt = sub.add_parser("stream", help="copy a source to a sink")
    pt.add_argument("src")
    pt.add_argument("sink")
    pt.add_argument("--filter", help="SQL predicate applied before write")
    pt.add_argument("--projection", help="comma-separated columns/exprs")
    pt.add_argument("--partition-by", help="comma-separated partition columns")
    pt.add_argument("--max-records-per-file", type=int)
    pt.add_argument("--parallelism", type=int)
    pt.set_defaults(fn=cmd_stream)

    pa = sub.add_parser("analyze", help="per-column statistics (one pass)")
    pa.add_argument("src")
    pa.add_argument("--columns", help="comma-separated subset")
    pa.set_defaults(fn=cmd_analyze)

    pf = sub.add_parser("fetch-spec", help="print a table's portable spec JSON")
    pf.add_argument("table")
    pf.set_defaults(fn=cmd_fetch_spec)

    pp = sub.add_parser("apply-spec", help="create a table from a spec JSON file")
    pp.add_argument("spec_file")
    pp.set_defaults(fn=cmd_apply_spec)

    pq = sub.add_parser("sql", help="run SQL over registered sources")
    pq.add_argument("query")
    pq.add_argument("--table", action="append", metavar="name=path")
    pq.add_argument("--limit", type=int, default=100)
    pq.set_defaults(fn=cmd_sql)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
