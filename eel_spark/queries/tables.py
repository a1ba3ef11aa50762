"""Test-table loaders (TESTDATA.md tables) + oracle-exactness helpers.

Exactness convention for the DuckDB-oracle gate (SURVEY.md §6): double
aggregation is order-dependent, so it can't hash-match across engines.
All measure columns in the test data carry exactly 2 decimal places, so we
aggregate in *scaled integer space* ("cents"): per-row values/products are
exact longs, the sum is an exact integer, and the final cast-to-double +
divide is the same IEEE operation on the same integer in both engines →
bit-identical results, with long-arithmetic speed (≈3× faster than decimal
aggregation, measured at sf0.1).

Overflow envelope: a scale-6 product is < 1e11 per row, so a signed-64 sum
holds ~9e7 rows per group (≈ TPC-H sf15) — far beyond the driver's sf0.1.
For unbounded scale the ``dec``/``dsum`` decimal helpers are the exact,
overflow-free path (Spark's standard decimal hash-agg); queries note which
they use.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

from eel_spark.datastream import DataStream

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def table_via_orc(spark: SparkSession, sf_dir: str, name: str) -> DataStream:
    """Load a test table through the ORC layer: the parquet original is
    copied to ORC (OrcSink) once per (sf_dir, table), then read back with
    OrcSource. Exists so at least one ORACLED query scans a non-parquet
    format end-to-end — a format-layer regression then flips a
    CORRECTNESS row, not just a round-trip pytest. The copy is cached on
    _SUCCESS (testdata is immutable) and lives under the system tmpdir."""
    import hashlib
    import os
    import tempfile

    from eel_spark.sources.files import OrcSink, OrcSource

    key = hashlib.sha256(os.path.abspath(sf_dir).encode()).hexdigest()[:16]
    path = os.path.join(tempfile.gettempdir(), "eel_spark_orc", key, name)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        OrcSink(path).write(table(spark, sf_dir, name))
    return OrcSource(path).to_datastream(spark)


def table_via_avro(spark: SparkSession, sf_dir: str, name: str) -> DataStream:
    """Load a test table through the Avro container layer (AvroSink →
    AvroSource, the provider-class route): the parquet original is copied
    to .avro once per (sf_dir, table), cached on _SUCCESS. The Avro twin
    of ``table_via_orc`` — with it, the correctness gate covers THREE
    formats end-to-end (parquet everywhere, ORC via ops_project_derive,
    Avro via text_bm25_multi_stats (ops_explode_tokens pre-r10)), so a row-oriented-format regression
    flips a CORRECTNESS row, not just a round-trip pytest."""
    import hashlib
    import os
    import tempfile

    from eel_spark.sources.files import AvroSink, AvroSource

    key = hashlib.sha256(os.path.abspath(sf_dir).encode()).hexdigest()[:16]
    path = os.path.join(tempfile.gettempdir(), "eel_spark_avro", key, name)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        AvroSink(path).write(table(spark, sf_dir, name))
    return AvroSource(path).to_datastream(spark)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataStream:
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS), which Spark only reads
        # as a long (spark.sql.legacy.parquet.nanosAsLong). Read the nanos
        # and surface a real timestamp column (micros, truncated exactly
        # like DuckDB's epoch_us on TIMESTAMP_NS → identical values).
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass  # session may have it fixed already
        from eel_spark.timeutils import normalize_ts

        df = normalize_ts(spark.read.parquet(f"{sf_dir}/{name}.parquet"))
        return DataStream(df)
    return DataStream(spark.read.parquet(f"{sf_dir}/{name}.parquet"))


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# -- integer-cents exact aggregation (fast path) ---------------------------

def cents(c: Column | str, scale: int = 2) -> Column:
    """Exact scaled-integer representation of a fixed-point double."""
    return F.round(_c(c) * (10 ** scale)).cast("long")


def money_sum(cents_col: Column, scale: int = 2) -> Column:
    """SUM of scaled longs presented as double (deterministic)."""
    return F.sum(cents_col).cast("double") / F.lit(float(10 ** scale))


def money_avg(cents_col: Column, scale: int = 2) -> Column:
    """AVG via exact integer sum; division order mirrors the SQL helper."""
    return F.sum(cents_col).cast("double") / F.count(F.lit(1)) / F.lit(float(10 ** scale))


def sql_cents(expr: str, scale: int = 2) -> str:
    return f"CAST(ROUND(({expr}) * {10 ** scale}) AS BIGINT)"


def sql_money_sum(cents_expr: str, scale: int = 2) -> str:
    return f"CAST(SUM({cents_expr}) AS DOUBLE) / {float(10 ** scale)}"


def sql_money_avg(cents_expr: str, scale: int = 2) -> str:
    return f"CAST(SUM({cents_expr}) AS DOUBLE) / COUNT(*) / {float(10 ** scale)}"


# -- decimal exact aggregation (unbounded-scale path) ----------------------

def dec(c: Column | str, scale: int = 6) -> Column:
    """Exact-sum staging cast: double → decimal(18,scale)."""
    return _c(c).cast(f"decimal(18,{scale})")


def dsum(c: Column, out_scale: int = 6) -> Column:
    """Exact decimal sum normalized to decimal(38,out_scale)."""
    return F.sum(c).cast(f"decimal(38,{out_scale})")


def sql_dec(expr: str, scale: int = 6) -> str:
    return f"CAST({expr} AS DECIMAL(18,{scale}))"


def sql_dsum(expr: str, out_scale: int = 6) -> str:
    return f"CAST(SUM({expr}) AS DECIMAL(38,{out_scale}))"


# -- per-invocation scoped temp dirs (r9 ADVICE: eager reaping) --------------

import threading as _threading

_SCOPED_TMPDIRS: dict = {}  # scope -> [older, newer] (≤2 kept per scope)
# created at import: a lazily-created lock is itself a race (two first
# callers each construct and acquire their own Lock — r11 review)
_SCOPED_LOCK = _threading.Lock()
_REAPER_ARMED = False


def fresh_scoped_tmpdir(scope: str) -> str:
    """Per-invocation temp dir that reaps same-scope dirs TWO
    invocations behind — a long-lived session running repeated
    gate/bench passes holds O(1) dirs per scope instead of accumulating
    one dir + one atexit entry per invocation; a single atexit hook
    backstops the last ≤2 dirs of each scope. Fresh dirs (not one fixed
    path) because two concurrent runs racing a shared path corrupt each
    other. Keeping the IMMEDIATELY preceding dir alive (deferred reap,
    r10 ADVICE) means a still-unconsumed lazy DataFrame from the
    previous build of the same query cannot lose its files mid-collect;
    only the invocation-before-last is reclaimed, by which point the
    gate/bench loop has long consumed it. The registry dict is
    lock-guarded so concurrent builders (e.g. a bench thread beside a
    gate pass) cannot interleave the pop/rmtree."""
    import atexit
    import shutil
    import tempfile

    global _REAPER_ARMED
    d = tempfile.mkdtemp(prefix=f"{scope}_")
    with _SCOPED_LOCK:
        kept = _SCOPED_TMPDIRS.setdefault(scope, [])
        kept.append(d)
        stale = kept[:-2]
        del kept[:-2]
        if not _REAPER_ARMED:
            _REAPER_ARMED = True
            atexit.register(
                lambda: [
                    shutil.rmtree(p, ignore_errors=True)
                    for ps in _SCOPED_TMPDIRS.values()
                    for p in ps
                ]
            )
    for p in stale:
        shutil.rmtree(p, ignore_errors=True)
    return d
