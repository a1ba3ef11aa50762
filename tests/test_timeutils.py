"""normalize_ts must map every physical ts encoding the testdata has ever
shipped (bigint epoch-nanos, tz-naive TIMESTAMP_NTZ, tz-aware TIMESTAMP)
to the same UTC-instant LTZ value — round 3 was lost to an unhandled
encoding change, so this locks the contract down."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from eel_spark.timeutils import normalize_ts

_US = 1_704_067_798_778_549  # 2024-01-01 00:09:58.778549 UTC


def _read_normalized_us(spark, path):
    df = normalize_ts(spark.read.parquet(path))
    assert dict(df.dtypes)["ts"] == "timestamp", df.dtypes
    return df.select(F.unix_micros("ts").alias("us")).head()["us"]


def test_bigint_nanos(spark, tmp_path):
    p = str(tmp_path / "nanos.parquet")
    pq.write_table(pa.table({"ts": pa.array([_US * 1000], pa.int64())}), p)
    assert _read_normalized_us(spark, p) == _US


def test_timestamp_ntz(spark, tmp_path):
    p = str(tmp_path / "ntz.parquet")
    pq.write_table(pa.table({"ts": pa.array([_US], pa.timestamp("us"))}), p)
    assert _read_normalized_us(spark, p) == _US


def test_timestamp_utc_instant(spark, tmp_path):
    p = str(tmp_path / "ltz.parquet")
    pq.write_table(
        pa.table({"ts": pa.array([_US], pa.timestamp("us", tz="UTC"))}), p
    )
    assert _read_normalized_us(spark, p) == _US


def test_nanos_not_double_rounded(spark, tmp_path):
    """Epoch-nanos exceed double's 53-bit exact range: integer DIV must
    keep the exact microsecond (float division is off-by-one µs)."""
    odd_us = _US + 1
    p = str(tmp_path / "nanos2.parquet")
    pq.write_table(pa.table({"ts": pa.array([odd_us * 1000 + 999], pa.int64())}), p)
    assert _read_normalized_us(spark, p) == odd_us
