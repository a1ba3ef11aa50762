"""Event-timestamp normalization shared by the batch loader, the
streaming facade, and tests.

The driver-generated events table has shipped with two different physical
``ts`` encodings across testdata generations: TIMESTAMP(NANOS) (which
Spark only reads as bigint under spark.sql.legacy.parquet.nanosAsLong)
and plain tz-naive TIMESTAMP(MICROS) (which Spark 4 reads as
TIMESTAMP_NTZ — a type unix_micros and timestamp arithmetic reject).
Both normalize here to TIMESTAMP (LTZ) at the UTC instant equal to the
stored wall-clock value — bit-identical to DuckDB's epoch_us on the same
file, independent of the session timezone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# micros since the NTZ epoch — timestampdiff works on TIMESTAMP_NTZ and
# never consults the session timezone
_NTZ_EPOCH_US = (
    "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
)


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize a bigint-nanos / TIMESTAMP_NTZ / TIMESTAMP column to LTZ
    at the UTC instant (no-op when already TIMESTAMP)."""
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        # integer DIV, not floor(x/1000.0): epoch-nanos exceed double's
        # 53-bit exact range, so float division is off-by-one µs
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
    if dtype == "timestamp_ntz":
        return df.withColumn(
            col, F.timestamp_micros(F.expr(_NTZ_EPOCH_US.format(col=col)))
        )
    return df
