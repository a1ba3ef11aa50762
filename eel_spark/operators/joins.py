"""Join operators Spark lacks natively, built scalable-first.

- ``as_of_join``: latest build-side row at-or-before each probe row per
  key (the time-series primitive). One shuffle + sort — merge-join
  asymptotics via a union-tag + running ``last(ignorenulls)`` window;
  never a per-row subquery, never a range cross join.
- ``range_join``: point-in-interval equi-joinable via binning. Spark
  plans a bare inequality join as BroadcastNestedLoopJoin — O(n·m)
  pair evaluations. Binning turns it into an equi-join on bin id with a
  residual filter: each interval explodes into the bins it covers, each
  point hashes to one bin, and the pair count is bounded by per-bin
  occupancy — the standard interval-join strategy in distributed
  engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_ts: str = "ts",
    build_ts: str = "ts",
    direction: str = "backward",
) -> DataFrame:
    """Annotate each probe row with the temporally closest build row
    at-or-before (``backward``) or at-or-after (``forward``) its
    timestamp, per key. Build payload columns come back null when no
    build row qualifies (left-join semantics).

    Build-side payload = every build column except the key and timestamp;
    they surface with a ``matched_`` prefix plus ``matched_ts``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    payload = [c for c in build.columns if c not in (key, build_ts)]
    probe_types = dict(probe.dtypes)
    build_types = dict(build.dtypes)

    probe_tagged = probe.select(
        *[F.col(c) for c in probe.columns],
        F.lit(0).alias("__build"),
        F.lit(None).cast("timestamp").alias("__bts"),
        *[F.lit(None).cast(build_types[c]).alias(f"__p_{c}") for c in payload],
    )

    def _build_col(c: str) -> Column:
        if c == key:
            return F.col(key)
        if c == probe_ts:  # build rows sort at their own event time
            return F.col(build_ts).cast(probe_types[probe_ts]).alias(probe_ts)
        return F.lit(None).cast(probe_types[c]).alias(c)

    build_tagged = build.select(
        *[_build_col(c) for c in probe.columns],
        F.lit(1).alias("__build"),
        F.col(build_ts).cast("timestamp").alias("__bts"),
        *[F.col(c).alias(f"__p_{c}") for c in payload],
    )

    if direction == "backward":
        order = [F.col(probe_ts).asc(), F.desc("__build")]
        frame = (Window.unboundedPreceding, Window.currentRow)
        pick = F.last
    else:
        order = [F.col(probe_ts).asc(), F.asc("__build")]
        frame = (Window.currentRow, Window.unboundedFollowing)
        pick = F.first
    w = Window.partitionBy(key).orderBy(*order).rowsBetween(*frame)

    u = probe_tagged.unionByName(build_tagged)
    out = u.withColumn("matched_ts", pick("__bts", ignorenulls=True).over(w))
    for c in payload:
        out = out.withColumn(f"matched_{c}", pick(f"__p_{c}", ignorenulls=True).over(w))
    return (
        out.filter("__build = 0")
        .drop("__build", "__bts", *[f"__p_{c}" for c in payload])
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point: str | Column,
    lo: str | Column,
    hi: str | Column,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to interval rows with ``lo ≤ point ≤ hi``.

    ``bin_width`` should be on the order of the typical interval length:
    each interval lands in (length/bin_width + 2) bins, each point in
    exactly one, and the equi-join on bin id bounds candidate pairs by
    bin occupancy instead of |points|×|intervals|.
    """
    if how != "inner":
        raise ValueError("range_join currently supports inner joins")
    p = F.col(point) if isinstance(point, str) else point
    l = F.col(lo) if isinstance(lo, str) else lo
    h = F.col(hi) if isinstance(hi, str) else hi

    pts = points.withColumn("__bin", F.floor(p / F.lit(bin_width)).cast("long"))
    ivs = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(l / F.lit(bin_width)).cast("long"),
                F.floor(h / F.lit(bin_width)).cast("long"),
            )
        ),
    )
    return pts.join(ivs, "__bin").filter((p >= l) & (p <= h)).drop("__bin")
