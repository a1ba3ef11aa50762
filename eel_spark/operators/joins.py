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


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    left_id: str,
    right_id: str,
    max_distance: int = 2,
    q: int = 3,
    max_bucket_size: int = 10_000,
) -> DataFrame:
    """Edit-distance join (record linkage): pairs whose strings are
    within ``max_distance`` Levenshtein edits. Spark plans a bare
    ``levenshtein(a,b) <= d`` join as a BroadcastNestedLoopJoin —
    O(n·m) edit-distance evaluations; this is the standard two-phase
    shape instead: cheap equi-join BLOCKING bounds the candidate set,
    exact JVM ``levenshtein`` (with early-exit threshold) verifies it.

    Blocking:

    - every string with len ≥ q emits its distinct q-grams; the count
      filter guarantees recall for pairs whose LONGER string has
      len ≥ q·(d+1): distance ≤ d strings share
      ≥ max_len − q + 1 − q·d ≥ 1 q-grams. Pairs must also satisfy
      |len_a − len_b| ≤ d (checked in the join condition).
    - pairs where BOTH strings are short (len < q·(d+1), where the
      q-gram bound is vacuous) block on length bands instead: shorts
      join shorts with |len_a − len_b| ≤ d via an exploded band key.
      (A short×long boundary pair is covered by the q-gram bound; a
      sub-q string can only be within d of a ≥ q·(d+1) string when
      q = 1, in which case it has grams too.)

    Scale levers, same philosophy as the LSH ops: blocking keys whose
    total bucket population exceeds ``max_bucket_size`` are DROPPED
    before the join (a q-gram shared by 100k strings is
    low-information and would dominate Σ|bucket|²; a pair whose ONLY
    shared q-gram is capped is lost — raise the cap or lower q if that
    matters). All shuffles carry (key, id, len) triples; strings are
    joined back only for the bounded verify. NULL strings never match.

    Output: (left_id, right_id [suffixed ``_r`` on name collision],
    left_col, right_col [suffixed likewise], distance).
    """
    if max_distance < 0 or q < 1:
        raise ValueError("need max_distance >= 0 and q >= 1")
    d = int(max_distance)
    short_bound = q * (d + 1)

    def _slim(df, col, idc, side):
        return df.select(
            F.col(idc).alias(f"__id_{side}"),
            F.col(col).alias(f"__s_{side}"),
            F.length(col).alias(f"__len_{side}"),
        ).filter(F.col(col).isNotNull())

    l = _slim(left, left_col, left_id, "l")
    r = _slim(right, right_col, right_id, "r")

    def _gram_keys(df, side):
        s, ln = F.col(f"__s_{side}"), F.col(f"__len_{side}")
        grams = F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), ln - q + 1),
                lambda i: F.substring(s, i, q),
            )
        )
        return (
            df.filter(ln >= q)
            .select(f"__id_{side}", f"__len_{side}", F.explode(grams).alias("__g"))
        )

    gl, gr = _gram_keys(l, "l"), _gram_keys(r, "r")
    # cap flooded grams: population counted across BOTH sides, over-cap
    # keys anti-joined away (tiny set -> AQE broadcast)
    over = (
        gl.select("__g").unionAll(gr.select("__g"))
        .groupBy("__g")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > max_bucket_size)
        .select("__g")
    )
    gl = gl.join(over, "__g", "left_anti")
    gr = gr.join(over, "__g", "left_anti")
    cand_long = (
        gl.join(
            gr,
            (gl["__g"] == gr["__g"])
            & (F.abs(gl["__len_l"] - gr["__len_r"]) <= d),
        )
        .select("__id_l", "__id_r")
        .distinct()
    )

    # short path: band key = every length the partner may have
    sl = l.filter(F.col("__len_l") < short_bound).select(
        "__id_l", F.col("__len_l").alias("__band")
    )
    sr = r.filter(F.col("__len_r") < short_bound).select(
        "__id_r",
        F.explode(
            F.sequence(F.col("__len_r") - d, F.col("__len_r") + d)
        ).alias("__band"),
    )
    cand_short = sl.join(sr, "__band").select("__id_l", "__id_r").distinct()

    cands = cand_long.unionAll(cand_short).distinct()
    verified = (
        cands.join(l.select("__id_l", "__s_l"), "__id_l")
        .join(r.select("__id_r", "__s_r"), "__id_r")
        .withColumn(
            "distance", F.levenshtein("__s_l", "__s_r", d)
        )
        .filter(F.col("distance") >= 0)
    )
    rid_out = right_id if right_id != left_id else f"{right_id}_r"
    rcol_out = right_col if right_col != left_col else f"{right_col}_r"
    return verified.select(
        F.col("__id_l").alias(left_id),
        F.col("__id_r").alias(rid_out),
        F.col("__s_l").alias(left_col),
        F.col("__s_r").alias(rcol_out),
        "distance",
    )
