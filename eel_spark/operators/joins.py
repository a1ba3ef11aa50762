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


def _fuzzy_slim(df, col, idc, side):
    return df.select(
        F.col(idc).alias(f"__id_{side}"),
        F.col(col).alias(f"__s_{side}"),
        F.length(col).alias(f"__len_{side}"),
    ).filter(F.col(col).isNotNull())


def _capped_bucket_join(
    lk: DataFrame, rk: DataFrame, keys: list[str], max_bucket_size: int
) -> DataFrame:
    """(``__l``, ``__r``) member pairs per blocking key across two key
    tables, each carrying its members in column ``__m`` — the bipartite
    twin of ``dedup._bucket_pairs``: each side aggregates its key's
    members ONCE (collect_list), the join matches bucket rows (reusing
    the groupBy partitioning), the flooded-key cap is a size filter on
    the joined row's COMBINED population (identical drop semantics to
    the former union-count + double anti-join: a key on only one side
    never produced candidates), and the |L|·|R| pairs explode in place
    with O(|bucket|) peak allocation per generated row."""
    la = lk.groupBy(*keys).agg(F.collect_list("__m").alias("__ls"))
    ra = rk.groupBy(*keys).agg(F.collect_list("__m").alias("__rs"))
    return (
        la.join(ra, keys)
        .filter(F.size("__ls") + F.size("__rs") <= max_bucket_size)
        .select(F.explode("__ls").alias("__l"), "__rs")
        .select("__l", F.explode("__rs").alias("__r"))
    )


def _fuzzy_candidates(
    l: DataFrame, r: DataFrame, d: int, q: int, max_bucket_size: int
) -> DataFrame:
    """Blocking stage of :func:`fuzzy_join`, factored out so the
    candidate count itself is testable: q-gram keys for long strings,
    PassJoin segments for shorts, length bands for tiny strings — every
    key family capped at ``max_bucket_size`` total population."""
    short_bound = q * (d + 1)

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
    # capped bipartite bucket join (the dedup._bucket_pairs layout,
    # two-sided): each side aggregates its key's members once, the
    # flooded-key cap becomes a size filter on the COMBINED population
    # of the joined bucket row (identical drop semantics to the former
    # union-count + double anti-join — a key missing from either side
    # never produced candidates anyway), and the pairs explode in place
    cand_long = (
        _capped_bucket_join(
            gl.select("__g", F.struct("__id_l", "__len_l").alias("__m")),
            gr.select("__g", F.struct("__id_r", "__len_r").alias("__m")),
            ["__g"],
            max_bucket_size,
        )
        .filter(F.abs(F.col("__l.__len_l") - F.col("__r.__len_r")) <= d)
        .select("__l.__id_l", "__r.__id_r")
        .distinct()
    )

    # short path: PassJoin segment blocking. Right shorts with
    # len ≥ d+1 split into d+1 segments (shorter segments first:
    # n_seg−rem of length k, then rem of length k+1); left shorts probe
    # every substring of each candidate (len_r, segment_idx)'s length.
    # A segment longer than the left string can never be its preserved
    # segment (a preserved segment IS a substring), so emitting nothing
    # for it is recall-safe.
    n_seg = d + 1

    def _seg_len(l2, i):
        k2 = F.floor(l2 / n_seg).cast("int")
        rem2 = (l2 % n_seg).cast("int")
        return (k2 + F.when(i >= F.lit(n_seg) - rem2, 1).otherwise(0)).cast("int")

    def _guarded_seq(lo, hi):
        return F.when(hi >= lo, F.sequence(lo, hi)).otherwise(
            F.array().cast("array<int>")
        )

    s_r, ln_r = F.col("__s_r"), F.col("__len_r")
    k_r = F.floor(ln_r / n_seg).cast("int")
    rem_r = (ln_r % n_seg).cast("int")
    seg_structs = F.transform(
        F.sequence(F.lit(0), F.lit(d)),
        lambda i: F.struct(
            ln_r.alias("l2"),
            i.cast("int").alias("i"),
            s_r.substr(
                (i * k_r + F.greatest(F.lit(0), i - (F.lit(n_seg) - rem_r)) + 1
                 ).cast("int"),
                _seg_len(ln_r, i),
            ).alias("seg"),
        ),
    )
    si = (
        r.filter((ln_r >= n_seg) & (ln_r < short_bound))
        .select("__id_r", F.explode(seg_structs).alias("__k"))
        .select(
            "__id_r",
            F.col("__k.l2").alias("__l2"),
            F.col("__k.i").alias("__i"),
            F.col("__k.seg").alias("__seg"),
        )
    )
    s_l, ln_l = F.col("__s_l"), F.col("__len_l")
    probe_structs = F.array_distinct(
        F.flatten(
            F.flatten(
                F.transform(
                    _guarded_seq(
                        F.greatest(ln_l - d, F.lit(n_seg)),
                        F.least(ln_l + d, F.lit(short_bound - 1)),
                    ),
                    lambda l2: F.transform(
                        F.sequence(F.lit(0), F.lit(d)),
                        lambda i: F.transform(
                            _guarded_seq(F.lit(1), ln_l - _seg_len(l2, i) + 1),
                            lambda p: F.struct(
                                l2.cast("int").alias("l2"),
                                i.cast("int").alias("i"),
                                s_l.substr(p, _seg_len(l2, i)).alias("seg"),
                            ),
                        ),
                    ),
                )
            )
        )
    )
    pl = (
        l.filter(ln_l < short_bound)
        .select("__id_l", F.explode(probe_structs).alias("__k"))
        .select(
            "__id_l",
            F.col("__k.l2").alias("__l2"),
            F.col("__k.i").alias("__i"),
            F.col("__k.seg").alias("__seg"),
        )
    )
    seg_keys = ["__l2", "__i", "__seg"]
    cand_seg = (
        _capped_bucket_join(
            pl.select(*seg_keys, F.col("__id_l").alias("__m")),
            si.select(*seg_keys, F.col("__id_r").alias("__m")),
            seg_keys,
            max_bucket_size,
        )
        .select(F.col("__l").alias("__id_l"), F.col("__r").alias("__id_r"))
        .distinct()
    )

    # tiny right strings (len ≤ d: segments would be empty) keep the
    # length-band join — the key space is ≤ d+1 values, so it too gets
    # the population cap; a flooded tiny band is dropped (documented
    # recall trade, same as a flooded gram)
    tl = l.filter(ln_l < short_bound).select(
        "__id_l", F.col("__len_l").alias("__band")
    )
    tr = r.filter(ln_r < n_seg).select(
        "__id_r",
        F.explode(F.sequence(ln_r - d, ln_r + d)).alias("__band"),
    )
    cand_tiny = (
        _capped_bucket_join(
            tl.select("__band", F.col("__id_l").alias("__m")),
            tr.select("__band", F.col("__id_r").alias("__m")),
            ["__band"],
            max_bucket_size,
        )
        .select(F.col("__l").alias("__id_l"), F.col("__r").alias("__id_r"))
        .distinct()
    )

    return cand_long.unionAll(cand_seg).unionAll(cand_tiny).distinct()


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
      q-gram bound is vacuous) block on PassJoin-style segments
      instead (Li/Deng/Feng, ICDE'11 — public technique): the right
      string is partitioned into d+1 contiguous segments; if
      edit(s, r) ≤ d then ≤ d edit ops touch ≤ d segments, so some
      segment survives verbatim as a substring of the left string
      (pigeonhole). The right side indexes (segment_idx, segment,
      len_r); the left side probes every substring of the matching
      segment length for each candidate len_r in [len_l−d, len_l+d].
      Keys are CONTENT-based, so a million same-length short strings
      (names, SKUs — the classic record-linkage workload) spread
      across the key space instead of collapsing into one length
      band. Right strings shorter than d+1 (segments would be empty)
      fall back to the length-band join — a key space of ≤ d+1 values,
      but only tiny strings live there. (A short×long boundary pair is
      covered by the q-gram bound; a sub-q string can only be within d
      of a ≥ q·(d+1) string when q = 1, in which case it has grams
      too.)

    Scale levers, same philosophy as the LSH ops: EVERY blocking key —
    q-gram, segment, and tiny length band alike — whose total bucket
    population exceeds ``max_bucket_size`` is DROPPED before the join
    (a key shared by 100k strings is low-information and would
    dominate Σ|bucket|²; a pair whose ONLY shared key is capped is
    lost — raise the cap or lower q if that matters). All shuffles
    carry (key, id, len) triples; strings are joined back only for the
    bounded verify. NULL strings never match.

    Output: (left_id, right_id [suffixed ``_r`` on name collision],
    left_col, right_col [suffixed likewise], distance).
    """
    if max_distance < 0 or q < 1:
        raise ValueError("need max_distance >= 0 and q >= 1")
    d = int(max_distance)

    l = _fuzzy_slim(left, left_col, left_id, "l")
    r = _fuzzy_slim(right, right_col, right_id, "r")
    cands = _fuzzy_candidates(l, r, d, q, max_bucket_size)
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
