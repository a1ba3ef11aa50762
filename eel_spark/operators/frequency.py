"""Exact top-k frequent keys with a bounded shuffle — the heavy-hitters
question ("which tokens / URLs / templates dominate this corpus?") that
a naive ``groupBy(key).count().orderBy(...)`` answers by shuffling
EVERY distinct key. At 100 TB of text the distinct-token shuffle is the
whole job; this operator bounds it with the classic two-pass scheme
built on Misra-Gries summaries (Misra & Gries 1982; merge/error bounds
per Agarwal et al., "Mergeable Summaries", PODS 2012 — public
literature):

pass 1
    per-partition Misra-Gries with ``capacity`` counters (an
    Arrow-batched ``mapInPandas`` over ONLY the key projection — the
    one place Python is justified: bounded state the JVM aggregate
    model can't express without a full shuffle). Each partition emits
    ≤ ``capacity`` candidate keys plus its row total and its total
    decremented mass ``trim``. MG invariant: a key ABSENT from a
    partition's output has true partition count ≤ that partition's
    ``trim`` (each unit of trimmed mass is subtracted from > capacity
    counters at once, so Σtrim ≤ n_p/(capacity+1)).

pass 2
    exact counts of the candidate union only: broadcast left-semi join
    (candidates ≤ capacity × partitions rows) then ``groupBy.count`` —
    the shuffle now carries candidate keys only. Final top-k with the
    deterministic (count DESC, key ASC) order.

Exactness certificate: any key outside the candidate union has total
count ≤ Σ_p trim_p. If the k-th exact candidate count exceeds that
bound (or nothing was ever trimmed), the result is PROVABLY the exact
top-k; otherwise the capacity was too small for the key distribution
and the call raises (``require_exact=False`` returns the best-effort
list instead, with the bound attached as a ``max_missed`` column so
callers can reason about what an absent key could hold). Zipfian
key distributions (tokens, URLs, user-ids) certify easily; a uniform
distribution with more distinct keys than ``capacity`` is the honest
failure case — no algorithm answers it without the full shuffle.
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_map_fn(key_cols: list[str], capacity: int):
    import pandas as pd

    def _norm(x):
        # pandas surfaces missing keys as NaN/NaT; Arrow needs None
        if x is None or (isinstance(x, float) and x != x) or x is pd.NaT:
            return None
        return x

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        counters: dict = {}
        total = 0
        trim = 0
        for pdf in batches:
            total += len(pdf)
            vc = pdf.groupby(key_cols, dropna=False, sort=False).size()
            for key, c in vc.items():
                kt = key if isinstance(key, tuple) else (key,)
                kt = tuple(_norm(x) for x in kt)
                counters[kt] = counters.get(kt, 0) + int(c)
            if len(counters) > capacity:
                # batched MG decrement: subtract the (capacity+1)-th
                # largest count from everyone; ≤ capacity survive, and
                # the subtracted mass lands on > capacity counters at
                # once, preserving Σtrim ≤ n_p/(capacity+1)
                vals = sorted(counters.values(), reverse=True)
                delta = vals[capacity]
                trim += delta
                counters = {
                    k: v - delta for k, v in counters.items() if v > delta
                }
        # candidate rows carry zero totals; ONE sentinel row per
        # partition (NULL keys, NULL count) carries the partition's row
        # total and trimmed mass, so global sums need no distinct pass
        rows = [(*k, int(v), 0, 0) for k, v in counters.items()]
        rows.append((*(None,) * len(key_cols), None, int(total), int(trim)))
        yield pd.DataFrame(rows, columns=[*key_cols, "__mg", "__pn", "__trim"])

    return fn


def exact_topk_frequent(
    df: DataFrame,
    keys: str | Sequence[str],
    k: int,
    capacity: int = 4096,
    count_name: str = "cnt",
    require_exact: bool = True,
) -> DataFrame:
    """Top-``k`` most frequent key tuples of ``df``, exactly, with the
    candidate-pruned shuffle described in the module docstring.

    Returns ``keys… + <count_name>`` ordered by (count DESC, keys ASC)
    — a deterministic total order, so ties at the k-th boundary
    resolve identically everywhere. Raises ``ValueError`` when
    ``capacity`` cannot CERTIFY exactness for this distribution
    (see module docstring); the message reports the bound so the
    caller can size a retry.

    NULL key values count as their own key (SQL GROUP BY semantics).
    Float/double key columns are rejected: Arrow hands both Spark NULL
    and Spark NaN to pandas as NaN, so a NaN-heavy key would be
    mis-tracked as the NULL candidate in pass 1 yet excluded from the
    NULL-safe recount in pass 2 — the certificate could then "certify"
    a top-k missing a dominant NaN key. Cast to a discrete type first.

    With ``require_exact=False`` the result additionally carries a
    constant ``max_missed`` column = the non-candidate bound (0 when the
    result is certified exact).
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    proj = df.select(*ks)
    for f in proj.schema.fields:
        if f.dataType.simpleString() in ("float", "double"):
            raise TypeError(
                f"key column {f.name!r} is {f.dataType.simpleString()}; "
                "floating-point keys cannot be counted exactly here (Arrow "
                "conflates NULL and NaN across the Python boundary) — cast "
                "to string/int/decimal first"
            )
    key_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in proj.schema.fields
    )
    out_schema = f"{key_schema}, __mg long, __pn long, __trim long"
    summary = proj.mapInPandas(
        _mg_map_fn(ks, int(capacity)), schema=out_schema
    ).persist()
    try:
        bound = int(
            summary.agg(F.sum("__trim").alias("t")).collect()[0]["t"] or 0
        )
        cand = (
            summary.where(F.col("__mg").isNotNull())
            .select(*[F.col(c).alias(f"__c_{c}") for c in ks])
            .distinct()
        )
        # NULL-safe semi-join: NULL key values are legitimate candidates
        # (GROUP BY semantics) and a plain equi-join would drop them
        cond = None
        for c in ks:
            eq = F.col(c).eqNullSafe(F.col(f"__c_{c}"))
            cond = eq if cond is None else (cond & eq)
        exact = (
            df.join(F.broadcast(cand), on=cond, how="left_semi")
            .groupBy(*ks)
            .agg(F.count(F.lit(1)).alias(count_name))
        )
        topk = exact.orderBy(
            F.col(count_name).desc(), *[F.col(c).asc() for c in ks]
        ).limit(int(k))
        rows = topk.collect()
        kth = rows[-1][count_name] if len(rows) >= k else None
        certified = bound == 0 or (kth is not None and kth > bound)
        if not certified and require_exact:
            raise ValueError(
                f"cannot certify exact top-{k}: non-candidate keys may "
                f"hold up to {bound} occurrences but the k-th candidate "
                f"has {kth}; raise capacity (currently {capacity}) or "
                "fall back to the full groupBy shuffle"
            )
        spark = df.sparkSession
        out = spark.createDataFrame(rows, schema=topk.schema)
        if not require_exact:
            # best-effort mode: attach what an absent key could hold
            out = out.withColumn(
                "max_missed", F.lit(0 if certified else bound).cast("long")
            )
        return out
    finally:
        summary.unpersist()
