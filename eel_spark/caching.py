"""Tracked persist: pin multiply-read intermediates, release them later.

Operators and gated queries cache intermediates that several plan
branches read (LSH shingle/signature tables, recall-gate pair sets).
A bare ``df.persist()`` leaks: Spark's CacheManager holds the cached
plan JVM-side until an explicit ``unpersist()``, so repeated in-session
runs accumulate executor storage (the ContextCleaner only reclaims
RDD-level blocks whose references are dropped — cached *plans* are not).

``pin(df)`` persists and records the DataFrame; ``release_pins()``
unpersists everything recorded. The query registry calls
``release_pins()`` every time a new registry query is built, so N
in-session query runs hold O(1) executor storage. Releasing is always
safe: unpersist never invalidates a plan — downstream actions just
recompute — so callers that interleave builds and collects trade cache
hits, never correctness.
"""

from __future__ import annotations

_PINS: list = []


def pin(df):
    """Persist (MEMORY_AND_DISK) a multiply-read intermediate and track
    it for ``release_pins``."""
    from pyspark import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _PINS.append(df)
    return df


def track(df):
    """Record an ALREADY-persisted DataFrame for ``release_pins`` without
    re-persisting it (e.g. the final label table an iterative operator
    hands back still cached from its convergence loop)."""
    _PINS.append(df)
    return df


def release_pins() -> int:
    """Unpersist every tracked intermediate; returns how many."""
    return release_pins_since(0)


def pins_mark() -> int:
    """Current pin-stack depth — pass to :func:`release_pins_since` to
    release only the pins a bounded piece of work (e.g. one streaming
    micro-batch) added, leaving other in-flight queries' caches alone."""
    return len(_PINS)


def release_pins_since(mark: int) -> int:
    """Unpersist every pin recorded after ``mark``; returns how many."""
    n = 0
    while len(_PINS) > mark:
        df = _PINS.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n
