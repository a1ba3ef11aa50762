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

The pin stack is THREAD-LOCAL: each streaming query's ``foreachBatch``
callback runs on its own stream-execution thread, so a batch's
``pins_mark()``/``release_pins_since(mark)`` pair releases exactly the
pins that batch added — never a concurrently running query's caches,
and never (the depth-scheme failure) silently leaking its own pins when
another thread pops the shared stack first. The cost: ``release_pins()``
only frees the CALLING thread's pins — long-lived scopes on other
threads must release their own (the streaming sinks do, per batch, in a
``finally``).
"""

from __future__ import annotations

import threading

_TL = threading.local()


def _pins() -> list:
    pins = getattr(_TL, "pins", None)
    if pins is None:
        pins = _TL.pins = []
    return pins


def pin(df):
    """Persist (MEMORY_AND_DISK) a multiply-read intermediate and track
    it for ``release_pins``."""
    from pyspark import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _pins().append(df)
    return df


def track(df):
    """Record an ALREADY-persisted DataFrame for ``release_pins`` without
    re-persisting it (e.g. the final label table an iterative operator
    hands back still cached from its convergence loop)."""
    _pins().append(df)
    return df


def release_pins() -> int:
    """Unpersist every intermediate this thread pinned; returns how many."""
    return release_pins_since(0)


def pins_mark() -> int:
    """Current depth of THIS thread's pin stack — pass to
    :func:`release_pins_since` to release only the pins a bounded piece
    of work (e.g. one streaming micro-batch) added."""
    return len(_pins())


def release_pins_since(mark: int) -> int:
    """Unpersist every pin THIS thread recorded after ``mark``; returns
    how many. Safe against concurrent queries by construction: no other
    thread shares this stack."""
    pins = _pins()
    n = 0
    while len(pins) > mark:
        df = pins.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n
