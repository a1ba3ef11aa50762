"""Tracked-persist hygiene: gated queries pin multiply-read
intermediates; building the next registry query must release the
previous build's pins, so N in-session runs hold O(1) executor storage
and an explicit release returns the session to its pre-run cache size.
"""

from __future__ import annotations

from eel_spark.caching import release_pins
from eel_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _n_cached_rdds(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def _cache_manager_empty(spark) -> bool:
    return bool(spark._jsparkSession.sharedState().cacheManager().isEmpty())


def test_gated_lsh_query_runs_hold_o1_storage(spark):
    release_pins()
    spark.catalog.clearCache()
    base = _n_cached_rdds(spark)
    sizes = []
    # dedup_minhash_pairs pins its shingle/signature tables (band join +
    # rejoin branches inside minhash_near_duplicates); the simhash slot
    # no longer pins since it moved to deterministic oracle fingerprints
    for _ in range(2):
        QUERIES["dedup_minhash_pairs"](spark, SF).collect()
        sizes.append(_n_cached_rdds(spark))
    # run 2 must not stack its pins on top of run 1's
    assert sizes[1] <= sizes[0], sizes
    assert sizes[0] > base, "query was expected to pin at least one table"
    released = release_pins()
    assert released >= 1
    assert _n_cached_rdds(spark) == base, "pins survived release_pins()"
    assert _cache_manager_empty(spark)


def test_minhash_operator_pins_release(spark):
    """The operator-level shingle/signature pins (not just the query-level
    gate pin) are tracked too."""
    release_pins()
    spark.catalog.clearCache()
    base = _n_cached_rdds(spark)
    QUERIES["dedup_minhash_pairs"](spark, SF).collect()
    assert _n_cached_rdds(spark) > base
    release_pins()
    assert _n_cached_rdds(spark) == base
    assert _cache_manager_empty(spark)
