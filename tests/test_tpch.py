"""Run every registered query against its DuckDB oracle at sf0.001 — the
same harness the driver applies at sf0.01 (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from eel_spark.queries import ORACLE, QUERIES
from tests.conftest import SF_DIR, assert_df_matches_oracle


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, oracle, name):
    df = QUERIES[name](spark, SF_DIR)
    assert_df_matches_oracle(df, oracle, ORACLE[name])


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_query_runs(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
