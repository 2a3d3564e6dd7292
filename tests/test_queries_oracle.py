"""Every registered query with an oracle must match DuckDB exactly at
sf0.001 — the local mirror of the driver's correctness gate."""

from __future__ import annotations

import pytest

from flink_repartition_watermark_example_spark.queries import QUERIES
from tests.oracle import assert_matches_oracle

WITH_ORACLE = [n for n, q in QUERIES.items() if q.oracle is not None]


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, sf_dir, name):
    assert_matches_oracle(spark, QUERIES[name], sf_dir)


def test_every_query_runs_and_is_nonempty(spark, sf_dir):
    for name, q in QUERIES.items():
        df = q.spark(spark, sf_dir)
        assert df.count() > 0, f"{name} returned no rows at {sf_dir}"
