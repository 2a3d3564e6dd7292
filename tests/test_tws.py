"""transformWithStateInPandas sessionization (streaming/tws.py).

The TWS Python runner requires google.protobuf; where it exists the
operator must match the same batch gaps-and-islands oracle as the
applyInPandasWithState twin, and where it doesn't the operator must
fail with the explicit availability guard, not a worker crash."""

from __future__ import annotations

import pytest

from flink_repartition_watermark_example_spark.streaming.tws import TWS_AVAILABLE, sessionize_tws

pytestmark = pytest.mark.slow  # streaming replays: minute-class


@pytest.mark.skipif(not TWS_AVAILABLE, reason="google.protobuf absent")
def test_tws_sessionize_matches_oracle(spark, sf_dir):
    from flink_repartition_watermark_example_spark.queries import EXTRA_QUERIES, Query
    from flink_repartition_watermark_example_spark.queries_streaming import (
        q_streaming_sessionize_tws,
    )

    q = Query(
        spark=q_streaming_sessionize_tws,
        oracle=EXTRA_QUERIES["streaming_sessionize"].oracle,
    )
    from tests.oracle import assert_matches_oracle

    assert_matches_oracle(spark, q, sf_dir)


@pytest.mark.skipif(TWS_AVAILABLE, reason="dependency present — guard moot")
def test_tws_unavailable_raises_explicit_guard(spark, sf_dir):
    from flink_repartition_watermark_example_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    with pytest.raises(RuntimeError, match="google.protobuf"):
        sessionize_tws(events)
