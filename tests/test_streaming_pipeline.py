"""End-to-end streaming curation (examples/streaming_pipeline.py):
the reference experiment's stream==batch contract applied to the whole
surface — streaming quality gate + incremental LSH dedup + CDC MERGE
snapshot must converge to EXACTLY the batch pipeline's purge, and the
streamed sessionizer must equal the built-in batch session_window."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")
)

from streaming_pipeline import (  # noqa: E402
    batch_purged_docs,
    quality_gate,
    run_streaming_curation,
)

from flink_repartition_watermark_example_spark.sinks import (  # noqa: E402
    _snapshot_versions,
    read_cdc_snapshot,
)
from flink_repartition_watermark_example_spark.sources.tables import load_table  # noqa: E402

pytestmark = pytest.mark.slow  # streaming replays: minute-class


@pytest.fixture(scope="module")
def pipeline(spark, sf_dir, tmp_path_factory):
    workdir = str(tmp_path_factory.mktemp("streaming_pipeline"))
    paths = run_streaming_curation(spark, sf_dir, workdir)
    return paths


def test_snapshot_equals_batch_purge(spark, sf_dir, pipeline):
    docs = load_table(spark, sf_dir, "documents")
    snap = read_cdc_snapshot(spark, pipeline["snapshot"])
    batch = batch_purged_docs(docs)

    got = {r["doc_id"] for r in snap.select("doc_id").collect()}
    want = {r["doc_id"] for r in batch.select("doc_id").collect()}
    assert got == want

    # the purge is non-trivial: the near-dup drop removes something
    # (the quality gate may pass everything at tiny SFs)
    n_docs = docs.count()
    n_gated = quality_gate(docs).count()
    assert len(want) < n_gated <= n_docs

    # payload survives the merge intact for surviving docs
    joined = snap.alias("s").join(
        docs.alias("d"), F.col("s.doc_id") == F.col("d.doc_id")
    )
    mismatched = joined.where(
        (F.col("s.text") != F.col("d.text"))
        | (F.col("s.source") != F.col("d.source"))
    ).count()
    assert mismatched == 0


def test_snapshot_is_versioned_and_time_travelable(spark, pipeline):
    versions = _snapshot_versions(pipeline["snapshot"])
    assert len(versions) >= 2  # one committed version per micro-batch
    # monotone growth of seen doc population: each version's snapshot
    # contains only docs that had arrived by that batch
    sizes = [
        read_cdc_snapshot(spark, pipeline["snapshot"], v).count()
        for v in versions
    ]
    assert sizes[-1] >= sizes[0]


def test_sessions_equal_builtin_batch(spark, sf_dir, pipeline):
    sessions = spark.read.parquet(pipeline["sessions"])
    got = sorted(map(tuple, sessions.collect()))
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    want = sorted(
        map(
            tuple,
            ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                "user_id",
                F.col("session_window.start").alias("session_start"),
                "n_events",
            )
            .collect(),
        )
    )
    assert got == want
