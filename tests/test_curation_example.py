"""E2E regression for examples/curation_pipeline.py — the batch
counterpart of tests/test_streaming_pipeline.py.  Runs the whole
curation funnel at sf0.001 and pins its structural invariants; the
per-stage monotonicity asserts live inside the example itself."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
    ),
)


@pytest.mark.slow
def test_curation_pipeline_end_to_end(spark, sf_dir):
    # spark fixture already owns the session; the example's get_spark
    # returns the active one, so this runs in-process.
    from curation_pipeline import main

    res = main(sf_dir)
    f = res["funnel"]
    # every stage drops something on this corpus except quality (all
    # synthetic docs pass the length gate) — pin the stages that MUST
    # act so a silently-disabled stage fails loudly
    assert f["boilerplate"] < f["quality"]
    assert f["neardup"] < f["exact_dedup"]
    assert f["decontaminated"] < f["containment"]
    # the written corpus matches the funnel's survivor count
    total_chunks = sum(res["chunks_per_split"].values())
    assert total_chunks >= f["decontaminated"]  # >=1 chunk per doc
    assert res["tokens_by_split"]["train"] > res["tokens_by_split"]["test"]
