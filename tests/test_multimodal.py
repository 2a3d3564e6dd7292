"""Multimodal plumbing tests: payload fabrication, Arrow-batched
feature extraction, the decode stub contract, and the fake-decode
feature path."""

from __future__ import annotations

import hashlib

import pytest

from flink_repartition_watermark_example_spark.operators import multimodal as MM
from flink_repartition_watermark_example_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def payloads(spark, sf_dir):
    return MM.attach_payload(load_table(spark, sf_dir, "documents"))


def test_payload_shape(payloads):
    row = payloads.first()
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.meta.modality == "text"
    assert row.meta.n_bytes == len(row.payload)


def test_extract_features_matches_python(spark, sf_dir, payloads):
    feats = {r.doc_id: r for r in MM.extract_features(payloads).collect()}
    docs = {r.doc_id: r.text for r in load_table(spark, sf_dir, "documents").collect()}
    assert set(feats) == set(docs)
    for doc_id, text in list(docs.items())[:20]:
        b = text.encode("utf-8")
        assert feats[doc_id].n_bytes == len(b)
        assert feats[doc_id].digest == hashlib.md5(b).hexdigest()


def test_decode_image_is_explicit_stub(payloads):
    with pytest.raises(NotImplementedError, match="imaging library"):
        MM.decode_image(payloads)


def test_fake_decode_is_deterministic_fixed_width(payloads):
    a = MM.fake_decode_features(payloads).orderBy("doc_id").collect()
    b = MM.fake_decode_features(payloads).orderBy("doc_id").collect()
    assert a == b
    assert all(len(r.features) == MM.FEATURE_DIM for r in a)
    assert all(0.0 <= x <= 1.0 for r in a[:20] for x in r.features)


def test_feature_plan_has_no_shuffle(payloads):
    """Byte stats + digest are scan-side JVM expressions — the whole
    plan must be shuffle-free."""
    plan = MM.extract_features(payloads)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0, f"expected a shuffle-free plan:\n{plan}"


def test_single_deliberate_shuffle_in_decode_plan(payloads):
    """The only Exchange in the Python decode path is the fan_out
    repartition that widens parallelism before the CPU-bound stage."""
    plan = (
        MM.fake_decode_features(payloads)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, f"expected only the fan_out shuffle:\n{plan}"
