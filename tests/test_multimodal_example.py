"""E2E regression for examples/multimodal_pipeline.py — the media
curation funnel over the three real codecs.  The audio and video
gates are closed forms of doc_id, so the expected counts are computed
exactly here; a silently-disabled gate cannot pass."""

from __future__ import annotations

import importlib.util
import os

from flink_repartition_watermark_example_spark.sources.tables import load_table

_EX = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples",
    "multimodal_pipeline.py",
)
spec = importlib.util.spec_from_file_location("multimodal_pipeline", _EX)
mm_pipeline = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mm_pipeline)


def test_multimodal_funnel_gates_act_exactly(spark, sf_dir):
    doc_ids = [
        r.doc_id for r in load_table(spark, sf_dir, "documents").select("doc_id").collect()
    ]
    f = mm_pipeline.run(spark, sf_dir)

    # deterministic gates, recomputed from the synth formulas:
    # audio sample_rate = 8000*(1 + d%3) >= 16000  ⇔  d % 3 != 0
    exp_audio = sum(1 for d in doc_ids if d % 3 != 0)
    # video sampled frames = ceil((3 + d%5)/2) >= 3  ⇔  d % 5 >= 2
    exp_video = sum(1 for d in doc_ids if (3 + d % 5 + 1) // 2 >= 3)

    assert f["total"] == len(doc_ids)
    assert f["audio_ok"] == exp_audio
    assert f["video_ok"] == exp_video
    # the image brightness gate may pass everything (synthetic pixels
    # are mid-range) but must never grow the relation
    assert 0 < f["image_ok"] <= f["total"]
    # every gate genuinely acts on this corpus
    assert f["audio_ok"] < f["total"]
    assert f["video_ok"] < f["total"]
    # the manifest is the intersection — bounded by the tightest gate
    assert f["curated"] <= min(f["image_ok"], f["audio_ok"], f["video_ok"])
    assert f["curated"] > 0
