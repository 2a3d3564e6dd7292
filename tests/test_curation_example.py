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
def test_curation_pipeline_end_to_end(spark, sf_dir, tmp_path):
    # spark fixture already owns the session; the example's get_spark
    # returns the active one, so this runs in-process.
    from curation_pipeline import main

    import pyarrow as pa
    import pyarrow.parquet as pq

    # Seed a container/excerpt pair the containment stage MUST purge:
    # the excerpt is a verbatim 40-token run of the 140-token container
    # (3-gram jaccard ~0.27 — below the near-dup threshold, so only the
    # asymmetric containment signal can catch it).  Tokens are unique to
    # the pair so no other stage touches them.
    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    words = [f"zqseed{i}" for i in range(140)]
    container = " ".join(words)
    excerpt = " ".join(words[40:80])
    seeded = pa.Table.from_pylist(
        [
            {"doc_id": 900000001, "text": container, "lang": "en",
             "source": "seed", "n_chars": len(container)},
            {"doc_id": 900000002, "text": excerpt, "lang": "en",
             "source": "seed", "n_chars": len(excerpt)},
        ],
        schema=tbl.schema,
    )
    seeded_dir = tmp_path / "sf_seeded"
    seeded_dir.mkdir()
    pq.write_table(
        pa.concat_tables([tbl, seeded]),
        str(seeded_dir / "documents.parquet"),
    )
    # the semantic stage needs the embeddings table; the seeded docs
    # deliberately have NO embedding rows (the purge-based join must
    # pass them through untouched)
    import shutil

    shutil.copy(
        os.path.join(sf_dir, "embeddings.parquet"),
        str(seeded_dir / "embeddings.parquet"),
    )

    res = main(str(seeded_dir))
    f = res["funnel"]
    # every stage drops something on this corpus except quality (all
    # synthetic docs pass the length gate) — pin the stages that MUST
    # act so a silently-disabled stage fails loudly
    assert f["boilerplate"] < f["quality"]
    assert f["neardup"] < f["exact_dedup"]
    assert f["containment"] < f["neardup"]  # the seeded excerpt dropped
    assert f["semantic"] < f["containment"]  # paraphrase twins purged
    assert f["decontaminated"] < f["semantic"]
    assert res["mix_weights"] and max(res["mix_weights"].values()) <= 3.0
    # the written corpus matches the funnel's survivor count
    total_chunks = sum(res["chunks_per_split"].values())
    assert total_chunks >= f["decontaminated"]  # >=1 chunk per doc
    assert res["tokens_by_split"]["train"] > res["tokens_by_split"]["test"]
