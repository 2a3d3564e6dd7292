"""Generator-contract tests for scripts/gen_scale.py.

The scale artifacts (BENCH_sf1/sf10.json) only measure ENGINE scaling
if the generated corpus actually scales like a mostly-unique one.  The
original document perturbation appended a single trailing token per
replica, which left every replica of a doc at ~0.96 shingle-jaccard of
its siblings — true near-dup pairs grew as C(mult, 2) and the sweep
measured quadratic OUTPUT as engine super-linearity (sf10 worst entry
9.8×).  These tests pin the fixed contract:

- replica texts share NO tokens (hence no shingles) with other
  replicas of the same doc → exact-jaccard pairs can never span
  replicas, so the true-pair count is linear in mult;
- replica 0 is byte-identical to the base corpus, so its near-dup
  pairs are exactly the base corpus's pairs.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from gen_scale import STRIDE, scale_table  # noqa: E402

from flink_repartition_watermark_example_spark.operators import dedup as DD  # noqa: E402

MULT = 3


@pytest.fixture(scope="module")
def scaled_docs(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("scaled"))
    scale_table(spark, sf_dir, out, "documents", MULT)
    return spark.read.parquet(os.path.join(out, "documents.parquet"))


def test_replica_token_sets_are_disjoint(scaled_docs):
    # Tokens of any r>0 replica never appear in any other replica of
    # the same base doc (suffix ~r{r} is injective per replica).
    toks = scaled_docs.select(
        (F.col("doc_id") % STRIDE["doc"]).alias("base_id"),
        F.floor(F.col("doc_id") / STRIDE["doc"]).alias("replica"),
        F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"),
    ).distinct()
    shared = (
        toks.alias("a")
        .join(
            toks.alias("b"),
            (F.col("a.base_id") == F.col("b.base_id"))
            & (F.col("a.replica") < F.col("b.replica"))
            & (F.col("a.tok") == F.col("b.tok")),
        )
        .count()
    )
    assert shared == 0


def test_no_cross_replica_neardup_pairs(scaled_docs):
    # Exact-jaccard pairs require a shared shingle; disjoint token
    # sets make cross-replica pairs impossible — the property that
    # keeps true pair count LINEAR in mult.
    pairs = DD.ngram_jaccard_pairs(scaled_docs, threshold=0.3).select(
        F.floor(F.col("doc_a") / STRIDE["doc"]).alias("ra"),
        F.floor(F.col("doc_b") / STRIDE["doc"]).alias("rb"),
    )
    assert pairs.where(F.col("ra") != F.col("rb")).count() == 0


def test_replica_zero_matches_base_corpus(spark, sf_dir, scaled_docs):
    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    r0 = scaled_docs.where(F.col("doc_id") < STRIDE["doc"])
    assert r0.count() == base.count()
    # byte-identical text for replica 0 → its dedup structure IS the
    # base corpus's
    diff = (
        r0.select("doc_id", "text")
        .exceptAll(base.select("doc_id", "text"))
        .count()
    )
    assert diff == 0
