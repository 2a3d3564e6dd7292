"""Incremental cluster-map index (streaming/clustermap.py): label-graph
CC merges must reproduce the batch connected-component split exactly in
any arrival order, crash-replayed batches must be idempotent, versions
must time-travel, and relabeling must touch only merged clusters."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_repartition_watermark_example_spark.operators.dedup import simhash_neardup_pairs
from flink_repartition_watermark_example_spark.operators.graph import connected_components
from flink_repartition_watermark_example_spark.sources.tables import load_table
from flink_repartition_watermark_example_spark.streaming.clustermap import (
    cluster_map_writer,
    read_cluster_map,
)

pytestmark = pytest.mark.slow  # streaming replays: minute-class


def _rows(df):
    return sorted(
        (r["doc_id"], r["cluster_id"], r["split"]) for r in df.collect()
    )


def _batch_map(spark, docs):
    """The batch twin: uncapped simhash pairs -> CC -> md5 split."""
    from flink_repartition_watermark_example_spark.queries_dedup import _cluster_split_col

    pairs = simhash_neardup_pairs(docs, max_bucket_docs=None)
    cc = connected_components(
        docs.select(F.col("doc_id").alias("v")), pairs, "v", "doc_a", "doc_b"
    )
    return cc.select(
        F.col("v").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        _cluster_split_col().alias("split"),
    )


def _run_batches(spark, docs, conds, tmp_path, tag):
    index = str(tmp_path / f"index_{tag}")
    mp = str(tmp_path / f"map_{tag}")
    write = cluster_map_writer(index, mp, max_bucket_docs=None)
    for bid, cond in enumerate(conds):
        write(docs.where(cond), bid)
    return index, mp, write


def test_streamed_map_equals_batch_in_two_split_orders(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    expected = _rows(_batch_map(spark, docs))
    two = [F.col("doc_id") % 2 == 0, F.col("doc_id") % 2 == 1]
    _, mp1, _ = _run_batches(spark, docs, two, tmp_path, "fwd")
    assert _rows(read_cluster_map(spark, mp1)) == expected
    # reversed arrival order: min-merge is order-independent
    _, mp2, _ = _run_batches(spark, docs, list(reversed(two)), tmp_path, "rev")
    assert _rows(read_cluster_map(spark, mp2)) == expected


def test_replayed_batch_is_idempotent(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    conds = [F.col("doc_id") % 2 == 0, F.col("doc_id") % 2 == 1]
    index, mp, write = _run_batches(spark, docs, conds, tmp_path, "replay")
    before = _rows(read_cluster_map(spark, mp))
    # crash-replay batch 1: same id, same data — must overwrite itself
    write(docs.where(conds[1]), 1)
    assert _rows(read_cluster_map(spark, mp)) == before


def test_versions_time_travel(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    conds = [F.col("doc_id") % 2 == 0, F.col("doc_id") % 2 == 1]
    _, mp, _ = _run_batches(spark, docs, conds, tmp_path, "tt")
    v0 = read_cluster_map(spark, mp, version=0)
    # AS OF the first batch: exactly that batch's docs, each mapped,
    # and the labels equal the batch CC over that prefix alone
    assert _rows(v0) == _rows(_batch_map(spark, docs.where(conds[0])))
    assert read_cluster_map(spark, mp).count() == docs.count()


def test_relabel_touches_only_merged_clusters(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    conds = [F.col("doc_id") % 2 == 0, F.col("doc_id") % 2 == 1]
    _, mp, _ = _run_batches(spark, docs, conds, tmp_path, "touch")
    v0 = {r["doc_id"]: r["cluster_id"] for r in read_cluster_map(spark, mp, version=0).collect()}
    v1 = {r["doc_id"]: r["cluster_id"] for r in read_cluster_map(spark, mp, version=1).collect()}
    changed_labels = {v0[d] for d in v0 if v1[d] != v0[d]}
    # every changed label must belong to a cluster that MERGED in
    # batch 1: its docs' new label must cover docs from outside the
    # old cluster (strictly larger component) — no gratuitous rewrites
    for lbl in changed_labels:
        old_members = {d for d in v0 if v0[d] == lbl}
        new_lbl = {v1[d] for d in old_members}
        assert len(new_lbl) == 1  # cluster moved as a unit
        merged_members = {d for d in v1 if v1[d] == next(iter(new_lbl))}
        assert merged_members > old_members


def test_empty_batch_is_a_noop(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    index, mp, write = _run_batches(
        spark, docs, [F.col("doc_id") % 2 == 0], tmp_path, "empty"
    )
    before = _rows(read_cluster_map(spark, mp))
    write(docs.where(F.lit(False)), 1)
    assert not os.path.isdir(os.path.join(mp, "v1"))
    assert _rows(read_cluster_map(spark, mp)) == before
