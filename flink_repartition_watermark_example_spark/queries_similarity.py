"""Similarity-search query registrations with DuckDB oracles.

The oracle SQL embeds the same compile-time hyperplane constants and
the same left-fold double arithmetic as the Spark plans, so cosine
values are bit-identical across engines (verified: 100/100 exact)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_repartition_watermark_example_spark.functions.vectors import cosine_sql
from flink_repartition_watermark_example_spark.operators import similarity as SIM
from flink_repartition_watermark_example_spark.queries import register
from flink_repartition_watermark_example_spark.sources.tables import load_table


def _bucket_sql(vec: str) -> str:
    parts = []
    for p, plane in enumerate(SIM.hyperplanes()):
        arr = "[" + ", ".join(str(c) for c in plane) + "]"
        proj = (
            f"list_reduce(list_transform(range(1, {SIM.EMBED_DIM} + 1), "
            f"i -> {vec}[i]::DOUBLE * ({arr}::DOUBLE[])[i]), (x, y) -> x + y)"
        )
        parts.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(parts)


@register(
    "cosine_topk",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
               WHERE vec_id < 10),
    c AS (SELECT vec_id, embedding AS v FROM embeddings WHERE vec_id >= 10),
    scored AS (
      SELECT query_id, vec_id, {cosine_sql('qv', 'v')} AS cos_sim
      FROM c CROSS JOIN q
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, vec_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, vec_id, cos_sim, rank FROM ranked WHERE rank <= 5
    """,
    doc="Exact cosine top-5 for 10 query vectors, broadcast brute force "
    "— the ANN correctness baseline.",
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SIM.cosine_topk(load_table(spark, sf_dir, "embeddings"))


@register(
    "lsh_ann_topk",
    f"""
    WITH v AS (
      SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket
      FROM embeddings
    ),
    q AS (
      SELECT vec_id AS query_id, embedding AS qv, t.probe
      FROM v, UNNEST([bucket, xor(bucket, 1), xor(bucket, 2),
                      xor(bucket, 4), xor(bucket, 8)]) AS t(probe)
      WHERE vec_id < 10
    ),
    c AS (SELECT vec_id, embedding AS cv, bucket FROM v WHERE vec_id >= 10),
    scored AS (
      SELECT query_id, c.vec_id, {cosine_sql('qv', 'cv')} AS cos_sim
      FROM q JOIN c ON c.bucket = q.probe
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, vec_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, vec_id, cos_sim, rank FROM ranked WHERE rank <= 5
    """,
    doc="Approximate top-5 via the LSH coarse index with Hamming-1 "
    "multi-probe — the sublinear scale path; cosine_topk is the exact "
    "baseline it trades recall against.",
)
def q_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SIM.lsh_ann_topk(load_table(spark, sf_dir, "embeddings"))


@register(
    "embedding_neardup_pairs",
    f"""
    WITH v AS (
      SELECT vec_id, embedding,
             {_bucket_sql('embedding')} AS bucket
      FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           {cosine_sql('a.embedding', 'b.embedding')} AS cos_sim
    FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {cosine_sql('a.embedding', 'b.embedding')} >= 0.25
    """,
    doc="Embedding-cosine near-dup pairs via 4-hyperplane LSH buckets "
    "(16 buckets, equi-join candidates) + cosine threshold 0.25.",
)
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SIM.neardup_pairs_lsh(load_table(spark, sf_dir, "embeddings"))


def _centroid_id_list() -> str:
    return ", ".join(str(c) for c in SIM.CENTROID_IDS)


@register(
    "ivf_ann_topk",
    f"""
    WITH cent AS (
      SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings
      WHERE vec_id IN ({", ".join(str(c) for c in SIM.CENTROID_IDS)})
    ),
    corpus AS (SELECT vec_id, embedding AS v FROM embeddings WHERE vec_id >= 10),
    assign AS (
      SELECT vec_id, v, centroid_id,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY {cosine_sql('v', 'cv')} DESC,
                                         centroid_id ASC) AS rn
      FROM corpus CROSS JOIN cent
    ),
    lists AS (SELECT vec_id, v, centroid_id AS list_id FROM assign WHERE rn = 1),
    q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
          WHERE vec_id < 10),
    qp AS (
      SELECT query_id, qv, centroid_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY {cosine_sql('qv', 'cv')} DESC,
                                         centroid_id ASC) AS rn
      FROM q CROSS JOIN cent
    ),
    probes AS (SELECT query_id, qv, centroid_id AS list_id FROM qp
               WHERE rn <= {SIM.NPROBE}),
    scored AS (
      SELECT p.query_id, l.vec_id, {cosine_sql('p.qv', 'l.v')} AS cos_sim
      FROM probes p JOIN lists l ON l.list_id = p.list_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, vec_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, vec_id, cos_sim, rank FROM ranked WHERE rank <= 5
    """,
    doc="Approximate top-5 via an IVF-flat coarse index (16 sampled "
    "centroids, 2-list probe): index build collects the centroids once "
    "and ships them as literals, corpus assignment is a shuffle-free "
    "map-side projection — the k-means-family scale path next to "
    "lsh_ann_topk's hashing-family one.",
)
def q_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SIM.ivf_topk(load_table(spark, sf_dir, "embeddings"))
