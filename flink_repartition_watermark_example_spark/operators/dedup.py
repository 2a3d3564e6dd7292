"""Deduplication operator family (north-star surface).

Exact → fingerprint → minhash/LSH → simhash, in increasing fuzziness.
Design point at 100 TB: never materialize O(n²) pairs — every near-dup
path goes shingle→signature→band→bucket join, so candidate generation
is a hash join on band keys and only bucket-mates are compared.

All hashes are the cross-engine md5-based family (functions/hashing.py)
so each stage is DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_repartition_watermark_example_spark.functions import textfns as TX
from flink_repartition_watermark_example_spark.functions.hashing import md5_long
from flink_repartition_watermark_example_spark.scale import fan_out

# Minhash geometry: 16 permutations in 4 bands of 4 rows.  P(candidate)
# = 1-(1-j^4)^4 — the usual S-curve with midpoint ~0.7 jaccard.
NUM_PERMS = 16
NUM_BANDS = 4
ROWS_PER_BAND = NUM_PERMS // NUM_BANDS
SHINGLE_N = 3


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup: one representative (min id) per duplicate group,
    plus the group size.  A single hash-shuffle on the key columns;
    at scale prefer hashing long text first (see fingerprint_dedup)."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias(id_col),
        F.count(F.lit(1)).alias("dup_count"),
    )


def doc_shingles(docs: DataFrame, text_col: str = "text", n: int = SHINGLE_N) -> DataFrame:
    """doc_id + distinct word-n-gram shingle set (array column)."""
    return docs.select(
        "doc_id", F.array_distinct(TX.shingles(TX.tokens(text_col), n)).alias("shingles")
    )


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", num_perms: int = NUM_PERMS
) -> DataFrame:
    """Per-document minhash signature, exploded to rows
    (doc_id, perm, minhash) so the output is scalar-typed.

    perm k's hash family is md5_long(shingle || '#k'); the signature
    entry is the min over the doc's shingle set.  Docs with no shingles
    (< n tokens) get NULL minhashes and drop out of banding.
    """
    sh = doc_shingles(fan_out(docs, "doc_id"), text_col)
    sig = sh.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(num_perms - 1)),
                lambda k: F.array_min(
                    F.transform(
                        F.col("shingles"),
                        lambda s: md5_long(F.concat(s, F.lit("#"), k.cast("string"))),
                    )
                ),
            )
        ).alias("perm", "minhash"),
    )
    return sig.where(F.col("minhash").isNotNull())


def lsh_bands(signatures: DataFrame, rows_per_band: int = ROWS_PER_BAND) -> DataFrame:
    """Band the signature rows: band key = md5 of the band's minhashes
    concatenated in perm order.  (doc_id, band, band_hash)."""
    return (
        signatures.withColumn("band", (F.col("perm") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            md5_long(
                F.concat_ws(",", F.sort_array(F.collect_list(F.struct("perm", "minhash"))).minhash)
            ).alias("band_hash")
        )
    )


def lsh_candidate_pairs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Candidate near-dup pairs: docs sharing at least one LSH band
    bucket, with their estimated jaccard (fraction of equal minhash
    entries across all perms).

    Scale shape: the only joins are equi-joins on (band, band_hash) and
    on (doc_id, perm) — never a cross product.  Skewed buckets (a
    degenerate shingle shared by many docs) are bounded by AQE skew
    handling; a production hardening is to cap bucket size.
    """
    sigs = minhash_signatures(docs, text_col)
    bands = lsh_bands(sigs)
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa, sb = sigs.alias("sa"), sigs.alias("sb")
    est = (
        pairs.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(
            sb,
            (F.col("sb.doc_id") == F.col("doc_b"))
            & (F.col("sb.perm") == F.col("sa.perm")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            (
                F.sum(
                    F.when(F.col("sa.minhash") == F.col("sb.minhash"), 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1))
            ).alias("est_jaccard")
        )
    )
    return est


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = 0.3,
) -> DataFrame:
    """Exact n-gram-jaccard near-dup pairs over LSH candidates.

    LSH proposes (subquadratic), exact set-jaccard over the shingle
    arrays disposes; only pairs ≥ threshold survive.
    """
    cand = lsh_candidate_pairs(docs, text_col).select("doc_a", "doc_b")
    sh = doc_shingles(docs, text_col)
    j = (
        cand.join(sh.alias("ha"), F.col("ha.doc_id") == F.col("doc_a"))
        .join(sh.alias("hb"), F.col("hb.doc_id") == F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect(F.col("ha.shingles"), F.col("hb.shingles"))).cast(
                    "double"
                )
                / F.size(F.array_union(F.col("ha.shingles"), F.col("hb.shingles")))
            ).alias("jaccard"),
        )
    )
    return j.where(F.col("jaccard") >= threshold)


# --- simhash ---------------------------------------------------------------

SIMHASH_BITS = 60  # stay inside a positive signed 64-bit int


def simhash(docs: DataFrame, text_col: str = "text", bits: int = SIMHASH_BITS) -> DataFrame:
    """60-bit simhash over the distinct token set: bit b of the hash is
    set iff Σ_tokens (token_hash bit b ? +1 : −1) > 0.  Pure column
    algebra (no UDF); one scan, no shuffle.

    The per-bit loop is unrolled in Python (PySpark's shiftright/
    shiftleft take literal ints, not Columns) — 60 static expressions
    over a materialized hash array."""
    hashes = F.transform(F.array_distinct(TX.tokens(text_col)), lambda t: md5_long(t))
    hashed = fan_out(docs, "doc_id").select("doc_id", hashes.alias("hs"))

    def vote(b: int):
        return F.aggregate(
            F.col("hs"),
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    sim = F.lit(0).cast("long")
    for b in range(bits):
        sim = sim + F.when(vote(b) > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return hashed.select("doc_id", sim.alias("simhash"))
