"""Text-analysis query registrations (north-star surface) — Spark plans
from operators/text.py paired with DuckDB oracles rendered by the same
functions/textfns.py helpers, so both sides stay in lockstep."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_repartition_watermark_example_spark.functions import textfns as TX
from flink_repartition_watermark_example_spark.operators.text import analyze_documents
from flink_repartition_watermark_example_spark.queries import register
from flink_repartition_watermark_example_spark.sources.tables import load_table

_TOKS = TX.tokens_sql("text")


@register(
    "text_analysis",
    f"""
    WITH toks AS (SELECT doc_id, text, {_TOKS} AS t FROM documents)
    SELECT doc_id,
           len(t) AS n_tokens,
           {TX.lang_id_sql('t')} AS lang_pred,
           {TX.quality_score_sql('text', 't')} AS quality,
           {TX.fingerprint_sql('t')} AS fingerprint
    FROM toks
    """,
    doc="One-pass per-document feature block: token count, stopword-"
    "inventory language ID, quality score, content fingerprint.",
)
def q_text_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analyze_documents(load_table(spark, sf_dir, "documents"))


@register(
    "text_quality_by_source",
    f"""
    WITH toks AS (SELECT source, text, {_TOKS} AS t FROM documents)
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CAST({TX.quality_score_sql('text', 't')} AS DECIMAL(18,9))) AS DOUBLE)
             AS sum_quality
    FROM toks
    GROUP BY source
    """,
    doc="Corpus-quality rollup per source — the filter-the-crawl "
    "aggregation; decimal-summed for cross-engine reproducibility.",
)
def q_text_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = TX.tokens("text")
    return (
        docs.select(
            "source", TX.quality_score(F.col("text"), toks).alias("q")
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("q").cast("decimal(18,9)")).cast("double").alias("sum_quality"),
        )
    )


@register(
    "word_count_topn",
    f"""
    WITH toks AS (SELECT {_TOKS} AS t FROM documents),
    words AS (SELECT unnest(t) AS word FROM toks)
    SELECT word, count(*) AS n
    FROM words
    GROUP BY word
    ORDER BY n DESC, word ASC
    LIMIT 20
    """,
    doc="Corpus vocabulary head: explode (lateral/UNNEST) of the token "
    "arrays into a word-frequency agg with deterministic top-20 — "
    "map-side partial counts make the shuffle O(|vocab|), not O(tokens).",
)
def q_word_count_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(TX.tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(20)
    )


@register(
    "lang_id_confusion",
    f"""
    WITH toks AS (SELECT lang, {_TOKS} AS t FROM documents)
    SELECT lang, {TX.lang_id_sql('t')} AS lang_pred, count(*) AS n
    FROM toks
    GROUP BY 1, 2
    """,
    doc="Declared-vs-predicted language confusion counts.",
)
def q_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", TX.lang_id(TX.tokens("text")).alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "token_counts_by_source",
    f"""
    SELECT source,
           count(*) AS n_docs,
           sum(len({_TOKS})) AS ws_tokens,
           sum(len({TX.bpe_tokens_sql('text')})) AS bpe_tokens,
           CAST(sum(len({TX.bpe_tokens_sql('text')})) AS DOUBLE)
             / sum(len({_TOKS})) AS bpe_per_word
    FROM documents
    GROUP BY source
    """,
    doc="Token-counting pass for training-data budgeting: whitespace "
    "words vs BPE-ish pre-tokens (letter runs / digit runs / single "
    "symbols — the split every BPE tokenizer applies before merges) "
    "per source. Both counters are JVM regex expressions inside the "
    "scan projection; the shuffle carries one row per source.",
)
def q_token_counts_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ws = F.size(TX.tokens("text"))
    bpe = F.size(TX.bpe_tokens("text"))
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(ws).cast("long").alias("ws_tokens"),
            F.sum(bpe).cast("long").alias("bpe_tokens"),
            (F.sum(bpe).cast("double") / F.sum(ws)).alias("bpe_per_word"),
        )
    )
