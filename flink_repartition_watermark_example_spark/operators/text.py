"""Text-analysis operators over the ``documents`` table (north-star
surface: language ID, quality scoring, token counting, fingerprinting).

All pure column expressions from functions/textfns.py — scan-local,
no shuffle, whole-stage-codegen'd.  On 100 TB of documents each of
these is a single pass over the text column with the other columns
pruned from the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_repartition_watermark_example_spark.functions import textfns as TX


def analyze_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text analysis: token count, language ID, quality score,
    fingerprint — the per-document feature block a training-data
    pipeline computes before filtering."""
    toks = TX.tokens(text_col)
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        TX.lang_id(toks).alias("lang_pred"),
        TX.quality_score(F.col(text_col), toks).alias("quality"),
        TX.fingerprint(toks).alias("fingerprint"),
    )
