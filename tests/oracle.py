"""Local mirror of the driver's DuckDB oracle comparison.

Runs a registered Spark query and its oracle SQL side-by-side on the
same parquet and asserts row-count + column-name + value equality,
order-insensitively (the driver sorts columns by name and hashes
values; we additionally sort rows and compare exactly, which is
stricter)."""

from __future__ import annotations

import duckdb
import pandas as pd

from flink_repartition_watermark_example_spark.datamodel import TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = (
                pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[ns]")
            )
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_object_dtype(df[c]):
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_matches_oracle(spark, query, sf_dir: str, float_exact: bool = True):
    """query: a queries.Query (spark fn + oracle SQL)."""
    spark_pdf = query.spark(spark, sf_dir).toPandas()
    con = duckdb_con(sf_dir)
    try:
        oracle_pdf = con.sql(query.oracle).df()
    finally:
        con.close()

    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"column mismatch: spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"row count mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    s, o = _normalize(spark_pdf), _normalize(oracle_pdf)
    if float_exact:
        pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=True)
    else:
        pd.testing.assert_frame_equal(s, o, check_dtype=False, rtol=1e-9)
