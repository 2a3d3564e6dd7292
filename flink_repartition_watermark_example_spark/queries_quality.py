"""Data-quality / profiling surface: declarative constraint checking,
one-pass long-format table profiling, and key-skew diagnostics.

The shapes a production lakehouse runs before (and while) any of the
analytics in the other registries touch the data — the Deequ /
dbt-test / Great-Expectations capability class, re-expressed as plain
Catalyst plans:

- ``dq_constraint_report``: a constraint catalog (completeness,
  uniqueness, accepted values, referential integrity, value ranges)
  evaluated in ONE aggregation pass per table plus one anti-join per
  RI rule, emitting the (table, constraint, metric, satisfied) report
  row per rule.  Every metric is a single division of two exact longs,
  so the doubles are bit-reproducible across engines and partitionings.
- ``table_profile``: per-column null fraction / exact distinct count /
  min / max / mean length for the ``orders`` table in long format —
  the scan-planning artifact (which columns are keys, which are
  low-cardinality dictionary candidates) a 100 TB ingest reads first.
- ``key_skew_report``: per join/shuffle key (orders.o_custkey,
  lineitem.l_suppkey, events.user_id) the cardinality, max-key share,
  deterministic top-10 share, and an exact integer-arithmetic HHI —
  the numbers that decide salting / AQE-skew-join settings BEFORE a
  1000-executor shuffle discovers them the hard way.

Scale notes (100 TB): every query here is one map-side-combined
aggregation pass per table (the skew report adds a TakeOrdered top-k —
never a global row sort); report relations are O(#constraints),
O(#columns), or O(#keys-profiled) rows.  Float discipline: ratios are
single divisions of exact integer counts (sum of squared counts stays
in int64), never a float sum over an unordered shuffle.

Reference anchor: the reference engine (Main.scala:21-29) has no DQ
surface at all; this family is part of the beyond-reference
training-pipeline scope (round-12 build plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_repartition_watermark_example_spark.queries import register, register_extra
from flink_repartition_watermark_example_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# dq_constraint_report
# ---------------------------------------------------------------------------

# (table, constraint, pass-count SQL over that table) — the DuckDB
# rendering; the Spark side computes the identical counts with
# conditional aggregates.  Metric = passing / total, satisfied when
# every row passes (metric == 1.0 exactly — both engines produce the
# same double from the same long division).
_DQ_SQL = """
    WITH o AS (
      SELECT count(*) AS n,
             count(o_custkey) AS c_complete,
             count(DISTINCT o_orderkey) AS c_unique,
             sum(CASE WHEN o_orderstatus IN ('F','O','P') THEN 1 ELSE 0 END)
               AS c_accepted
      FROM orders),
    o_ri AS (
      SELECT count(*) AS n_ok FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer)),
    l AS (
      SELECT count(*) AS n,
             sum(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 1 ELSE 0 END)
               AS c_qty,
             sum(CASE WHEN l_discount BETWEEN 0 AND 0.1 THEN 1 ELSE 0 END)
               AS c_disc
      FROM lineitem),
    l_ri AS (
      SELECT count(*) AS n_ok FROM lineitem
      WHERE l_orderkey IN (SELECT o_orderkey FROM orders)),
    c AS (
      SELECT count(*) AS n,
             sum(CASE WHEN c_acctbal >= 0 THEN 1 ELSE 0 END) AS c_nonneg
      FROM customer),
    rep AS (
      SELECT 'orders' AS tbl, 'completeness_o_custkey' AS constraint_name,
             CAST(c_complete AS DOUBLE) / n AS metric FROM o
      UNION ALL
      SELECT 'orders', 'uniqueness_o_orderkey',
             CAST(c_unique AS DOUBLE) / n FROM o
      UNION ALL
      SELECT 'orders', 'accepted_values_o_orderstatus',
             CAST(c_accepted AS DOUBLE) / n FROM o
      UNION ALL
      SELECT 'orders', 'ref_integrity_o_custkey',
             CAST(o_ri.n_ok AS DOUBLE) / o.n FROM o, o_ri
      UNION ALL
      SELECT 'lineitem', 'range_l_quantity_1_50',
             CAST(c_qty AS DOUBLE) / n FROM l
      UNION ALL
      SELECT 'lineitem', 'range_l_discount_0_0.1',
             CAST(c_disc AS DOUBLE) / n FROM l
      UNION ALL
      SELECT 'lineitem', 'ref_integrity_l_orderkey',
             CAST(l_ri.n_ok AS DOUBLE) / l.n FROM l, l_ri
      UNION ALL
      SELECT 'customer', 'non_negative_c_acctbal',
             CAST(c_nonneg AS DOUBLE) / n FROM c)
    SELECT tbl, constraint_name, metric, metric >= 1.0 AS satisfied
    FROM rep
"""


@register(
    "dq_constraint_report",
    _DQ_SQL,
    doc="Declarative data-quality gate (the Deequ/dbt-test shape): a "
    "constraint catalog — completeness, key uniqueness, accepted "
    "values, referential integrity, numeric ranges — evaluated as ONE "
    "conditional-aggregate pass per table plus one LeftSemi per RI "
    "rule, emitted as the (table, constraint, metric, satisfied) "
    "report.  non_negative_c_acctbal fails by construction on the "
    "synthetic data (~8% negative), proving the report distinguishes "
    "pass from fail.  Scale shape: metrics are O(1)-row relations "
    "joined without shuffle; the only per-row work is the table scans "
    "themselves (map-side combined), so the report costs one read of "
    "each audited table regardless of corpus size.",
)
def q_dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")

    o_agg = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_custkey").alias("c_complete"),
        F.countDistinct("o_orderkey").alias("c_unique"),
        F.sum(
            F.when(F.col("o_orderstatus").isin("F", "O", "P"), 1).otherwise(0)
        ).alias("c_accepted"),
    )
    o_ri = (
        o.join(c.select("c_custkey"), o.o_custkey == F.col("c_custkey"), "left_semi")
        .agg(F.count(F.lit(1)).alias("n_ok"))
    )
    l_agg = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("l_quantity").between(1, 50), 1).otherwise(0)).alias(
            "c_qty"
        ),
        F.sum(F.when(F.col("l_discount").between(0.0, 0.1), 1).otherwise(0)).alias(
            "c_disc"
        ),
    )
    l_ri = (
        li.join(
            o.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_semi"
        )
        .agg(F.count(F.lit(1)).alias("n_ok"))
    )
    c_agg = c.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("c_acctbal") >= 0, 1).otherwise(0)).alias("c_nonneg"),
    )

    # Measured and deliberately NOT pinned (r12): checkpoint-pinning
    # the one-row aggregates ran 1.1-1.25 s vs 0.67-0.89 s unpinned —
    # five materialization jobs cost more than the overlapped scans
    # they avoid.  r13 restructure instead: the old 8-branch UNION ALL
    # re-embedded each aggregate subtree per branch (orders scanned 6x,
    # lineitem 4x, 13 WholeStageCodegen units — rep-0 paid ~1.9 s of
    # codegen compile alone, VERDICT r12 #4).  Now the five one-row
    # relations crossJoin ONCE (broadcast nested loops between
    # single-row aggregates — the allowlisted bounded class) and a
    # single stack() derives the 8 report rows: each audited table is
    # scanned once per rule class, one codegen unit per aggregate,
    # identical metrics (same long counts, same double division).
    wide = (
        o_agg.select(
            F.col("n").alias("o_n"), "c_complete", "c_unique", "c_accepted"
        )
        .crossJoin(o_ri.select(F.col("n_ok").alias("o_ri_ok")))
        .crossJoin(
            l_agg.select(F.col("n").alias("l_n"), "c_qty", "c_disc")
        )
        .crossJoin(l_ri.select(F.col("n_ok").alias("l_ri_ok")))
        .crossJoin(c_agg.select(F.col("n").alias("c_n"), "c_nonneg"))
    )
    rep = wide.selectExpr(
        """stack(8,
        'orders', 'completeness_o_custkey', CAST(c_complete AS DOUBLE) / o_n,
        'orders', 'uniqueness_o_orderkey', CAST(c_unique AS DOUBLE) / o_n,
        'orders', 'accepted_values_o_orderstatus',
            CAST(c_accepted AS DOUBLE) / o_n,
        'orders', 'ref_integrity_o_custkey', CAST(o_ri_ok AS DOUBLE) / o_n,
        'lineitem', 'range_l_quantity_1_50', CAST(c_qty AS DOUBLE) / l_n,
        'lineitem', 'range_l_discount_0_0.1', CAST(c_disc AS DOUBLE) / l_n,
        'lineitem', 'ref_integrity_l_orderkey',
            CAST(l_ri_ok AS DOUBLE) / l_n,
        'customer', 'non_negative_c_acctbal', CAST(c_nonneg AS DOUBLE) / c_n
        ) AS (tbl, constraint_name, metric)"""
    )
    return rep.select(
        "tbl",
        "constraint_name",
        "metric",
        (F.col("metric") >= 1.0).alias("satisfied"),
    )


# ---------------------------------------------------------------------------
# table_profile
# ---------------------------------------------------------------------------

# Profiled columns of `orders` with a type tag deciding the min/max
# string rendering (timestamps render as 'YYYY-MM-DD HH:MM:SS' on both
# engines; doubles go through DECIMAL(18,2) so the string form is
# engine-independent).
_PROFILE_COLS = [
    ("o_orderkey", "int"),
    ("o_custkey", "int"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]


def _profile_minmax_sql(col: str, kind: str, agg: str) -> str:
    if kind == "ts":
        return f"strftime({agg}({col}), '%Y-%m-%d %H:%M:%S')"
    if kind == "num":
        return f"CAST(CAST({agg}({col}) AS DECIMAL(18,2)) AS VARCHAR)"
    return f"CAST({agg}({col}) AS VARCHAR)"


_PROFILE_SQL = (
    "WITH a AS (SELECT count(*) AS n, "
    + ", ".join(
        f"count({c}) AS nn_{c}, count(DISTINCT {c}) AS nd_{c}, "
        f"{_profile_minmax_sql(c, k, 'min')} AS mn_{c}, "
        f"{_profile_minmax_sql(c, k, 'max')} AS mx_{c}"
        for c, k in _PROFILE_COLS
    )
    + " FROM orders) "
    + " UNION ALL ".join(
        f"SELECT '{c}' AS col_name, "
        f"CAST(n - nn_{c} AS DOUBLE) / n AS null_frac, "
        f"CAST(nd_{c} AS BIGINT) AS n_distinct, "
        f"mn_{c} AS min_repr, mx_{c} AS max_repr FROM a"
        for c, _ in _PROFILE_COLS
    )
)


@register_extra(
    "table_profile",
    _PROFILE_SQL,
    doc="One-pass long-format column profile of `orders`: per column "
    "the null fraction, EXACT distinct count, and min/max rendered as "
    "engine-portable strings (timestamps via an explicit format, "
    "doubles via DECIMAL(18,2)) — the artifact that tells an ingest "
    "which columns are join keys (distinct==rows), dictionary-encoding "
    "candidates (distinct in the tens), or constant.  Scale shape: a "
    "single aggregation pass; the multi-count-distinct renders as one "
    "Expand (rows x #profiled columns) feeding a two-level hash "
    "aggregate — still one scan of the parquet, map-side combined, "
    "with an O(#columns)-row result.  At 100 TB the same plan runs "
    "with approx_count_distinct swapped in when 2% error is "
    "acceptable; the exact variant here is what the DuckDB oracle can "
    "hash-check.",
)
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")

    def minmax(col: str, kind: str, fn) -> F.Column:
        c = fn(F.col(col))
        if kind == "ts":
            return F.date_format(c, "yyyy-MM-dd HH:mm:ss")
        if kind == "num":
            return c.cast("decimal(18,2)").cast("string")
        return c.cast("string")

    aggs = [F.count(F.lit(1)).alias("n")]
    for c, k in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            minmax(c, k, F.min).alias(f"mn_{c}"),
            minmax(c, k, F.max).alias(f"mx_{c}"),
        ]
    # NOT pinned, deliberately (measured r12): checkpointing the wide
    # agg forces ONE pass containing all six countDistincts, which
    # Catalyst plans as an Expand (x7 row blowup) + wide distinct agg
    # — 4.2 s vs 1.7 s at sf0.1.  Unpinned, each union branch prunes
    # to a single-distinct aggregate over only its own column; the six
    # scans re-read the same (OS-cached) table and each shuffles one
    # narrow distinct stream — cheaper locally AND the saner shuffle
    # shape at scale (an Expand multiplies the corpus through the
    # exchange; six column-pruned scans each read one column).
    a = o.agg(*aggs)
    out = None
    for c, _ in _PROFILE_COLS:
        r = a.select(
            F.lit(c).alias("col_name"),
            ((F.col("n") - F.col(f"nn_{c}")).cast("double") / F.col("n")).alias(
                "null_frac"
            ),
            F.col(f"nd_{c}").cast("long").alias("n_distinct"),
            F.col(f"mn_{c}").alias("min_repr"),
            F.col(f"mx_{c}").alias("max_repr"),
        )
        out = r if out is None else out.unionAll(r)
    return out


# ---------------------------------------------------------------------------
# key_skew_report
# ---------------------------------------------------------------------------

_SKEW_KEYS = [
    ("orders", "o_custkey"),
    ("lineitem", "l_suppkey"),
    ("events", "user_id"),
]

_SKEW_SQL = " UNION ALL ".join(
    f"""
    (WITH kc AS (SELECT {key} AS k, count(*) AS cnt FROM {tbl}
                 WHERE {key} IS NOT NULL GROUP BY 1),
    mom AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
                   CAST(count(*) AS BIGINT) AS n_keys,
                   CAST(max(cnt) AS BIGINT) AS max_count,
                   CAST(sum(cnt * cnt) AS BIGINT) AS sum_cnt2
            FROM kc),
    topk AS (SELECT CAST(sum(cnt) AS BIGINT) AS top10_count
             FROM (SELECT cnt FROM kc ORDER BY cnt DESC, k ASC LIMIT 10))
    SELECT '{tbl}' AS tbl, '{key}' AS key_col,
           n_rows, n_keys, max_count, top10_count,
           CAST(max_count AS DOUBLE) / n_rows AS max_share,
           CAST(top10_count AS DOUBLE) / n_rows AS top10_share,
           CAST(sum_cnt2 AS DOUBLE) / (CAST(n_rows AS DOUBLE) * n_rows)
             AS hhi
    FROM mom, topk)
    """
    for tbl, key in _SKEW_KEYS
)


@register_extra(
    "key_skew_report",
    _SKEW_SQL,
    doc="Shuffle-key skew diagnostics for the three hottest join/agg "
    "keys: cardinality, heaviest-key share, deterministic top-10 share "
    "(ties broken by key), and the Herfindahl concentration index — "
    "the exact numbers that decide whether a 1000-executor shuffle "
    "needs salting (operators/dedup salted join), AQE skew splitting, "
    "or nothing.  Float discipline: HHI accumulates sum(cnt^2) in "
    "int64 (exact, order-insensitive) and divides once; shares are "
    "single divisions — no float sum ever crosses the shuffle.  Scale "
    "shape per table: map-side-combined count per key, an O(#keys) "
    "moment aggregate, and a TakeOrdered(10) — never a global row "
    "sort; result is one row per profiled key.",
)
def q_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for tbl, key in _SKEW_KEYS:
        t = load_table(spark, sf_dir, tbl)
        # kc feeds two branches (the moment aggregate and the top-10
        # slice); pinned so the table scan + per-key count runs once
        # per table instead of twice (r12).  O(#keys) executor blocks.
        kc = (
            t.where(F.col(key).isNotNull())
            .groupBy(F.col(key).alias("k"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .localCheckpoint(eager=True)
        )
        mom = kc.agg(
            F.sum("cnt").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.max("cnt").cast("long").alias("max_count"),
            F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("sum_cnt2"),
        )
        topk = (
            kc.orderBy(F.col("cnt").desc(), F.col("k").asc())
            .limit(10)
            .agg(F.sum("cnt").cast("long").alias("top10_count"))
        )
        r = mom.crossJoin(topk).select(
            F.lit(tbl).alias("tbl"),
            F.lit(key).alias("key_col"),
            "n_rows",
            "n_keys",
            "max_count",
            "top10_count",
            (F.col("max_count").cast("double") / F.col("n_rows")).alias("max_share"),
            (F.col("top10_count").cast("double") / F.col("n_rows")).alias(
                "top10_share"
            ),
            (
                F.col("sum_cnt2").cast("double")
                / (F.col("n_rows").cast("double") * F.col("n_rows"))
            ).alias("hhi"),
        )
        out = r if out is None else out.unionAll(r)
    return out


# ---------------------------------------------------------------------------
# streaming_dq_monitor
# ---------------------------------------------------------------------------

_DQ_MONITOR_SQL = """
    SELECT date_trunc('hour', ts) AS hour,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_errors,
           CAST(sum(CASE WHEN value > 400.0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null_user,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS DOUBLE) / count(*) AS error_share,
           (CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                 AS DOUBLE) / count(*)) > 0.25 AS error_alert
    FROM events
    GROUP BY 1
"""


@register_extra(
    "streaming_dq_monitor",
    _DQ_MONITOR_SQL,
    doc="The streaming face of the DQ family: per-event-hour rule "
    "counters (error events, value outliers, null user ids) maintained "
    "as an incremental index (streaming/dqmonitor.py) — each "
    "micro-batch writes an additive versioned delta under the "
    "neardup-index discipline (replay-idempotent, crash-repairable, "
    "losslessly compactable), and the report derives share/alert "
    "columns from the merged counters with one exact-long division.  "
    "Counters are algebraic, so streamed-in-any-split == batch "
    "EXACTLY: the oracle is the plain GROUP BY.  Keyed on EVENT time, "
    "so late data folds into its own hour; per-batch cost is O(batch), "
    "state is O(hours-seen) — bounded regardless of stream length.  "
    "This is ingest gating at 100 TB: the pipeline reads the alert "
    "flag per hour without recomputing history.",
)
def q_streaming_dq_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_repartition_watermark_example_spark.queries_sketches import _replay_through_sketch
    from flink_repartition_watermark_example_spark.streaming.dqmonitor import (
        compact_dq_state,
        dq_monitor_writer,
        read_dq_report,
    )

    ev = load_table(spark, sf_dir, "events")
    return _replay_through_sketch(
        spark,
        ev.select("event_id", "ts", "event_type", "value", "user_id"),
        dq_monitor_writer,
        lambda d: compact_dq_state(spark, d),
        lambda d: read_dq_report(spark, d),
        "hour timestamp, n_events long, n_errors long, n_outliers long, "
        "n_null_user long, error_share double, error_alert boolean",
    )
