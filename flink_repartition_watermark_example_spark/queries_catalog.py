"""Standard-catalog query registrations (SURVEY §2.2 sweep): join
shapes, analytic window functions, grouping sets, set ops, as-of logic,
sliding and session windows.

Scale notes are per-query; the recurring theme is: pin broadcast ONLY
for genuinely bounded relations (nation/region, per-type aggregates),
leave SF-scaling tables (customer/part/supplier) to AQE's runtime
choice, shuffle only fact tables, and express rankings as bounded
per-partition window computations."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_repartition_watermark_example_spark.queries import dec_sum, register, register_extra
from flink_repartition_watermark_example_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


@register(
    "multi_join_revenue",
    """
    SELECT n.n_name AS nation,
           count(*) AS line_count,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5-style 5-way star join, canonical scale order: nation "
    "and region (genuinely bounded dims) broadcast onto customer and "
    "filter it to the target regions FIRST; orders equi-joins the "
    "reduced 2-column customer side on custkey; lineitem joins that "
    "2-column intermediate on orderkey.  customer/orders/lineitem all "
    "grow with the corpus, so none is force-broadcast — AQE promotes "
    "the reduced sides to broadcast when they measure small (sf0.1) "
    "and keeps shuffle joins when they don't (sf10+).  The sf1→sf10 "
    "sweep showed the earlier forced broadcast(customer) going 12.9× "
    "on 10× data (a 1.5M-row broadcast built per executor); this "
    "shape is the fix.",
)
def q_multi_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l, o = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    c, n, r = (
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "region"),
    )
    return _multi_join_revenue_plan(l, o, c, n, r)


def _multi_join_revenue_plan(l, o, c, n, r, broadcast_arms: bool = False) -> DataFrame:
    cust = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .where(F.col("r_name").isin("ASIA", "EUROPE"))
        .select("c_custkey", "n_name")
    )
    # broadcast_arms: the bucketed twin must keep the reduced customer
    # arm as the BUILD side (at toy SF AQE would broadcast the tiny
    # FACT side instead and discard its bucketing — the Q8 twin's
    # lesson); the plain plan leaves the pick to AQE because customer
    # grows with the corpus (forcing broadcast was the sf10-diagnosed
    # 12.9× blowup).
    if broadcast_arms:
        cust = F.broadcast(cust)
    oc = (
        o.join(cust, o.o_custkey == cust.c_custkey)
        .select("o_orderkey", "n_name")
    )
    # Shuffled HASH join built on the narrow reduced orders arm, raw
    # fact side probed (the Q8/Q7 discipline): the final aggregate has
    # only O(nations) groups, so map-side partial aggregation does all
    # the reduction AFTER the join for free, and nothing ever sorts or
    # pre-aggregates the fact side.  A/B vs the round-5 shape (orderkey
    # pre-agg + AQE-picked join): 2.98→1.99 s at sf1, 12.0→7.7 s at
    # sf10 (min-of-2, 8g) — the per-order 150M-group hash agg it
    # replaced was the same spilling near-unique-key term Q8 carried.
    # (The round-5 note that "AQE beat a pinned shuffle_hash" measured
    # the hint WITH the pre-agg retained — building the hash map on
    # the agg output; probing the raw fact against the O(orders)
    # build side was never in that A/B.)
    lf = l.select(
        "l_orderkey",
        (
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
        ).alias("rev"),
    )
    return (
        lf.join(oc.hint("shuffle_hash"), lf.l_orderkey == oc.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("line_count"),
            F.sum("rev").cast("double").alias("revenue"),
        )
    )


# The bucketed twin runs the IDENTICAL logical plan against bucketed
# copies of the fact tables, so it shares the primary's oracle.
from flink_repartition_watermark_example_spark.queries import QUERIES as _Q  # noqa: E402

_MJR_ORACLE = _Q["multi_join_revenue"].oracle


@register_extra(
    "multi_join_revenue_bucketed",
    _MJR_ORACLE,
    doc="The Q5-style join tree on BUCKETED fact tables — the storage "
    "layout that removes the one superlinear entry of the sf10→sf100 "
    "sweep (the orderkey exchange over 600M lineitem rows).  lineitem "
    "and orders are materialized once bucketBy(orderkey); the "
    "bucketed scans report HashPartitioning(orderkey, n), so when the "
    "bounded-dim-reduced customer side broadcasts onto orders, the "
    "orderkey hash join probes the RAW lineitem scan with NO exchange "
    "on either fact side (orders keeps its bucketing through the "
    "broadcast join; nothing sorts or pre-aggregates the fact side — "
    "the reduction happens in the post-join O(nations) partial agg).  "
    "Same logical plan, same oracle hash as multi_join_revenue; a "
    "plan test pins the absence of any orderkey exchange above the "
    "lineitem scan.",
)
def q_multi_join_revenue_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_repartition_watermark_example_spark.storage import (
        bucketed_table,
        suggest_buckets,
    )

    # one bucket count for BOTH sides (unequal counts reintroduce an
    # exchange), sized to the bigger table so each bucket's write sort
    # and read slice stay memory-bounded at any SF
    n = suggest_buckets(sf_dir, "lineitem")
    l = spark.table(bucketed_table(spark, sf_dir, "lineitem", ["l_orderkey"], n))
    o = spark.table(bucketed_table(spark, sf_dir, "orders", ["o_orderkey"], n))
    c, n, r = (
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "region"),
    )
    return _multi_join_revenue_plan(l, o, c, n, r, broadcast_arms=True)


@register(
    "semi_join_active_customers",
    """
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_totalprice > 100000)
    """,
    doc="Left-semi join (EXISTS): customers with a >100k order.",
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    big = o.where(F.col("o_totalprice") > 100000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "anti_join_dormant_customers",
    """
    SELECT c_custkey, c_acctbal FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_totalprice > 450000)
    """,
    doc="Left-anti join (NOT EXISTS): customers with no >450k order "
    "(every customer has *some* order in the test data, so the "
    "predicate keeps the result set non-degenerate).",
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    big = o.where(F.col("o_totalprice") > 450000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_acctbal"
    )


@register_extra(
    "rollup_revenue",
    """
    SELECT c.c_mktsegment AS mktsegment, o.o_orderstatus AS orderstatus,
           count(*) AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY ROLLUP (c.c_mktsegment, o.o_orderstatus)
    """,
    doc="ROLLUP grouping sets: segment × status, segment subtotals, "
    "grand total — one Expand + hash agg, no repeated scans.",
)
def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, c = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    # customer grows with the corpus — equi-join on custkey, AQE
    # decides the strategy per scale (broadcast only while small)
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("mktsegment"),
            F.col("o_orderstatus").alias("orderstatus"),
            "o_totalprice",
        )
        .rollup("mktsegment", "orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dec_sum("o_totalprice", "revenue"),
        )
    )


@register(
    "window_rank_orders",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC)
               AS rn,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY o_custkey) AS DOUBLE) AS cust_total
      FROM orders)
    WHERE rn <= 3
    """,
    doc="Analytic window functions (ranking + partitioned sum) — "
    "distinct from the streaming time-window grouping (SURVEY §2.2 "
    "warns not to conflate them).",
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    wsum = Window.partitionBy("o_custkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .over(wsum)
            .cast("double")
            .alias("cust_total"),
        )
        .where(F.col("rn") <= 3)
        .withColumn("rn", F.col("rn").cast("long"))
    )


@register_extra(
    "union_active_days",
    """
    SELECT CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS day FROM orders
    UNION
    SELECT CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP) AS day FROM lineitem
    """,
    doc="Set op: UNION DISTINCT of two date domains (emitted as "
    "midnight timestamps — DATE collects to python objects in Spark "
    "but datetime64 in DuckDB, which breaks value comparison).",
)
def q_union_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, l = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
    return (
        o.select(F.col("o_orderdate").cast("date").cast("timestamp").alias("day"))
        .union(l.select(F.col("l_shipdate").cast("date").cast("timestamp").alias("day")))
        .distinct()
    )


@register(
    "asof_last_view_before_purchase",
    """
    SELECT event_id, user_id, ts, last_view_ts FROM (
      SELECT event_id, user_id, ts, event_type,
             max(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_view_ts
      FROM events)
    WHERE event_type = 'purchase'
    """,
    doc="As-of join expressed scalably: latest prior 'view' per user "
    "for each purchase via a running-max window — one shuffle on "
    "user_id, no range cross-join.",
)
def q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            "ts",
            "event_type",
            F.max(F.when(F.col("event_type") == "view", F.col("ts"))).over(w).alias(
                "last_view_ts"
            ),
        )
        .where(F.col("event_type") == "purchase")
        .drop("event_type")
    )


@register(
    "sliding_window_counts",
    """
    SELECT ws AS window_start, ws + INTERVAL 1 HOUR AS window_end,
           event_type, count(*) AS aggregate
    FROM (
      SELECT event_type,
             unnest([time_bucket(INTERVAL '30 minutes', ts),
                     time_bucket(INTERVAL '30 minutes', ts) - INTERVAL 30 MINUTE])
               AS ws
      FROM events)
    GROUP BY 1, 2, 3
    """,
    doc="Sliding windows (1 h size, 30 min slide): each event lands in "
    "2 overlapping windows — Spark's window() with slideDuration.",
)
def q_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("aggregate"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "aggregate",
        )
    )


@register(
    "session_windows",
    """
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events),
    sessions AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked)
    SELECT user_id, min(ts) AS session_start, count(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
    doc="Session windows (30 min inactivity gap): Spark's native "
    "session_window grouping; oracle reconstructs sessions with the "
    "gaps-and-islands idiom.",
)
def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )


@register_extra(
    "cube_order_stats",
    """
    SELECT o_orderstatus AS orderstatus, o_orderpriority AS orderpriority,
           count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE grouping sets over two dimensions — all four grouping "
    "combinations in one Expand + hash agg.",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            F.col("o_orderstatus").alias("orderstatus"),
            F.col("o_orderpriority").alias("orderpriority"),
            "o_totalprice",
        )
        .cube("orderstatus", "orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dec_sum("o_totalprice", "revenue"))
    )


@register_extra(
    "intersect_ship_order_days",
    """
    SELECT CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP) AS day FROM lineitem
    INTERSECT
    SELECT CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS day FROM orders
    """,
    doc="Set op: INTERSECT of two date domains.",
)
def q_intersect_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, l = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
    return l.select(
        F.col("l_shipdate").cast("date").cast("timestamp").alias("day")
    ).intersect(
        o.select(F.col("o_orderdate").cast("date").cast("timestamp").alias("day"))
    )


@register_extra(
    "except_ship_only_days",
    """
    SELECT CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP) AS day FROM lineitem
    EXCEPT
    SELECT CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS day FROM orders
    """,
    doc="Set op: EXCEPT — ship days with no order placed.",
)
def q_except_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, l = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
    return l.select(
        F.col("l_shipdate").cast("date").cast("timestamp").alias("day")
    ).subtract(
        o.select(F.col("o_orderdate").cast("date").cast("timestamp").alias("day"))
    )


@register(
    "median_value_by_type",
    """
    SELECT event_type,
           median(value) AS median_value,
           quantile_cont(value, 0.9) AS p90_value
    FROM events GROUP BY event_type
    """,
    doc="Exact percentile aggregation (interpolated median/p90) — "
    "sort-based within groups; for sketch-based approximation at "
    "scale see approx_distinct_users_sketch.",
)
def q_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.median("value").alias("median_value"),
        F.percentile("value", F.lit(0.9)).alias("p90_value"),
    )


@register(
    "approx_distinct_users_sketch",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS sketch_within_5pct
    FROM events GROUP BY event_type
    """,
    doc="HyperLogLog sketch aggregation (hll_sketch_agg/hll_sketch_"
    "estimate): mergeable distinct-count sketches — the 100 TB path "
    "where exact distinct is a full shuffle. HLL estimates are engine-"
    "specific bits, so the oracle checks the error bound instead: the "
    "query emits |sketch − exact|/exact <= 5% alongside the exact "
    "count, and the oracle asserts TRUE (default lgConfigK=12 gives "
    "~1.6% rsd, so 5% is a real 3-sigma contract, not a tautology).",
)
def q_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("approx_users"),
            F.count_distinct(F.col("user_id")).alias("exact_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                / F.col("exact_users")
                <= 0.05
            ).alias("sketch_within_5pct"),
        )
    )


@register_extra(
    "approx_quantiles_sketch",
    """
    SELECT event_type, count(*) AS n_rows,
           TRUE AS p50_within_bounds,
           TRUE AS p90_within_bounds
    FROM events GROUP BY event_type
    """,
    doc="KLL/GK-style approximate quantiles (percentile_approx, "
    "accuracy 10000 → rank error ≤ 1e-4): the mergeable-sketch path "
    "for percentiles at 100 TB, where the exact sort-based percentile "
    "is a full shuffle + per-group sort. Like the HLL entry, sketch "
    "internals are engine-specific, so the query emits the error-bound "
    "CONTRACT: each approx quantile must lie between the exact "
    "interpolated percentiles at q∓0.01 — hundreds of ranks of slack "
    "vs the sketch's ≤1-rank guarantee at this row count, so a broken "
    "sketch fails and a correct one cannot flake.",
)
def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.percentile_approx(
            "value", F.array(F.lit(0.5), F.lit(0.9)), F.lit(10000)
        ).alias("ap"),
        F.percentile("value", F.lit(0.49)).alias("lo50"),
        F.percentile("value", F.lit(0.51)).alias("hi50"),
        F.percentile("value", F.lit(0.89)).alias("lo90"),
        F.percentile("value", F.lit(0.91)).alias("hi90"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return agg.select(
        "event_type",
        "n_rows",
        ((F.col("ap")[0] >= F.col("lo50")) & (F.col("ap")[0] <= F.col("hi50"))).alias(
            "p50_within_bounds"
        ),
        ((F.col("ap")[1] >= F.col("lo90")) & (F.col("ap")[1] <= F.col("hi90"))).alias(
            "p90_within_bounds"
        ),
    )


@register_extra(
    "cdc_apply_orders",
    """
    WITH base AS (SELECT o_orderkey, o_totalprice FROM orders),
    changes AS (
      SELECT o_orderkey, o_totalprice * 1.05 AS o_totalprice, 'U' AS op, 1 AS seq
      FROM base WHERE o_orderkey % 10 = 3
      UNION ALL
      SELECT o_orderkey, o_totalprice * 1.1, 'U', 2
      FROM base WHERE o_orderkey % 10 = 3
      UNION ALL
      SELECT o_orderkey, CAST(NULL AS DOUBLE), 'D', 1
      FROM base WHERE o_orderkey % 10 = 7
      UNION ALL
      SELECT o_orderkey + 100000000, o_totalprice, 'I', 1
      FROM base WHERE o_orderkey % 10 = 1
    ),
    latest AS (
      SELECT o_orderkey, o_totalprice, op FROM (
        SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                     ORDER BY seq DESC, op DESC) AS rn
        FROM changes
      ) WHERE rn = 1
    )
    SELECT b.o_orderkey, b.o_totalprice FROM base b
    WHERE NOT EXISTS (SELECT 1 FROM latest l
                      WHERE l.o_orderkey = b.o_orderkey)
    UNION ALL
    SELECT o_orderkey, o_totalprice FROM latest WHERE op <> 'D'
    """,
    doc="CDC / MERGE apply (operators/cdc.py): a deterministic "
    "changeset (two sequenced updates per key, deletes, inserts) "
    "applied to the orders snapshot — latest-seq-wins per key, "
    "deletes drop, inserts and updates materialize. The base table "
    "is never shuffled: latest-per-key shuffles only the changeset, "
    "and the untouched-rows anti-join broadcasts the changed keys.",
)
def q_cdc_apply_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_repartition_watermark_example_spark.operators.cdc import apply_changes

    base = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    key, price = F.col("o_orderkey"), F.col("o_totalprice")

    # Synthesize the whole changeset from ONE scan: each base row emits
    # its 0-2 change rows via a scan-side explode (empty array = no
    # change).  The earlier four-arm union scanned the 2-column orders
    # file once PER ARM — and apply_changes references the changeset
    # twice (latest-per-key feeds both the anti-join and the output
    # union), so the plan read orders 9x; this shape reads it 3x.
    def row(keyx, pricex, op, seq):
        return F.struct(
            keyx.alias("o_orderkey"),
            pricex.alias("o_totalprice"),
            F.lit(op).alias("op"),
            F.lit(seq).alias("seq"),
        )

    change_rows = (
        F.when(
            key % 10 == 3,
            F.array(row(key, price * 1.05, "U", 1), row(key, price * 1.1, "U", 2)),
        )
        .when(key % 10 == 7, F.array(row(key, F.lit(None).cast("double"), "D", 1)))
        .when(key % 10 == 1, F.array(row(key + 100000000, price, "I", 1)))
        .otherwise(
            F.array().cast(
                "array<struct<o_orderkey:bigint,o_totalprice:double,"
                "op:string,seq:int>>"
            )
        )
    )
    changes = base.select(F.explode(change_rows).alias("c")).select("c.*")
    return apply_changes(base, changes, ["o_orderkey"])


@register_extra(
    "value_histograms",
    """
    SELECT event_type, CAST(floor(value / 25.0) AS BIGINT) AS bin,
           count(*) AS n_rows
    FROM events GROUP BY event_type, CAST(floor(value / 25.0) AS BIGINT)
    """,
    doc="Equi-width histograms per key (floor-binning — the only "
    "cross-engine-safe quantizer for doubles): one partial+final hash "
    "agg, the profiling primitive behind NDV/selectivity estimation "
    "and data-quality dashboards.",
)
def q_value_histograms(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.floor(F.col("value") / 25.0).cast("long").alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


@register_extra(
    "value_outliers_by_type",
    """
    WITH q AS (SELECT event_type,
                      CAST(floor(value * 1000.0) AS BIGINT) AS vq
               FROM events),
    s AS (SELECT event_type, count(*) AS n,
                 CAST(sum(vq) AS BIGINT) AS s1,
                 CAST(sum(vq * vq) AS BIGINT) AS s2
          FROM q GROUP BY event_type)
    SELECT q.event_type,
           CAST(min(s.n) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN abs(
                 ((CAST(q.vq AS DOUBLE) / 1000.0)
                  - ((CAST(s.s1 AS DOUBLE) / 1000.0) / CAST(s.n AS DOUBLE)))
                 / sqrt(((CAST(s.s2 AS DOUBLE) / 1000000.0) / CAST(s.n AS DOUBLE))
                        - ((CAST(s.s1 AS DOUBLE) / 1000.0) / CAST(s.n AS DOUBLE))
                          * ((CAST(s.s1 AS DOUBLE) / 1000.0) / CAST(s.n AS DOUBLE)))
               ) > 3.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM q JOIN s ON s.event_type = q.event_type
    GROUP BY q.event_type
    """,
    doc="Per-key z-score outlier counts in two passes: quantized-"
    "integer moment sums (order-independent — the repo's float-"
    "determinism pattern) broadcast back onto the rows, then one "
    "codegen'd |z|>3 count. sqrt IS IEEE-correctly-rounded, so "
    "(unlike ln in BM25) it is cross-engine exact given identical "
    "inputs. The anomaly-detection primitive of a quality pipeline.",
)
def q_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    q = ev.select(
        "event_type", F.floor(F.col("value") * 1000.0).cast("long").alias("vq")
    )
    s = q.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vq").cast("long").alias("s1"),
        F.sum(F.col("vq") * F.col("vq")).cast("long").alias("s2"),
    )
    mean = (F.col("s1").cast("double") / 1000.0) / F.col("n").cast("double")
    var = (
        (F.col("s2").cast("double") / 1000000.0) / F.col("n").cast("double")
    ) - mean * mean
    z = ((F.col("vq").cast("double") / 1000.0) - mean) / F.sqrt(var)
    return (
        q.join(F.broadcast(s), "event_type")
        .groupBy("event_type")
        .agg(
            F.min("n").cast("long").alias("n_rows"),
            F.sum(F.when(F.abs(z) > 3.0, 1).otherwise(0))
            .cast("long")
            .alias("n_outliers"),
        )
    )


def _pagerank_oracle(n_iter: int = 10) -> str:
    from flink_repartition_watermark_example_spark.operators.graph import (
        PAGERANK_SCALE as S,
    )

    prs = [f"pr0 AS (SELECT v, CAST({S} // nn.n AS BIGINT) AS r FROM nodes CROSS JOIN nn)"]
    for i in range(n_iter):
        prs.append(f"""
    pr{i + 1} AS (
      SELECT n.v,
             CAST((CAST(3 AS BIGINT) * {S}) // (20 * nn.n)
                  + (17 * coalesce(s.c, 0)) // 20 AS BIGINT) AS r
      FROM nodes n CROSS JOIN nn
      LEFT JOIN (SELECT e.dst AS v,
                        CAST(sum((p.r * e.w) // e.wout) AS BIGINT) AS c
                 FROM pr{i} p JOIN e ON e.src = p.v GROUP BY e.dst) s
        USING (v)
    )""")
    return f"""
    WITH seq AS (
      SELECT event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events),
    edges AS (SELECT prev AS src, event_type AS dst, count(*) AS w
              FROM seq WHERE prev IS NOT NULL GROUP BY prev, event_type),
    wout AS (SELECT src, CAST(sum(w) AS BIGINT) AS wout
             FROM edges GROUP BY src),
    e AS (SELECT edges.src, edges.dst, CAST(edges.w AS BIGINT) AS w, wout.wout
          FROM edges JOIN wout USING (src)),
    nodes AS (SELECT DISTINCT event_type AS v FROM events),
    nn AS (SELECT count(*) AS n FROM nodes),
    {', '.join(prs)}
    SELECT v AS event_type, r AS rank_q FROM pr{n_iter}
    """


@register_extra(
    "pagerank_event_transitions",
    _pagerank_oracle(),
    doc="Fixed-point weighted PageRank (operators/graph.py) over the "
    "per-user event-type transition graph (LAG-derived consecutive "
    "pairs, counts as weights). Integer micro-unit ranks and a 17/20 "
    "damping rational make every update exact and order-independent, "
    "so 10 synchronous iterations hash-match the oracle's unrolled "
    "recursive CTEs bit for bit — float PageRank cannot be compared "
    "this way. Second genuinely iterative operator after connected "
    "components; same per-iteration join+agg shape at web scale.",
)
def q_pagerank_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from flink_repartition_watermark_example_spark.operators.graph import pagerank

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    )
    edges = (
        seq.where(F.col("prev").isNotNull())
        .groupBy(F.col("prev").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    nodes = ev.select(F.col("event_type").alias("v")).distinct()
    pr = pagerank(nodes, edges)
    return pr.select(F.col("v").alias("event_type"), "rank_q")


@register_extra(
    "fuzzy_name_pairs",
    f"""
    WITH blks AS (
      SELECT c_custkey, c_name, w.wid,
             CASE WHEN w.wid = 0 THEN right(c_name, 4)
                  ELSE substr(right(c_name, 9), 1, 5) END AS wval
      FROM customer CROSS JOIN range(0, 2) w(wid)
    ),
    capped AS (
      SELECT c_custkey, c_name, wid, wval FROM (
        SELECT *, count(*) OVER (PARTITION BY wid, wval) AS bsz FROM blks
      ) WHERE bsz <= {64}
    )
    SELECT DISTINCT a.c_custkey AS key_a, bb.c_custkey AS key_b,
           CAST(levenshtein(a.c_name, bb.c_name) AS BIGINT) AS edit_dist
    FROM capped a JOIN capped bb
      ON a.wid = bb.wid AND a.wval = bb.wval AND a.c_custkey < bb.c_custkey
    WHERE levenshtein(a.c_name, bb.c_name) <= 1
    """,
    doc="Record linkage / entity resolution: near-identical customer "
    "names by edit distance, candidates from TWO disjoint "
    "high-entropy suffix windows (last 4 chars; the 5 before them) — "
    "a single substitution damages at most one window, so any "
    "same-length distance-1 pair agrees on the other (lossless "
    "blocking for the fixed-format regime). The original 14-char "
    "PREFIX block was degenerate on zero-padded keys: at sf0.1 one "
    "block held 10k names (50M candidate pairs) because the prefix "
    "carries no entropy — blocking keys must come from the varying "
    "region. A bucket cap (64, mirrored in the oracle) guards "
    "residual degenerate distributions, same discipline as the "
    "LSH/simhash paths.",
)
def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.posexplode(
            F.array(
                F.expr("right(c_name, 4)"),
                F.expr("substring(right(c_name, 9), 1, 5)"),
            )
        ).alias("wid", "wval"),
    )
    bucket = Window.partitionBy("wid", "wval")
    cust = (
        cust.withColumn("__bsz", F.count(F.lit(1)).over(bucket))
        .where(F.col("__bsz") <= 64)
        .drop("__bsz")
    )
    a, b = cust.alias("a"), cust.alias("b")
    lev = F.levenshtein(F.col("a.c_name"), F.col("b.c_name"))
    return (
        a.join(
            b,
            (F.col("a.wid") == F.col("b.wid"))
            & (F.col("a.wval") == F.col("b.wval"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .where(lev <= 1)
        .select(
            F.col("a.c_custkey").alias("key_a"),
            F.col("b.c_custkey").alias("key_b"),
            lev.cast("long").alias("edit_dist"),
        )
        .distinct()
    )


@register_extra(
    "mad_value_by_type",
    """
    WITH m AS (SELECT event_type, median(value) AS med FROM events
               GROUP BY event_type)
    SELECT e.event_type, count(*) AS n_rows,
           median(abs(e.value - m.med)) AS mad
    FROM events e JOIN m USING (event_type)
    GROUP BY e.event_type
    """,
    doc="Median absolute deviation per key via a grouped-aggregate "
    "Pandas UDAF — the UDAF extension point (SURVEY §2.2's "
    "pandas_udf grouped-agg mapping of the reference's fold "
    "WindowAggregate.scala:22-31) carrying a real robust statistic "
    "Spark has no builtin for. Arrow-batched, one value out per "
    "group; exactly oracle-comparable because medians are "
    "selection-based (order-free), not summation-based. At scale the "
    "group's values must fit one executor — the documented contract "
    "of any exact-quantile UDAF; the sketch path "
    "(approx_quantiles_sketch) is the unbounded-cardinality "
    "alternative.",
)
def q_mad_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    # module-level `pd` + real (non-stringified) hints: pandas_udf
    # resolves the grouped-agg signature via typing.get_type_hints,
    # which must see an importable pandas symbol despite this module's
    # `from __future__ import annotations`.
    from pyspark.sql.functions import pandas_udf

    def mad_fn(v):
        med = v.median()
        return float((v - med).abs().median())

    mad_fn.__annotations__ = {"v": pd.Series, "return": float}
    mad = pandas_udf(mad_fn, "double")

    ev = _t(spark, sf_dir, "events")
    # a grouped-agg pandas UDF cannot share an agg() with JVM
    # aggregates (INVALID_PANDAS_UDF_PLACEMENT) — two aggregations
    # over the same shuffle, joined on the (few-row) group keys.
    mads = ev.groupBy("event_type").agg(mad("value").alias("mad"))
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_rows"))
    return counts.join(F.broadcast(mads), "event_type").select(
        "event_type", "n_rows", "mad"
    )


@register(
    "orders_above_cust_avg",
    """
    WITH t AS (
      SELECT o_orderkey, o_custkey, o_totalprice,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY o_custkey) AS DOUBLE)
               / count(*) OVER (PARTITION BY o_custkey) AS cust_avg
      FROM orders
    )
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM t WHERE o_totalprice > 1.5 * cust_avg
    """,
    doc="Correlated-scalar-subquery semantics (orders 1.5x above their "
    "customer's average) decorrelated into one window pass — a single "
    "hash shuffle on the correlation key instead of a per-row subquery; "
    "the exact-decimal average is engine-order-independent.",
)
def q_orders_above_cust_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    cust_avg = (
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice", cust_avg.alias("cust_avg"))
        .where(F.col("o_totalprice") > 1.5 * F.col("cust_avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register_extra(
    "pivot_revenue_by_priority",
    """
    SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS urgent,
           CAST(sum(CASE WHEN o_orderpriority = '2-HIGH'
                    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS high,
           CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM'
                    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS medium,
           CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
                    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS not_specified,
           CAST(sum(CASE WHEN o_orderpriority = '5-LOW'
                    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS low
    FROM orders
    GROUP BY 1
    """,
    doc="Pivot (long->wide): revenue per year x order priority with an "
    "explicit pivot-value list, so the plan is one pass with no "
    "distinct-values pre-query and a fixed output schema.",
)
def q_pivot_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    priorities = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    renames = ["urgent", "high", "medium", "not_specified", "low"]
    wide = (
        o.groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .pivot("o_orderpriority", priorities)
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"))
    )
    return wide.select(
        "order_year", *[F.col(f"`{p}`").alias(r) for p, r in zip(priorities, renames)]
    )


@register_extra(
    "range_join_view_to_purchase",
    """
    SELECT a.event_id AS view_id, b.event_id AS purchase_id, a.user_id
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 6 HOUR
     AND a.event_type = 'view' AND b.event_type = 'purchase'
    """,
    doc="Time-range self-join (purchase within 6 hours of a view by "
    "the same user) executed as an equi-join on (user_id, 6-hour "
    "bucket): the purchase side probes its own bucket and the previous "
    "one, so candidates are bounded per bucket and the inequality is a "
    "residual filter - never a cross product, unlike a naive theta-join.",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    bucket_len = 21600  # seconds == the join range, so 2 probes suffice
    views = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("view_ts"),
        (F.unix_timestamp("ts") / bucket_len).cast("long").alias("bucket"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.explode(
            F.array(
                (F.unix_timestamp("ts") / bucket_len).cast("long"),
                (F.unix_timestamp("ts") / bucket_len).cast("long") - 1,
            )
        ).alias("p_bucket"),
    )
    return (
        views.join(
            purchases,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("bucket") == F.col("p_bucket")),
        )
        .where(
            (F.col("purchase_ts") > F.col("view_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("view_ts") + F.expr("INTERVAL 6 HOURS")
            )
        )
        .select("view_id", "purchase_id", "user_id")
    )


@register(
    "left_join_order_counts",
    """
    SELECT c.c_custkey, c.c_mktsegment,
           count(o.o_orderkey) AS n_orders,
           CAST(coalesce(sum(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE)
             AS total_spent
    FROM customer c
    LEFT JOIN orders o
      ON o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
    GROUP BY c.c_custkey, c.c_mktsegment
    """,
    doc="Left outer join with a pushed-into-ON predicate: every "
    "customer survives, finished-order metrics are null-padded and "
    "count(col) skips the nulls. The filter lives in the join "
    "condition, not WHERE, so it cannot collapse the outer join to "
    "inner — the classic outer-join-correctness trap.",
)
def q_left_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    finished = o.where(F.col("o_orderstatus") == "F")
    return (
        c.join(finished, c.c_custkey == finished.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")), F.lit(0)
            )
            .cast("double")
            .alias("total_spent"),
        )
    )


@register(
    "full_outer_daily_activity",
    """
    WITH v AS (
      SELECT user_id, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
             count(*) AS views
      FROM events WHERE event_type = 'view' GROUP BY 1, 2
    ),
    p AS (
      SELECT user_id, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
             count(*) AS purchases
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT coalesce(v.user_id, p.user_id) AS user_id,
           coalesce(v.day, p.day) AS day,
           coalesce(v.views, 0) AS views,
           coalesce(p.purchases, 0) AS purchases
    FROM v FULL OUTER JOIN p ON v.user_id = p.user_id AND v.day = p.day
    """,
    doc="Full outer join of two pre-aggregated activity streams on a "
    "composite key, coalesced to a dense daily matrix. Both sides "
    "aggregate BEFORE the join, so the shuffle carries one row per "
    "(user, day) instead of one per event, and the join keys inherit "
    "the aggregation partitioning — no extra exchange.",
)
def q_full_outer_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # DATE collects to python objects in Spark; midnight TIMESTAMP
    # round-trips through Arrow identically on both engines.
    day = F.col("ts").cast("date").cast("timestamp").alias("day")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", day)
        .agg(F.count(F.lit(1)).alias("views"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("p_user_id"), day)
        .agg(F.count(F.lit(1)).alias("purchases"))
        .withColumnRenamed("day", "p_day")
    )
    return (
        v.join(
            p,
            (v.user_id == p.p_user_id) & (v.day == p.p_day),
            "full_outer",
        )
        .select(
            F.coalesce("user_id", "p_user_id").alias("user_id"),
            F.coalesce("day", "p_day").alias("day"),
            F.coalesce("views", F.lit(0)).alias("views"),
            F.coalesce("purchases", F.lit(0)).alias("purchases"),
        )
    )


@register(
    "grouping_sets_revenue",
    """
    SELECT c.c_mktsegment AS mktsegment,
           CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
           count(*) AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY GROUPING SETS ((c.c_mktsegment), (year(o.o_orderdate)), ())
    """,
    doc="Explicit GROUPING SETS (segment-only, year-only, grand total) "
    "— unlike ROLLUP/CUBE the sets are hand-picked, and Spark still "
    "plans it as a single Expand + one hash aggregation: one scan, one "
    "shuffle, 3x expanded rows instead of 3 separate queries.",
)
def q_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    o, c = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    # customer grows with the corpus — no forced broadcast (AQE picks)
    j = o.join(c, o.o_custkey == c.c_custkey)
    # Session-global temp views collide across concurrent callers
    # sharing the SparkSession — use a unique name per invocation.
    view = "gs_rev_input_" + uuid.uuid4().hex[:8]
    j.createOrReplaceTempView(view)
    # GROUPING SETS via Spark SQL: same Catalyst Expand + single hash
    # aggregation as ROLLUP/CUBE, with hand-picked sets.  spark.sql
    # resolves the plan eagerly, so the view can be dropped before the
    # DataFrame executes — no catalog entry leaks per invocation.
    try:
        return spark.sql(
            f"""
            SELECT c_mktsegment AS mktsegment,
                   CAST(year(o_orderdate) AS BIGINT) AS order_year,
                   count(*) AS n_orders,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM {view}
            GROUP BY GROUPING SETS ((c_mktsegment), (year(o_orderdate)), ())
            """
        )
    finally:
        spark.catalog.dropTempView(view)


@register(
    "running_revenue_frame",
    """
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_spent,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
               ) AS DOUBLE)
             / count(*) OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
               ) AS trailing3_avg
    FROM orders
    """,
    doc="Analytic window FRAMES (running total + trailing-3 moving "
    "average) — ROWS frames with a unique tiebreaker (o_orderkey) so "
    "the result is deterministic under any partition order. One sort "
    "per customer partition serves both frames; no self-join "
    "formulation, no O(n^2) work.",
)
def q_running_revenue_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(price)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_spent"),
        # Exact decimal sum over the frame, one cast to double, then an
        # identical double division on both engines — avg() directly
        # would round at decimal(22,6) and diverge from the oracle in
        # the last ulp.
        (
            F.sum(price)
            .over(w.rowsBetween(-2, Window.currentRow))
            .cast("double")
            / F.count(F.lit(1)).over(w.rowsBetween(-2, Window.currentRow))
        ).alias("trailing3_avg"),
    )


@register_extra(
    "lag_order_gaps",
    """
    WITH g AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             lag(o_orderdate) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS prev_date
      FROM orders
    )
    SELECT o_custkey, o_orderkey,
           CAST(datediff('day', prev_date, o_orderdate) AS BIGINT) AS gap_days
    FROM g WHERE prev_date IS NOT NULL
    """,
    doc="LAG over a per-customer event sequence (days between "
    "consecutive orders). The unique o_orderkey tiebreaker makes lag "
    "deterministic; the single window sort is the only shuffle.",
)
def q_lag_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.lag("o_orderdate").over(w).alias("prev_date"),
        )
        .where(F.col("prev_date").isNotNull())
        .select(
            "o_custkey",
            "o_orderkey",
            F.datediff("o_orderdate", "prev_date").cast("long").alias("gap_days"),
        )
    )


@register_extra(
    "ntile_price_quartiles",
    """
    WITH t AS (
      SELECT o_totalprice,
             ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
      FROM orders
    )
    SELECT quartile, count(*) AS n,
           CAST(min(o_totalprice) AS DOUBLE) AS lo,
           CAST(max(o_totalprice) AS DOUBLE) AS hi
    FROM t GROUP BY quartile
    """,
    doc="NTILE bucketing into price quartiles then per-bucket stats. "
    "The global ORDER BY window is a single-partition sort — fine for "
    "a bounded result, and the unique tiebreaker keeps bucket edges "
    "deterministic; at 100 TB the same result comes from "
    "approx-percentile cutpoints + a distributed bucket join, which "
    "median_value_by_type/approx sketches cover.",
)
def q_ntile_price_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select("o_totalprice", F.ntile(4).over(w).alias("quartile"))
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").cast("double").alias("lo"),
            F.max("o_totalprice").cast("double").alias("hi"),
        )
    )


@register(
    "string_funcs_customer_ids",
    """
    SELECT c_custkey,
           CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT) AS name_num,
           upper(c_mktsegment) AS seg_upper,
           CAST(length(c_name) AS BIGINT) AS name_len,
           substring(c_name, 1, 8) AS name_prefix,
           concat(c_mktsegment, '#', CAST(c_custkey AS VARCHAR)) AS seg_tag
    FROM customer
    """,
    doc="Scalar string-function sweep (regexp_extract, upper, length, "
    "substring, concat) — all JVM-side Catalyst expressions inside one "
    "whole-stage-codegen projection over the scan; zero shuffles, zero "
    "Python.",
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)$", 1).cast("long").alias("name_num"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.length("c_name").cast("long").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("#", "c_mktsegment", F.col("c_custkey").cast("string")).alias(
            "seg_tag"
        ),
    )


# Rotated to extras in round 12 (gate slot went to
# split_by_cluster_balanced — policy rule 4 for the CC + prefix-sum
# families): the decorrelation family keeps three gate members
# (orders_above_cust_avg, waiting_suppliers, nation_market_share), and
# this stays oracle-checked in pytest + benched via BENCH_EXTRAS.
@register_extra(
    "promo_revenue_share",
    """
    SELECT CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
           100.00 * CAST(sum(CASE WHEN p.p_type LIKE 'PROMO%'
                 THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * CAST(1 - l.l_discount AS DECIMAL(18,2))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1
    """,
    doc="TPC-H Q14-style conditional-aggregate ratio (promo revenue "
    "share per ship year): part grows with SF, so the join is a plain "
    "partkey equi-join — AQE broadcasts it while it measures small "
    "and co-partitions both sides on partkey once it doesn't; both "
    "sums stay exact decimal until a single cast each, then one "
    "double division — oracle-deterministic under any row order.",
)
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l, p = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
    p = p.select("p_partkey", "p_type")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(18,2)")
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy(F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(
            (
                F.lit(100.00) * F.sum(promo).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_pct")
        )
    )


@register(
    "top_suppliers_by_nation",
    """
    WITH s_rev AS (
      SELECT l.l_suppkey,
             CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
      FROM lineitem l
      GROUP BY l.l_suppkey
    )
    SELECT n.n_name AS nation, s.s_name AS supplier, r.revenue,
           CAST(row_number() OVER (PARTITION BY n.n_name
                              ORDER BY r.revenue DESC, s.s_suppkey ASC)
                AS BIGINT) AS rk
    FROM s_rev r
    JOIN supplier s ON r.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    QUALIFY rk <= 3
    """,
    doc="Top-3 suppliers by revenue within each nation: lineitem "
    "pre-aggregates to one row per supplier BEFORE joining (the "
    "aggregate-below-join rewrite — the join input shrinks from "
    "O(lineitem) to O(suppliers)), dimensions broadcast, and the "
    "per-nation ranking runs on the tiny aggregated set.",
)
def q_top_suppliers_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    s, n = _t(spark, sf_dir, "supplier"), _t(spark, sf_dir, "nation")
    rev = (
        l.groupBy("l_suppkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
            )
            .cast("double")
            .alias("revenue")
        )
    )
    w = Window.partitionBy("nation").orderBy(
        F.col("revenue").desc(), F.col("s_suppkey").asc()
    )
    return (
        # supplier scales with SF and the left side is already
        # O(suppliers) after the aggregate-below-join rewrite — plain
        # supkey equi-join (AQE broadcasts while small); nation is a
        # genuinely bounded dim and stays pinned.
        rev.join(s, rev.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("s_name").alias("supplier"),
            "revenue",
            "s_suppkey",
        )
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 3)
        .select("nation", "supplier", "revenue", "rk")
    )


# --- SCD Type-2 history build ---------------------------------------------


@register_extra(
    "scd2_user_state_history",
    """
    WITH ordered AS (
        SELECT user_id, event_type, ts,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    changes AS (
        SELECT user_id, event_type AS state, ts AS valid_from
        FROM ordered
        WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, state, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, state) AS valid_to,
           lead(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, state) IS NULL AS is_current
    FROM changes
    """,
    doc="Slowly-changing-dimension type-2 build: collapse each user's "
    "event stream into state-change validity intervals "
    "[valid_from, valid_to) with an is_current flag — the warehouse "
    "twin of the CDC apply (cdc_apply_orders keeps latest-wins "
    "current state; this keeps full history).  One hash shuffle on "
    "user_id serves both window passes — Catalyst reuses the "
    "partitioning, so scale cost is a single sort per key group.",
)
def q_scd2_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_chg = Window.partitionBy("user_id").orderBy("valid_from", "state")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w_ord))
        .where(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
        .select("user_id", F.col("event_type").alias("state"), F.col("ts").alias("valid_from"))
    )
    valid_to = F.lead("valid_from").over(w_chg)
    return changes.select(
        "user_id",
        "state",
        "valid_from",
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


# --- explicit skew-join salting -------------------------------------------


@register_extra(
    "salted_join_above_type_avg",
    """
    WITH stats AS (
        SELECT event_type,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)
                 AS avg_v
        FROM events GROUP BY event_type
    )
    SELECT e.event_type, count(*) AS n_above
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE CAST(e.value AS DOUBLE) > s.avg_v
    GROUP BY e.event_type
    """,
    doc="Events above their type's average value, joined through "
    "scale.salted_join: the per-type stats side is replicated 16x and "
    "fact rows are salted by pmod(hash(event_id), 16), so the join "
    "executes on (event_type, salt) and a 90%%-hot type spreads over "
    "16 tasks instead of one straggler.  This is the pre-salting "
    "complement to AQE's skew-join splitting (which only fires for "
    "oversized sort-merge partitions after the fact): the plan-level "
    "guarantee for KNOWN skew, like salted_agg for aggregations and "
    "salted_windowed_count_stream for streaming state.  The salt is "
    "deterministic, so the result hash-matches the plain-join oracle "
    "exactly.",
)
def q_salted_join_above_type_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_repartition_watermark_example_spark.scale import salted_join

    ev = _t(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        (dec_sum("value", "_s") / F.count(F.lit(1))).alias("avg_v")
    )
    joined = salted_join(ev, stats, "event_type", spread_col="event_id")
    return (
        joined.where(F.col("value").cast("double") > F.col("avg_v"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_above"))
    )


@register_extra(
    "unpivot_flag_measures",
    """
    WITH wide AS (
      SELECT l_returnflag,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price,
             CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_disc
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, measure, value
    FROM wide
    UNPIVOT (value FOR measure IN (sum_qty, sum_price, sum_disc))
    """,
    doc="Wide-to-long melt (the inverse of pivot, SURVEY sweep "
    "surface): per-returnflag measure sums unpivoted to (flag, "
    "measure, value) rows via DataFrame.unpivot — Catalyst Expand, "
    "one pass, no join.  The melt happens on the already-aggregated "
    "O(flags) relation, so the scan+agg dominates and the unpivot "
    "is free at any scale.  Sums follow the exact-decimal-then-one-"
    "cast discipline so the melted doubles hash-match.",
)
def q_unpivot_flag_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            dec_sum("l_quantity", "sum_qty"),
            dec_sum("l_extendedprice", "sum_price"),
            dec_sum("l_discount", "sum_disc"),
        )
    )
    return wide.unpivot(
        ["l_returnflag"],
        ["sum_qty", "sum_price", "sum_disc"],
        "measure",
        "value",
    )


@register_extra(
    "gapfill_hourly_counts",
    """
    WITH c AS (
      SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    b AS (SELECT event_type, min(h) AS h0, max(h) AS h1 FROM c GROUP BY event_type),
    grid AS (
      SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      FROM b
    )
    SELECT g.event_type, g.h AS window_start,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
    FROM grid g LEFT JOIN c ON c.event_type = g.event_type AND c.h = g.h
    """,
    doc="Time-series gap filling: the full hourly grid per event_type "
    "between each key's first and last hour, zero-filled where no "
    "events landed — the reference's windowed counts only EMIT "
    "non-empty windows (README.md:49-58 shows present hours only); "
    "dashboards and downstream diffs need the dense series.  Scale "
    "shape: counts aggregate FIRST (output O(types x hours), partial "
    "aggs do the reduction), the generated grid is tiny, and the "
    "left join runs on the two small aggregates — the raw corpus is "
    "scanned exactly once and never joined.",
)
def q_gapfill_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    c = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    b = c.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = b.select(
        "event_type",
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h"),
    )
    return grid.join(c, ["event_type", "h"], "left").select(
        "event_type",
        F.col("h").alias("window_start"),
        F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
    )


@register_extra(
    "locf_filled_values",
    """
    WITH m AS (
      SELECT event_type, ts, event_id,
             CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
      FROM events
    ),
    f AS (
      SELECT event_type,
             last_value(v IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv
      FROM m
    )
    SELECT event_type,
           count(*) AS n_rows,
           count(fv) AS n_present,
           CAST(sum(CAST(fv AS DECIMAL(18,2))) AS DOUBLE) AS sum_filled
    FROM f GROUP BY event_type
    """,
    doc="Last-observation-carried-forward interpolation (every 5th "
    "event's value deterministically masked to NULL, then filled from "
    "the latest earlier value of the same event_type).  The ORACLE is "
    "the textbook single window per key — which at 100 TB would "
    "funnel each of the handful of event_types through one task (the "
    "sequence-packing lesson).  The Spark plan is the DISTRIBUTED "
    "form, segmented carry: (1) LOCF within (event_type, day) "
    "partitions — thousands of parallel windows; (2) one tiny window "
    "over each key's per-day last-known values (O(days) rows per "
    "key) computes the carry-in each day inherits; (3) leading NULLs "
    "of each day coalesce to the carry-in.  Exact value copies, no "
    "arithmetic, so segmented == global bit-for-bit and the oracle "
    "hash proves the sharding correct.  Output aggregated per key "
    "with the exact-decimal sum convention.",
)
def q_locf_filled_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    m = ev.select(
        "event_type",
        "ts",
        "event_id",
        F.when(F.col("event_id") % 5 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("v"),
        F.date_trunc("day", "ts").alias("day"),
    )
    # (1) within-day LOCF at (event_type, day) parallelism
    w_day = (
        Window.partitionBy("event_type", "day")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    f = m.withColumn("fv_day", F.last("v", ignorenulls=True).over(w_day))
    # (2) per-(key, day) last-known value, then the carry-in each day
    # inherits from all earlier days — O(days) rows per key
    daily = m.groupBy("event_type", "day").agg(
        F.expr(
            "max_by(v, struct(ts, event_id)) FILTER (WHERE v IS NOT NULL)"
        ).alias("dlast")
    )
    w_carry = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = daily.withColumn(
        "carry_in", F.last("dlast", ignorenulls=True).over(w_carry)
    ).select("event_type", "day", "carry_in")
    # (3) leading NULLs of a day take the carry-in
    filled = (
        f.join(carry, ["event_type", "day"])
        .select(
            "event_type",
            F.coalesce("fv_day", "carry_in").alias("fv"),
        )
    )
    return filled.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("fv").alias("n_present"),
        F.sum(F.col("fv").cast("decimal(18,2)")).cast("double").alias("sum_filled"),
    )


@register_extra(
    "funnel_conversion_cohorts",
    """
    WITH s AS (
      SELECT user_id, min(ts) AS first_signup
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS first_purchase
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= s.first_signup
      GROUP BY e.user_id
    )
    SELECT date_trunc('day', s.first_signup) AS cohort_day,
           count(*) AS n_signups,
           count(p.user_id) AS n_converted,
           count(CASE WHEN p.first_purchase
                        < s.first_signup + INTERVAL 3 DAY THEN 1 END)
             AS n_converted_3d
    FROM s LEFT JOIN p ON s.user_id = p.user_id
    GROUP BY date_trunc('day', s.first_signup)
    """,
    doc="Ordered-sequence funnel: per signup cohort day, how many "
    "users later purchased (ever, and within 3 days of their FIRST "
    "signup — the ordering constraint is what makes it a funnel, not "
    "two independent counts).  Scale shape: two min-aggregations and "
    "one join, all keyed user_id, so one hash partitioning serves "
    "every stage; the purchase scan prunes to one event_type at the "
    "parquet reader.  No window functions, no per-user state beyond "
    "the partial-agg min.",
)
def q_funnel_conversion_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    s = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_signup"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .where(F.col("ts") >= F.col("first_signup"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    return (
        s.join(p, "user_id", "left")
        .groupBy(F.date_trunc("day", "first_signup").alias("cohort_day"))
        .agg(
            F.count(F.lit(1)).alias("n_signups"),
            F.count("first_purchase").alias("n_converted"),
            F.count(
                F.when(
                    F.col("first_purchase")
                    < F.col("first_signup") + F.expr("interval 3 days"),
                    1,
                )
            ).alias("n_converted_3d"),
        )
    )


@register_extra(
    "weekly_retention_cohorts",
    """
    WITH uw AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
    ),
    f AS (SELECT user_id, min(wk) AS w0 FROM uw GROUP BY user_id)
    SELECT f.w0 AS cohort_week,
           CAST(date_diff('day', f.w0, uw.wk) // 7 AS BIGINT) AS week_offset,
           count(*) AS n_active_users
    FROM uw JOIN f ON uw.user_id = f.user_id
    GROUP BY f.w0, CAST(date_diff('day', f.w0, uw.wk) // 7 AS BIGINT)
    """,
    doc="Cohort retention triangle: users bucketed by their first "
    "active ISO week, counted in every later week they return — the "
    "standard growth-analytics table.  Week offsets are computed as "
    "day-difference // 7 over week-TRUNCATED stamps in both engines "
    "(exact integers; engine-specific 'week diff' semantics never "
    "enter).  Scale shape: distinct (user, week) first — partial aggs "
    "collapse each user's events per week before any exchange — then "
    "a min-agg and a join both keyed user_id, and a final small "
    "rollup keyed (cohort, offset).",
)
def q_weekly_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).dropDuplicates()
    f = uw.groupBy("user_id").agg(F.min("wk").alias("w0"))
    return (
        uw.join(f, "user_id")
        .select(
            F.col("w0").alias("cohort_week"),
            (F.datediff(F.col("wk"), F.col("w0")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


ANOM_WIN = 24  # trailing hours in the baseline window
ANOM_MIN_N = 12  # require at least half a day of history
ANOM_Z = 2.0  # |z| threshold
_ZQ = 1000000.0  # z-score quantum: floor(z * 1e6)


@register_extra(
    "rolling_anomaly_hours",
    f"""
    WITH c AS (
      SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    w AS (
      SELECT event_type, h, n,
             sum(n)   OVER tw AS s,
             sum(n*n) OVER tw AS sq,
             count(*) OVER tw AS m
      FROM c
      WINDOW tw AS (PARTITION BY event_type ORDER BY h
                    ROWS BETWEEN {ANOM_WIN} PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, h AS window_start, CAST(n AS BIGINT) AS n_events,
           CAST(floor({_ZQ} *
             (CAST(n AS DOUBLE) - CAST(s AS DOUBLE) / CAST(m AS DOUBLE))
             / sqrt(CAST(sq AS DOUBLE) / CAST(m AS DOUBLE)
                    - (CAST(s AS DOUBLE) / CAST(m AS DOUBLE))
                      * (CAST(s AS DOUBLE) / CAST(m AS DOUBLE)))
           ) AS BIGINT) AS z_q
    FROM w
    WHERE m >= {ANOM_MIN_N}
      AND CAST(sq AS DOUBLE) / CAST(m AS DOUBLE)
          - (CAST(s AS DOUBLE) / CAST(m AS DOUBLE))
            * (CAST(s AS DOUBLE) / CAST(m AS DOUBLE)) > 0
      AND abs(CAST(n AS DOUBLE) - CAST(s AS DOUBLE) / CAST(m AS DOUBLE))
          > {ANOM_Z} * sqrt(CAST(sq AS DOUBLE) / CAST(m AS DOUBLE)
                            - (CAST(s AS DOUBLE) / CAST(m AS DOUBLE))
                              * (CAST(s AS DOUBLE) / CAST(m AS DOUBLE)))
    """,
    doc="Rolling z-score anomaly detection: hours whose event count "
    "deviates more than 2 sigma from the trailing-24-hour baseline "
    "of the same event_type — the monitoring query a pipeline runs "
    "over its own ingest rates.  Float discipline: the window "
    "carries EXACT integer sums (n, n^2, count), so the mean/"
    "variance doubles derive from identical integers on both "
    "engines through correctly-rounded ops only (+,-,*,/ and "
    "IEEE-exact sqrt — never ln), and the emitted z-score is "
    "floor-quantized.  Scale shape: the corpus collapses to "
    "O(types x hours) rows in ONE map-side-combined agg before any "
    "window; the trailing frame then runs partitioned by event_type "
    "(plan-audit-visible hash partitioning) over the tiny series.",
)
def q_rolling_anomaly_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    c = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    return rolling_zscore_anomalies(c)


def rolling_zscore_anomalies(counts: DataFrame) -> DataFrame:
    """Trailing-window z-score detector over an (event_type, h, n)
    hourly-count relation — shared verbatim by the batch query above
    and the streaming index (streaming/anomaly.py), so the
    stream==batch contract is the counts' additivity plus this one
    function, never two detector implementations drifting apart."""
    tw = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-ANOM_WIN, -1)
    )
    w = counts.select(
        "event_type",
        "h",
        "n",
        F.sum("n").over(tw).alias("s"),
        F.sum(F.col("n") * F.col("n")).over(tw).alias("sq"),
        F.count(F.lit(1)).over(tw).alias("m"),
    ).where(F.col("m") >= ANOM_MIN_N)
    mean = F.col("s").cast("double") / F.col("m").cast("double")
    var = F.col("sq").cast("double") / F.col("m").cast("double") - mean * mean
    # Operation order matches the oracle SQL exactly: the SQL's
    # `{_ZQ} * dev / sqrt(var)` parses left-associative as
    # `(_ZQ * dev) / sqrt(var)` — multiply FIRST, then divide — so the
    # quantized z lands on the same side of every integer boundary.
    zq = (F.lit(_ZQ) * (F.col("n").cast("double") - mean)) / F.sqrt(var)
    return (
        w.where(var > 0)
        .where(F.abs(F.col("n").cast("double") - mean) > F.lit(ANOM_Z) * F.sqrt(var))
        .select(
            "event_type",
            F.col("h").alias("window_start"),
            F.col("n").cast("long").alias("n_events"),
            F.floor(zq).cast("long").alias("z_q"),
        )
    )


PATH_TOPN = 20


@register_extra(
    "top_event_paths",
    f"""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type AS e1, e2, e3, CAST(count(*) AS BIGINT) AS n_paths
    FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY event_type, e2, e3
    ORDER BY n_paths DESC, e1 ASC, e2 ASC, e3 ASC
    LIMIT {PATH_TOPN}
    """,
    doc="Sequential-pattern mining: the top event-type trigrams over "
    "per-user ordered event streams — the path-analysis query behind "
    "funnels and next-action models.  Scale shape: ONE user_id hash "
    "exchange feeds a partitioned window whose two lead() offsets "
    "come from the same sort (no second exchange, no self-join — "
    "the naive 3-way self-join on (user, ts) would shuffle the "
    "corpus three times), then the trigram counts collapse map-side "
    "to O(|types|^3) rows and a single TakeOrdered picks the top "
    "20.  Deterministic tie-break on the full path.",
)
def q_top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        seq.where(F.col("e2").isNotNull() & F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).cast("long").alias("n_paths"))
        .orderBy(
            F.col("n_paths").desc(),
            F.col("e1").asc(),
            F.col("e2").asc(),
            F.col("e3").asc(),
        )
        .limit(PATH_TOPN)
    )


from flink_repartition_watermark_example_spark.queries import EXTRA_QUERIES as _XQ  # noqa: E402


@register(
    "streaming_anomaly_hours",
    _XQ["rolling_anomaly_hours"].oracle,
    doc="The incremental anomaly index (streaming/anomaly.py) run "
    "THROUGH Structured Streaming and value-checked against the "
    "batch oracle: events replay as three event_id-keyed file-"
    "batches (deliberately NOT time-ordered), each contributing an "
    "exact (event_type, hour, n) count delta via foreachBatch; the "
    "versions are compacted (counter sums are lossless) and the "
    "SHARED rolling_zscore_anomalies detector runs over the merged "
    "counts.  Counts are algebraic, so sum-of-deltas == one batch "
    "aggregation in ANY arrival order and the exact batch oracle "
    "applies — the strongest stream==batch contract in the "
    "package.",
)
def q_streaming_anomaly_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_repartition_watermark_example_spark.queries_sketches import _replay_through_sketch
    from flink_repartition_watermark_example_spark.streaming.anomaly import (
        compact_counts,
        hourly_count_writer,
        read_hourly_counts,
    )

    ev = _t(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    counts = _replay_through_sketch(
        spark,
        ev,
        lambda d: hourly_count_writer(d),
        lambda d: compact_counts(spark, d),
        lambda d: read_hourly_counts(spark, d),
        "event_type string, h timestamp, n bigint",
    )
    return rolling_zscore_anomalies(counts)
