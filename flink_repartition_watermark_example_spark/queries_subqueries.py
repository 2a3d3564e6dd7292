"""Correlated-subquery / decorrelation shapes (SURVEY §2.2 sweep,
TPC-H Q4/Q13/Q15/Q18/Q21/Q22 adaptations for this star schema — it
has no commitdate/receiptdate/phone/partsupp, so the "late" predicate
is l_shipdate > o_orderdate + N days and Q22's "no orders" becomes
"no recent orders").

The DESIGN POINT of this module: every oracle is written in the
correlated EXISTS / scalar-subquery form, while the Spark side is the
decorrelated aggregate/semi-join plan you would actually run at
100 TB — so the oracle gate proves each decorrelation correct, not
just each arithmetic.  Scale themes:

- EXISTS → left-semi join with the correlated predicate folded into
  the join condition (one orderkey shuffle, early-out per match);
- "sole offender" double-correlation (Q21) → two chained aggregations
  on the SAME key (orderkey), so the second reuses the first's
  partitioning — no second exchange;
- scalar aggregate thresholds (Q15/Q22) → O(1)-row aggregate joined
  back, broadcast by construction; the Q22 average is compared as
  ``bal * n > total`` in exact decimals, so no engine ever divides
  (cross-engine float division parity is unwinnable);
- count-of-counts (Q13) → aggregate orders FIRST, join customers
  after — the heavy shuffle carries O(customers) narrow rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_repartition_watermark_example_spark.queries import dec_sum, register, register_extra
from flink_repartition_watermark_example_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


_DEC = "decimal(18,2)"


@register_extra(
    "order_priority_late_exists",
    """
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    """,
    doc="TPC-H Q4 shape (ref has no joins at all — Main.scala:21-27 — "
    "this is north-star catalog surface): priority counts of orders "
    "with at least one line shipped >60 days after the order date.  "
    "Spark side decorrelates the EXISTS into a LEFT SEMI join whose "
    "condition carries the correlated date predicate; the date-range "
    "filter on orders is pushed to the scan, and the semi join "
    "shuffles only (orderkey, orderdate) against a 2-column lineitem "
    "projection — per-order early-out, no dedup stage.  The oracle "
    "stays in the EXISTS form, so the gate checks the decorrelation.",
)
def q_order_priority_late_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register_extra(
    "customer_order_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
          GROUP BY c.c_custkey) t
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: count-of-counts distribution of orders per "
    "customer.  Spark side aggregates orders per custkey FIRST (the "
    "only corpus-sized shuffle, map-side combined), then LEFT joins "
    "customer onto the narrow counts to pick up zero-order customers "
    "via coalesce(cnt, 0); the second aggregation groups on the tiny "
    "count domain.  Oracle keeps the join-then-double-group form.",
)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    ocnt = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt"))
    per_cust = c.join(ocnt, c.c_custkey == ocnt.o_custkey, "left").select(
        F.coalesce(F.col("cnt"), F.lit(0)).alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def _rev():
    return F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount")
    ).cast(_DEC)


@register_extra(
    "top_revenue_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(1 - l_discount AS DECIMAL(18,2))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_rev AS DOUBLE) AS total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
    """,
    doc="TPC-H Q15 shape: supplier(s) with the maximum quarterly "
    "revenue.  The scalar MAX subquery decorrelates to an O(1)-row "
    "aggregate equi-joined back onto the per-supplier revenue "
    "relation (value-equality join ⇒ BroadcastHashJoin, not a nested "
    "loop); revenue stays exact decimal until the final cast, so the "
    "max-equality predicate is engine-exact.  supplier grows with "
    "the corpus and joins the O(1)-row winners — AQE broadcasts the "
    "tiny side.",
)
def q_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = l.groupBy("l_suppkey").agg(F.sum(_rev()).alias("total_rev"))
    maxv = rev.agg(F.max("total_rev").alias("max_rev"))
    top = rev.join(F.broadcast(maxv), rev.total_rev == maxv.max_rev).select(
        "l_suppkey", "total_rev"
    )
    s = _t(spark, sf_dir, "supplier")
    return s.join(top, s.s_suppkey == top.l_suppkey).select(
        "s_suppkey",
        "s_name",
        F.col("total_rev").cast("double").alias("total_revenue"),
    )


@register_extra(
    "large_volume_customers",
    """
    SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(q.total_qty AS DOUBLE) AS total_qty
    FROM (SELECT l_orderkey,
                 sum(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300) q
    JOIN orders o   ON q.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    doc="TPC-H Q18 shape: orders whose total quantity exceeds 300 "
    "(~top 1%% of orders here), with their customers.  The IN-"
    "subquery-with-HAVING decorrelates to aggregate-below-join: "
    "lineitem collapses to one (orderkey, total_qty) row per order "
    "before ANY join, the HAVING filter drops ~99%% of them, and AQE "
    "broadcasts the surviving handful onto orders — the fact table "
    "is never shuffled by the join.  Quantities are integral, so the "
    "decimal sum and the >300 cut are engine-exact.",
)
def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    q = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("total_qty"))
        .where(F.col("total_qty") > 300)
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        q.join(o, q.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


@register(
    "waiting_suppliers",
    """
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s, lineitem l1, orders o
    WHERE s.s_suppkey = l1.l_suppkey
      AND o.o_orderkey = l1.l_orderkey
      AND o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY s.s_name
    """,
    doc="TPC-H Q21 shape — the hardest correlation in the suite: late "
    "lines (shipped >90 days after order date) of the SOLE late "
    "supplier in multi-supplier finalized orders.  The EXISTS + "
    "doubly-correlated NOT EXISTS (l3 correlates to both l1 AND o) "
    "decorrelates into two chained aggregations on the same key: "
    "per (orderkey, suppkey) count the supplier's late lines, then "
    "per orderkey count suppliers and late suppliers — the second "
    "groupBy reuses the first's hash partitioning (orderkey ⊂ both "
    "keys), so the whole correlation costs ONE narrow orderkey "
    "shuffle of (orderkey, suppkey, is_late).  A qualifying "
    "supplier contributes its late-LINE count (the oracle's count(*) "
    "is over l1 lines), summed per supplier name at the end.  The "
    "oracle stays in the full EXISTS/NOT-EXISTS form, so the gate "
    "proves the rewrite.",
)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lines = l.join(o, l.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        ).cast("long").alias("is_late"),
    )
    per_supp = lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum("is_late").alias("late_lines")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum((F.col("late_lines") > 0).cast("long")).alias("n_late_supp"),
    )
    waiting = (
        per_supp.join(per_order, "l_orderkey")
        .where(
            (F.col("late_lines") > 0)
            & (F.col("n_supp") > 1)
            & (F.col("n_late_supp") == 1)
        )
        .select("l_suppkey", "late_lines")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.join(s, waiting.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("late_lines").alias("numwait"))
    )


_Q8_ORACLE = """
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(CASE WHEN n2.n_name = 'NATION_7'
                 THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * CAST(1 - l.l_discount AS DECIMAL(18,2))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS mkt_share
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
    JOIN region r   ON n1.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY 1
    """


@register(
    "nation_market_share",
    _Q8_ORACLE,
    doc="TPC-H Q8 shape: NATION_7 suppliers' share of ASIA-customer "
    "revenue per order year — the widest join tree in the catalog "
    "(both fact tables AND two independent dimension arms).  Spark "
    "side: the supplier arm reduces to (suppkey, is_target) with "
    "nation broadcast; the orders arm reduces to a narrow "
    "(orderkey, year) relation and becomes the BUILD side of a "
    "shuffled HASH join — the 600M-row lineitem side is probed, "
    "never sorted, and never pre-aggregated (the round-6 per-order "
    "pre-agg was the sf100 superlinear term: a near-unique-key "
    "150M-group hash aggregate that spilled, feeding SMJ sorts; the "
    "final aggregate has only O(years) groups, so map-side partial "
    "aggregation does all the reduction AFTER the join for free).  "
    "Both year sums stay exact decimal until a single cast each, "
    "then one double division (the promo_revenue_share discipline).",
)
def q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _nation_market_share_plan(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "orders"),
        spark, sf_dir,
    )


@register_extra(
    "nation_market_share_bucketed",
    _Q8_ORACLE,
    doc="The Q8 join tree on BUCKETED fact tables — the storage-layout "
    "fix for the 15.7x sf10->sf100 sweep entry (the widest tree's "
    "orderkey exchange over both fact sides).  lineitem and orders "
    "are materialized once bucketBy(orderkey) with a shared bucket "
    "count: the broadcast supplier/customer arms preserve each side's "
    "bucketing, so the final orderkey hash join probes the raw "
    "lineitem scan exchange-free on BOTH fact sides (no sort, no "
    "fact-side pre-agg — the raw-probe discipline of the plain twin "
    "plus the layout win).  Same logical plan, same oracle hash as "
    "nation_market_share; the plan test pins the absent exchanges.",
)
def q_nation_market_share_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_repartition_watermark_example_spark.storage import bucketed_table, suggest_buckets

    nb = suggest_buckets(sf_dir, "lineitem")
    l = spark.table(bucketed_table(spark, sf_dir, "lineitem", ["l_orderkey"], nb))
    o = spark.table(bucketed_table(spark, sf_dir, "orders", ["o_orderkey"], nb))
    # broadcast_arms: the twin's whole point is preserving each fact
    # side's bucketing, so the reduced supplier/customer arms must be
    # the BUILD sides (at toy SF AQE would otherwise broadcast the
    # tiny FACT side and discard its bucketing; at scale the arms are
    # the smaller relations anyway)
    return _nation_market_share_plan(l, o, spark, sf_dir, broadcast_arms=True)


def _nation_market_share_plan(
    l, o, spark, sf_dir, broadcast_arms: bool = False
) -> DataFrame:
    o = o.select("o_orderkey", "o_custkey", "o_orderdate")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")

    supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", (F.col("n_name") == "NATION_7").alias("is_target")
    )
    zero = F.lit(0).cast(_DEC)
    if broadcast_arms:
        supp = F.broadcast(supp)
    lf = l.join(supp, l.l_suppkey == supp.s_suppkey).select(
        "l_orderkey", _rev().alias("rev"), "is_target"
    )
    cust = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .where(F.col("r_name") == "ASIA")
        .select("c_custkey")
    )
    if broadcast_arms:
        cust = F.broadcast(cust)
    ord_year = o.join(cust, o.o_custkey == cust.c_custkey).select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    # SHUFFLE_HASH on the (orderkey, year) arm: the build side is
    # O(filtered orders) rows at ~16 bytes each — per shuffle
    # partition a few MB at any SF with data-sized partition counts —
    # while the probe side is the raw fact.  A sort-merge join here
    # would sort the 600M-row side; the hash join never does, and on
    # the bucketed twin both sides already report
    # HashPartitioning(orderkey), so the join runs with zero exchange
    # AND zero sort.
    return (
        lf.join(
            ord_year.hint("shuffle_hash"),
            lf.l_orderkey == ord_year.o_orderkey,
        )
        .groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("is_target"), F.col("rev")).otherwise(zero))
                .cast("double")
                / F.sum("rev").cast("double")
            ).alias("mkt_share")
        )
    )


@register_extra(
    "rich_inactive_customers",
    """
    SELECT c.c_mktsegment AS segment, count(*) AS numcust,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS totacctbal
    FROM customer c
    WHERE CAST(c.c_acctbal AS DECIMAL(18,2))
          * (SELECT count(*) FROM customer WHERE c_acctbal > 0)
          > (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2)))
             FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c.c_mktsegment
    """,
    doc="TPC-H Q22 shape (no phone column, and every customer here "
    "has SOME order, so 'inactive' = no orders since 2000): segment "
    "totals of above-average-balance customers with no recent "
    "orders.  The scalar AVG threshold is compared as "
    "bal * n > total in exact decimals — neither engine ever "
    "divides, which is the only way the boundary rows agree "
    "bit-for-bit.  Spark side: the (n, total) aggregate is one "
    "broadcast O(1)-row build (the documented nested-loop exception "
    "class), the NOT EXISTS is a LEFT ANTI join against the "
    "date-filtered orders projection — anti joins shuffle only "
    "custkey pairs, and the date filter is pushed to the scan.",
)
def q_rich_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    bal = F.col("c_acctbal").cast(_DEC)
    stats = (
        c.where(F.col("c_acctbal") > 0)
        .agg(
            F.count(F.lit(1)).alias("n_pos"),
            F.sum(bal).alias("tot_pos"),
        )
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    rich = c.join(F.broadcast(stats)).where(
        bal * F.col("n_pos") > F.col("tot_pos")
    )
    inactive = rich.join(
        recent, rich.c_custkey == recent.o_custkey, "left_anti"
    )
    return inactive.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("numcust"),
        dec_sum("c_acctbal", "totacctbal"),
    )


@register_extra(
    "small_qty_revenue_share",
    """
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#7'
      AND 5 * CAST(l.l_quantity AS DECIMAL(18,2))
            * (SELECT count(*) FROM lineitem l2
               WHERE l2.l_partkey = l.l_partkey)
          < (SELECT sum(CAST(l2.l_quantity AS DECIMAL(18,2)))
             FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
    doc="TPC-H Q17 shape: revenue locked up in small-quantity orders "
    "of one brand's parts.  The oracle keeps TWO correlated scalar "
    "subqueries (per-part count and sum); the Spark side aggregates "
    "lineitem once per partkey and joins the O(parts) row aggregate "
    "back — and the `qty < 0.2 * avg` threshold is compared as "
    "``5 * qty * cnt < sum_qty`` in exact decimals, so neither "
    "engine ever divides (the Q22 discipline).  The brand filter "
    "reduces the part side to a broadcast.",
)
def q_small_qty_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    p = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#7")
        .select("p_partkey")
    )
    per_part = l.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("l_quantity").cast(_DEC)).alias("sum_qty"),
    )
    small = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(per_part.withColumnRenamed("l_partkey", "agg_partkey"),
              F.col("l_partkey") == F.col("agg_partkey"))
        .where(
            F.lit(5) * F.col("l_quantity").cast(_DEC) * F.col("cnt")
            < F.col("sum_qty")
        )
    )
    return small.agg(
        (
            F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double") / F.lit(7.0)
        ).alias("avg_yearly")
    )


_Q7_ORACLE = """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_9')
        OR (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1995-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """


@register_extra(
    "volume_shipping",
    _Q7_ORACLE,
    doc="TPC-H Q7 shape: bilateral trade volume between two nations "
    "by ship year — the disjunctive two-sided nation predicate.  "
    "Spark side: each fact table is cut down by its own broadcast "
    "nation arm FIRST (supplier arm keeps only the two nations' "
    "suppliers, customer arm likewise), so the orderkey shuffle "
    "carries only qualifying rows; the cross-pair OR collapses to "
    "`supp_nation != cust_nation` after the single-nation arms, "
    "evaluated post-join.",
)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _volume_shipping_plan(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "orders"),
        spark, sf_dir,
    )


@register_extra(
    "volume_shipping_bucketed",
    _Q7_ORACLE,
    doc="The Q7 join tree on BUCKETED fact tables: lineitem and "
    "orders are read from their bucketBy(orderkey)+sortBy copies, the "
    "broadcast nation arms preserve each side's bucketing, and the "
    "shuffled hash join consumes the bucket partitioning directly — "
    "zero exchange, zero sort on either fact side.  Same logical "
    "result and oracle hash as volume_shipping; the plan test pins "
    "the absent exchanges.",
)
def q_volume_shipping_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_repartition_watermark_example_spark.storage import bucketed_table, suggest_buckets

    nb = suggest_buckets(sf_dir, "lineitem")
    l = spark.table(bucketed_table(spark, sf_dir, "lineitem", ["l_orderkey"], nb))
    o = spark.table(bucketed_table(spark, sf_dir, "orders", ["o_orderkey"], nb))
    return _volume_shipping_plan(l, o, spark, sf_dir)


def _volume_shipping_plan(l, o, spark, sf_dir) -> DataFrame:
    nations = ("NATION_3", "NATION_9")
    n = _t(spark, sf_dir, "nation").where(F.col("n_name").isin(*nations))
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    c = _t(spark, sf_dir, "customer").join(
        F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    l = (
        l
        .where(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_suppkey", "l_shipdate",
                "l_extendedprice", "l_discount")
    )
    o = o.select("o_orderkey", "o_custkey")
    lf = l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
    of = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    # Same shuffled-hash-join discipline as nation_market_share: the
    # orders arm (only the two nations' customers survive the
    # broadcast cut) is the narrow build side; the date-filtered fact
    # side is probed, never sorted — the SMJ sorts were the sf100
    # superlinear term.
    return (
        lf.join(of.hint("shuffle_hash"), lf.l_orderkey == of.o_orderkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(dec_sum_rev().alias("revenue"))
    )


def dec_sum_rev():
    return F.sum(_rev()).cast("double")


@register_extra(
    "disjunctive_brand_revenue",
    """
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 1 AND 15)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 5 AND 20
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 10 AND 40
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
    doc="TPC-H Q19 shape: OR-of-ANDs across both join sides.  The "
    "Spark side applies the part-only residue of the disjunction "
    "(brand+size arms) to the part scan BEFORE the broadcast join — "
    "the classic Q19 rewrite that Catalyst's CNF conversion cannot "
    "fully derive — then evaluates the exact original predicate on "
    "the joined rows, so the build side shrinks to matching parts "
    "while semantics are untouched.",
)
def q_disjunctive_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part_arm = (
        (F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 10)
        | (F.col("p_brand") == "Brand#2") & F.col("p_size").between(5, 20)
        | (F.col("p_brand") == "Brand#3") & F.col("p_size").between(10, 40)
    )
    p = _t(spark, sf_dir, "part").where(part_arm).select(
        "p_partkey", "p_brand", "p_size"
    )
    full = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(1, 15)
        | (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(5, 20)
        & F.col("l_quantity").between(10, 30)
        | (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(10, 40)
        & F.col("l_quantity").between(20, 50)
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .where(full)
        .agg(dec_sum_rev().alias("revenue"))
    )


@register_extra(
    "returned_item_revenue",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
    GROUP BY 1, 2, 3
    ORDER BY sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l.l_discount AS DECIMAL(18,2))) DESC,
             c.c_custkey ASC
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: top-20 customers by returned-item revenue "
    "in a half-year window.  Spark side: the returnflag filter and "
    "column pruning reach the lineitem scan, the date filter reaches "
    "the orders scan, lineitem pre-aggregates to one row per "
    "orderkey BEFORE the customer join (the Q8 discipline — the "
    "custkey shuffle carries O(qualifying orders) narrow rows), "
    "nation broadcasts, and the top-20 is a deterministic "
    "decimal-exact sort with custkey tiebreak (ties in double "
    "revenue are resolved identically in both engines because the "
    "compared decimals are exact).",
)
def q_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    per_order = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(_rev()).alias("rev"))
    )
    return (
        per_order.join(c, per_order.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .orderBy(F.col("rev").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.col("rev").cast("double").alias("revenue"),
        )
    )


@register_extra(
    "late_line_priority_counts",
    """
    SELECT l.l_linestatus,
           sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    GROUP BY 1
    """,
    doc="TPC-H Q12 shape (adapted: this star schema has no shipmode, "
    "so linestatus is the category axis and 'late' is shipped >90 "
    "days after order date — the same correlated-date predicate as "
    "the Q4 shape).  Conditional-sum counts over a fact-fact join: "
    "both scans prune to 2-3 columns, the correlated predicate rides "
    "the join condition, and the per-category rollup is a "
    "map-side-combined integer agg.",
)
def q_late_line_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(
            o,
            (l.l_orderkey == o.o_orderkey)
            & (l.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register_extra(
    "shipping_priority_topk",
    """
    SELECT l.l_orderkey,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND l.l_shipdate  > TIMESTAMP '1997-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l.l_discount AS DECIMAL(18,2))) DESC,
             o.o_orderdate ASC, l.l_orderkey ASC
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: top-10 unshipped BUILDING-segment orders by "
    "revenue.  Spark side: both date filters and the 3-column "
    "projections reach the scans, the segment-filtered customer side "
    "semi-reduces orders BEFORE the lineitem join (the orderkey "
    "shuffle carries qualifying orders only), and the top-10 is a "
    "decimal-exact sort with (orderdate, orderkey) tiebreaks so the "
    "limit is deterministic in both engines.",
)
def q_shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    l = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    of = o.join(c, o.o_custkey == c.c_custkey, "left_semi")
    return (
        l.join(of, l.l_orderkey == of.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_rev()).alias("rev"))
        .orderBy(
            F.col("rev").desc(),
            F.col("o_orderdate").asc(),
            F.col("l_orderkey").asc(),
        )
        .limit(10)
        .select(
            "l_orderkey",
            F.col("rev").cast("double").alias("revenue"),
            "o_orderdate",
        )
    )


# ---------------------------------------------------------------------------
# TPC-H completion set (Q2/Q6/Q9/Q11/Q16/Q20): the six remaining
# shapes of the 22-query catalog.  This schema has no partsupp table,
# so the part-supplier relation is DERIVED from lineitem (distinct
# (l_partkey, l_suppkey), with min(l_extendedprice) as the supply-cost
# proxy and shipped quantity as the availability proxy) — the
# decorrelation surfaces (scalar min subquery, HAVING-over-global-sum,
# NOT IN, nested IN + correlated half-of-total) are preserved exactly.
# ---------------------------------------------------------------------------


@register_extra(
    "forecast_revenue_change",
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
           AS revenue_increase
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6: revenue increase if low-quantity discounts were "
    "dropped — a pure scan+filter+agg with NO join and NO shuffle "
    "beyond the single-row final agg.  The plan test surface: all "
    "three predicates (shipdate range, discount band, quantity) reach "
    "the parquet scan as PushedFilters and the ReadSchema is 4 "
    "columns of 11; at 100 TB this is the canonical "
    "row-group-pruned full-scan query.  Exact decimal product, one "
    "cast to double at the end (module parity discipline).",
)
def q_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        F.sum(
            F.col("l_extendedprice").cast(_DEC) * F.col("l_discount").cast(_DEC)
        )
        .cast("double")
        .alias("revenue_increase")
    )


_COST_SQL = """
    cost AS (
      SELECT l_partkey, l_suppkey,
             min(CAST(l_extendedprice AS DECIMAL(18,2))) AS supplycost
      FROM lineitem GROUP BY l_partkey, l_suppkey)
"""


@register_extra(
    "min_cost_regional_supplier",
    f"""
    WITH {_COST_SQL},
    eur AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE')
    SELECT p.p_partkey, e.s_name, e.n_name, e.s_acctbal,
           CAST(c.supplycost AS DOUBLE) AS supplycost
    FROM part p
    JOIN cost c ON p.p_partkey = c.l_partkey
    JOIN eur e ON c.l_suppkey = e.s_suppkey
    WHERE p.p_size = 15
      AND c.supplycost = (
        SELECT min(c2.supplycost)
        FROM cost c2 JOIN eur e2 ON c2.l_suppkey = e2.s_suppkey
        WHERE c2.l_partkey = p.p_partkey)
    ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 shape (supply cost derived from lineitem — no "
    "partsupp in this schema): for size-15 parts, the "
    "European supplier(s) achieving the minimum supply cost, "
    "top-100 by account balance.  The oracle keeps the correlated "
    "scalar-min subquery; the Spark side decorrelates it into ONE "
    "extra aggregation — per-part min over the already-joined "
    "regional cost rows — joined back on (partkey, cost) equality, "
    "so the 100 TB plan is: one (partkey, suppkey) exchange for the "
    "cost table, broadcast dim joins (region/nation/supplier/part "
    "filter), one partkey-partitioned min, and a tie-preserving "
    "self-join that reuses the partkey partitioning.  LIMIT is "
    "total-order deterministic (acctbal, nation, supplier, part).",
)
def q_min_cost_regional_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    cost = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice").cast(_DEC)).alias("supplycost")
    )
    s = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eur = s.join(
        F.broadcast(
            n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
                "n_nationkey", "n_name"
            )
        ),
        s.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    p = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_size") == 15)
        .select("p_partkey")
    )
    # regional cost rows for the filtered parts: broadcast both dims
    # so the only exchange so far is the cost aggregation's
    regional = (
        cost.join(F.broadcast(p), cost.l_partkey == p.p_partkey)
        .join(F.broadcast(eur), cost.l_suppkey == eur.s_suppkey)
        .select("p_partkey", "s_name", "n_name", "s_acctbal", "supplycost")
    )
    best = regional.groupBy("p_partkey").agg(
        F.min("supplycost").alias("supplycost")
    )
    return (
        regional.join(best, ["p_partkey", "supplycost"])
        .select(
            "p_partkey",
            "s_name",
            "n_name",
            "s_acctbal",
            F.col("supplycost").cast("double").alias("supplycost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(),
            F.col("n_name").asc(),
            F.col("s_name").asc(),
            F.col("p_partkey").asc(),
        )
        .limit(100)
    )


_Q9_ORACLE = """
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * CAST(1 - l.l_discount AS DECIMAL(18,2))
                    - CAST(p.p_retailprice AS DECIMAL(18,2))
                      * CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
           AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """


@register_extra(
    "product_type_profit",
    _Q9_ORACLE,
    doc="TPC-H Q9 shape (profit = revenue minus retail-price cost "
    "proxy — no ps_supplycost in this schema): per supplier-nation "
    "per order-year profit on red parts.  Scale shape: part filter "
    "+ supplier/nation are broadcast onto the lineitem scan (three "
    "dim joins, zero fact exchanges), so the ONE real shuffle is "
    "lineitem-orders on orderkey, and the (nation, year) final agg "
    "is map-side combined down to O(nations x years) rows.  Exact "
    "decimal arithmetic throughout, one double cast at the end.",
)
def q_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _product_type_profit_plan(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "orders"),
        spark, sf_dir,
    )


@register_extra(
    "product_type_profit_bucketed",
    _Q9_ORACLE,
    doc="The Q9 join tree on BUCKETED fact tables: lineitem and "
    "orders materialized once bucketBy(orderkey) with a shared "
    "bucket count, so the one fact-fact exchange of the plain twin "
    "(lineitem-orders on orderkey) disappears — the broadcast "
    "part/supplier arms preserve the probe side's bucketing and the "
    "orderkey join runs exchange-free on both sides.  Same logical "
    "plan, same oracle hash as product_type_profit; the storage "
    "layout is the only difference (the nation_market_share_bucketed "
    "discipline).",
)
def q_product_type_profit_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_repartition_watermark_example_spark.storage import bucketed_table, suggest_buckets

    nb = suggest_buckets(sf_dir, "lineitem")
    l = spark.table(bucketed_table(spark, sf_dir, "lineitem", ["l_orderkey"], nb))
    o = spark.table(bucketed_table(spark, sf_dir, "orders", ["o_orderkey"], nb))
    return _product_type_profit_plan(l, o, spark, sf_dir)


def _product_type_profit_plan(l, o, spark, sf_dir) -> DataFrame:
    p = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "n_name"
    )
    l = l.select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    )
    o = o.select("o_orderkey", "o_orderdate")
    profit = (
        F.col("l_extendedprice").cast(_DEC)
        * (F.lit(1) - F.col("l_discount")).cast(_DEC)
        - F.col("p_retailprice").cast(_DEC) * F.col("l_quantity").cast(_DEC)
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(sn), l.l_suppkey == sn.s_suppkey)
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


@register_extra(
    "important_part_values",
    """
    WITH val AS (
      SELECT l.l_partkey AS partkey,
             sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS v
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_7'
      GROUP BY l.l_partkey)
    SELECT partkey, CAST(v AS DOUBLE) AS value
    FROM val
    WHERE v * (SELECT count(*) FROM val) > 2 * (SELECT sum(v) FROM val)
    """,
    doc="TPC-H Q11 shape (part value from lineitem revenue — no "
    "partsupp): parts representing more than 2% of one nation's "
    "total traded value, i.e. a HAVING threshold that is itself a "
    "scalar subquery over the SAME aggregate.  The Spark side "
    "computes the per-part values once (nation filter broadcast "
    "onto the lineitem scan, one partkey exchange), derives the "
    "global (count, sum) as an O(1)-row aggregate of that result, "
    "and broadcast-joins it back — the oracle keeps the scalar-"
    "subquery form so the gate checks the decorrelation.  The "
    "threshold is SCALE-INVARIANT — parts above 2x the MEAN part "
    "value (TPC-H's fixed fraction empties as the part domain "
    "grows with SF) — and is compared as v*n > 2*total in exact "
    "decimals: neither engine ever divides (cross-engine float-"
    "division parity is unwinnable, module discipline).",
)
def q_important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey"
    )
    l = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    val = (
        l.join(F.broadcast(sn), l.l_suppkey == sn.s_suppkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(_rev()).alias("v"))
    )
    total = val.agg(
        F.sum("v").alias("total"), F.count(F.lit(1)).alias("n_parts")
    )
    return (
        val.join(F.broadcast(total))
        .where(F.col("v") * F.col("n_parts") > F.col("total") * 2)
        .select("partkey", F.col("v").cast("double").alias("value"))
    )


@register_extra(
    "supplier_part_relationship",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#9' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND ps.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 shape (part-supplier relation derived as DISTINCT "
    "lineitem pairs — no partsupp): how many qualified suppliers "
    "can supply each (brand, type, size) bucket, excluding "
    "excluded-list suppliers (negative balance standing in for the "
    "complaints LIKE).  Shapes under test: NOT IN -> broadcast "
    "LEFT ANTI join (the excluded list is tiny), the distinct "
    "pair projection (one (partkey, suppkey) exchange, Catalyst "
    "folds it into the count-distinct's first aggregate), inverted "
    "(<>) and IN-list predicates pushed to the part scan, and a "
    "count(DISTINCT) final agg over the broadcast-joined buckets.",
)
def q_supplier_part_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = (
        _t(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != "Brand#9")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        ps.join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register_extra(
    "potential_promotion_suppliers",
    """
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT sq.l_suppkey FROM (
        SELECT l_partkey, l_suppkey,
               sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_partkey IN
              (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        GROUP BY l_partkey, l_suppkey) sq
      WHERE sq.qty * 2 > (
        SELECT sum(CAST(l2.l_quantity AS DECIMAL(18,2)))
        FROM lineitem l2
        WHERE l2.l_partkey = sq.l_partkey
          AND l2.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l2.l_shipdate <  TIMESTAMP '1997-01-01'))
    ORDER BY s.s_name
    """,
    doc="TPC-H Q20 shape (shipped quantity standing in for availqty "
    "— no partsupp): suppliers who shipped MORE THAN HALF of some "
    "small-part's 1996 volume, i.e. nested IN + a correlated "
    "half-of-total scalar subquery.  The Spark decorrelation is the "
    "Q21 chained-same-key discipline: aggregate once per (partkey, "
    "suppkey), then again per partkey — the second groupBy is a "
    "prefix of the first's keys, so it REUSES the exchange (no "
    "second shuffle) — then a partkey-local join compares 2*qty > "
    "total in exact decimals and a distinct suppkey semi-join picks "
    "the suppliers.  Oracle keeps the doubly-nested subquery form.",
)
def q_potential_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    l = (
        _t(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey, "left_semi")
    )
    per_pair = l.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast(_DEC)).alias("qty")
    )
    per_part = per_pair.groupBy("l_partkey").agg(
        F.sum("qty").alias("total_qty")
    )
    dominant = (
        per_pair.join(per_part, "l_partkey")
        .where(F.col("qty") * 2 > F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    return (
        s.join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
