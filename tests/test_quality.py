"""Semantic invariants of the data-quality family (queries_quality.py)
beyond the DuckDB hash-compare in test_queries_oracle.py: the report
must actually distinguish pass from fail, and the diagnostics must obey
their mathematical bounds on any data.
"""

from __future__ import annotations

from flink_repartition_watermark_example_spark.queries import EXTRA_QUERIES, QUERIES

ALL = {**QUERIES, **EXTRA_QUERIES}


def _rows(spark, sf_dir, name):
    return {tuple(r) for r in ALL[name].spark(spark, sf_dir).collect()}


def test_constraint_report_distinguishes_pass_from_fail(spark, sf_dir):
    rows = ALL["dq_constraint_report"].spark(spark, sf_dir).collect()
    by_name = {(r.tbl, r.constraint_name): r for r in rows}
    assert len(by_name) == 8, "one row per catalog constraint"
    # synthetic TPC-H-ish generators keep keys complete/unique/valid…
    for key in [
        ("orders", "completeness_o_custkey"),
        ("orders", "uniqueness_o_orderkey"),
        ("orders", "ref_integrity_o_custkey"),
        ("lineitem", "ref_integrity_l_orderkey"),
    ]:
        r = by_name[key]
        assert r.metric == 1.0 and r.satisfied, key
    # …but acctbal goes negative by design: the report must FAIL it
    # (a DQ gate that never fails is not checking anything)
    r = by_name[("customer", "non_negative_c_acctbal")]
    assert 0.0 < r.metric < 1.0 and not r.satisfied
    for row in rows:
        assert 0.0 <= row.metric <= 1.0
        assert row.satisfied == (row.metric >= 1.0)


def test_table_profile_identifies_key_and_dictionary_columns(spark, sf_dir):
    import duckdb

    rows = {r.col_name: r for r in ALL["table_profile"].spark(spark, sf_dir).collect()}
    n = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/orders.parquet'"
    ).fetchone()[0]
    # primary key: distinct == rows, no nulls
    assert rows["o_orderkey"].n_distinct == n
    assert rows["o_orderkey"].null_frac == 0.0
    # low-cardinality dictionary candidates
    assert rows["o_orderstatus"].n_distinct <= 3
    assert rows["o_orderpriority"].n_distinct <= 5
    # min/max renderings are lexically ordered for the key column
    assert rows["o_orderkey"].min_repr != rows["o_orderkey"].max_repr
    # timestamps render in the engine-portable format
    assert len(rows["o_orderdate"].min_repr) == 19


def test_key_skew_report_bounds(spark, sf_dir):
    rows = ALL["key_skew_report"].spark(spark, sf_dir).collect()
    assert {(r.tbl, r.key_col) for r in rows} == {
        ("orders", "o_custkey"),
        ("lineitem", "l_suppkey"),
        ("events", "user_id"),
    }
    for r in rows:
        assert r.n_keys <= r.n_rows
        assert r.max_count <= r.top10_count <= r.n_rows
        # share bounds and ordering
        assert 0.0 < r.max_share <= r.top10_share <= 1.0
        # HHI lies in [1/n_keys, 1] and is at least max_share^2
        assert (1.0 / r.n_keys) - 1e-12 <= r.hhi <= 1.0
        assert r.hhi >= r.max_share * r.max_share - 1e-12
        # moment identity: n_rows >= n_keys * 1 and top10 counts exist
        assert r.top10_count >= min(10, r.n_keys)


def test_skew_report_matches_brute_force(spark, sf_dir):
    import duckdb

    rows = {r.tbl: r for r in ALL["key_skew_report"].spark(spark, sf_dir).collect()}
    con = duckdb.connect()
    cnts = [
        c
        for (c,) in con.execute(
            f"SELECT count(*) c FROM '{sf_dir}/events.parquet' "
            "WHERE user_id IS NOT NULL GROUP BY user_id"
        ).fetchall()
    ]
    n = sum(cnts)
    r = rows["events"]
    assert r.n_rows == n
    assert r.n_keys == len(cnts)
    assert r.max_count == max(cnts)
    assert r.top10_count == sum(sorted(cnts, reverse=True)[:10])
    assert abs(r.hhi - sum(c * c for c in cnts) / (n * n)) < 1e-12
