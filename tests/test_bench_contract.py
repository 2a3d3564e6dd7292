"""The driver-facing bench contract (VERDICT r10 #3): stdout must be
ONE JSON line small enough for the driver's ~2000-char tail window —
BENCH_r{N}.json.parsed was null for four rounds because the full
per-query map outgrew it.  No SparkSession needed here: the line
builder is pure."""

from __future__ import annotations

import json

import bench


def _fake_timings():
    # every benched name at a worst-case-width float, so the length
    # pin covers the REAL registry size (and keeps covering it as the
    # bench set grows)
    from flink_repartition_watermark_example_spark.queries import QUERIES

    names = list(QUERIES) + list(bench.BENCH_EXTRAS)
    assert len(names) >= 100
    return {n: 123.4567 for n in names}


def test_compact_line_fits_the_driver_window_and_parses():
    line = bench.compact_line(_fake_timings(), sf=0.1)
    assert "\n" not in line
    assert len(line) < 1500, len(line)  # 2000-char window with headroom
    d = json.loads(line)
    # the driver contract keys
    assert d["metric"] == "engine_bench_total"
    assert d["unit"] == "sec"
    assert isinstance(d["queries"], dict) and len(d["queries"]) == 5
    assert d["n_queries"] == len(_fake_timings())
    assert len(d["queries_sha256"]) == 16
    assert d["full_artifact"] == "BENCH_local.json"


def test_compact_line_hash_is_stable_and_order_insensitive():
    t = {"b": 2.0, "a": 1.0, "c": 3.0}
    h1 = json.loads(bench.compact_line(t, 0.1))["queries_sha256"]
    h2 = json.loads(bench.compact_line(dict(reversed(list(t.items()))), 0.1))[
        "queries_sha256"
    ]
    assert h1 == h2
    # any value change moves the hash
    h3 = json.loads(bench.compact_line({**t, "a": 1.01}, 0.1))["queries_sha256"]
    assert h3 != h1


def test_accepted_regressions_are_recorded():
    # VERDICT r10 #7: the accepted-cost ledger ships with the artifact
    # writer and names the r10 recall trade
    ar = bench.ACCEPTED_REGRESSIONS
    assert "ivf_ann_filtered_topk" in ar
    entry = ar["ivf_ann_filtered_topk"]
    assert entry["round"] == 10 and "recall" in entry["reason"]
