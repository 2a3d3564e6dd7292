"""Property-based tests (SURVEY §5.2): the windowing invariants hold
for arbitrary event sets, not just the fixtures.

Hypothesis drives the *shapes* (timestamps, keys, window sizes); each
example runs through the real engine.  Examples are kept small and the
Spark session is reused, so the suite stays fast.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_repartition_watermark_example_spark.operators.windowed import windowed_count

BASE = datetime(2024, 3, 1, tzinfo=timezone.utc)

events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3 * 24 * 3600 - 1),  # offset seconds
        st.integers(min_value=0, max_value=999_999),  # microseconds
        st.sampled_from(["a", "b", "c"]),
    ),
    min_size=1,
    max_size=60,
)

window_sizes = st.sampled_from(["1 hour", "30 minutes", "1 day", "15 minutes"])

_slow = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _df(spark, evs):
    rows = [
        ((BASE + timedelta(seconds=s, microseconds=us)).replace(tzinfo=None), k)
        for s, us, k in evs
    ]
    return spark.createDataFrame(rows, "ts timestamp, url string")


@given(evs=events, size=window_sizes)
@_slow
def test_conservation_and_alignment(spark, evs, size):
    """Σ window counts == #events; bounds are size-aligned half-open;
    every (window, key) appears once."""
    out = windowed_count(_df(spark, evs), "ts", ["url"], size).collect()
    assert sum(r.aggregate for r in out) == len(evs)
    seen = set()
    unit = {"1 hour": 3600, "30 minutes": 1800, "1 day": 86400, "15 minutes": 900}[size]
    for r in out:
        key = (r.window_start, r.url)
        assert key not in seen
        seen.add(key)
        assert (r.window_end - r.window_start).total_seconds() == unit
        assert r.window_start.timestamp() % unit == 0


@given(evs=events, size=window_sizes)
@_slow
def test_every_event_inside_its_assigned_window(spark, evs, size):
    """Per-row window assignment satisfies start <= ts < end (half-open,
    reference S6 semantics)."""
    df = _df(spark, evs)
    assigned = df.select("ts", F.window("ts", size).alias("w"))
    bad = assigned.where(
        (F.col("ts") < F.col("w.start")) | (F.col("ts") >= F.col("w.end"))
    )
    assert bad.count() == 0


@given(evs=events)
@_slow
def test_windowed_count_equals_floor_groupby(spark, evs):
    """The window() grouping agrees with an explicit floor computation."""
    df = _df(spark, evs)
    a = sorted(
        (r.window_start, r.url, r.aggregate)
        for r in windowed_count(df, "ts", ["url"]).collect()
    )
    floor = df.groupBy(
        F.timestamp_seconds(
            (F.unix_timestamp("ts") - F.unix_timestamp("ts") % 3600)
        ).alias("ws"),
        "url",
    ).count()
    b = sorted((r.ws, r.url, r["count"]) for r in floor.collect())
    assert a == b


def test_md5_hash_family_cross_engine_parity(spark):
    """The md5→bigint hash family must produce IDENTICAL values in
    Spark and DuckDB on arbitrary strings (unicode, quotes, spaces) —
    the foundation every dedup/split/sampling oracle stands on."""
    import duckdb

    from flink_repartition_watermark_example_spark.functions.hashing import (
        md5_long,
        md5_long30,
        md5_long30_sql,
        md5_long_sql,
    )

    samples = [
        "hello", "", " ", "a b  c", 'quote"s', "naïve café 中文 🙂",
        "tab\tnewline\n", "0123456789" * 20, "'; DROP TABLE x; --",
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    got = {
        r.s: (r.h, r.h30)
        for r in df.select(
            "s",
            md5_long(F.col("s")).alias("h"),
            md5_long30(F.col("s")).alias("h30"),
        ).collect()
    }
    con = duckdb.connect()
    for s in samples:
        h, h30 = con.sql(
            f"SELECT {md5_long_sql('?::VARCHAR')}, {md5_long30_sql('?::VARCHAR')}",
            params=[s, s],
        ).fetchone()
        assert got[s] == (h, h30), (s, got[s], (h, h30))
    con.close()


# --- connected components vs union-find reference ------------------------

cc_edges = st.lists(
    st.tuples(st.integers(0, 24), st.integers(0, 24)),
    min_size=0,
    max_size=40,
)


@given(edges=cc_edges)
@_slow
def test_connected_components_matches_union_find(spark, edges):
    """The distributed min-label propagation must agree with a
    sequential union-find on arbitrary small graphs (self-loops,
    duplicates, isolated vertices included)."""
    from flink_repartition_watermark_example_spark.operators.graph import connected_components

    verts = list(range(25))
    parent = {v: v for v in verts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min vertex of each component
    want = {}
    for v in verts:
        root = find(v)
        want.setdefault(root, []).append(v)
    expect = {v: min(vs) for vs in want.values() for v in vs}

    vdf = spark.createDataFrame([(v,) for v in verts], ["v"])
    edf = spark.createDataFrame(edges or [(0, 0)], ["src", "dst"])
    got = {
        r.v: r.component for r in connected_components(vdf, edf).collect()
    }
    assert got == expect
    # the bounded-collect union-find tier must produce identical labels
    got_driver = {
        r.v: r.component
        for r in connected_components(
            vdf, edf, driver_max_edges=10**6
        ).collect()
    }
    assert got_driver == expect


# --- BPE merge-encoding property -----------------------------------------
# The iterative-BPE oracle (queries_text.bpe_merges) rests on one
# device: symbols joined by DOUBLE spaces make the engines' shared
# non-overlapping left-to-right replace() equal the greedy BPE merge.
# Verify that invariant against a direct reference implementation over
# adversarial symbol sequences (consecutive/overlapping pairs), in
# both CPython and DuckDB.


def _bpe_merge_reference(syms: list[str], pair: tuple[str, str]) -> list[str]:
    """Canonical greedy left-to-right non-overlapping BPE merge."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _encode(syms: list[str]) -> str:
    return "  " + "  ".join(syms) + "  "


def _merge_via_replace(s: str, pair: tuple[str, str]) -> str:
    return s.replace(f" {pair[0]}  {pair[1]} ", f" {pair[0]}{pair[1]} ")


@given(
    syms=st.lists(st.sampled_from(["a", "b", "ab", "ba", "aa"]), min_size=1, max_size=12),
    pair=st.tuples(
        st.sampled_from(["a", "b", "ab", "ba", "aa"]),
        st.sampled_from(["a", "b", "ab", "ba", "aa"]),
    ),
)
@settings(max_examples=300, deadline=None)
def test_double_space_replace_is_greedy_bpe_merge(syms, pair):
    merged = _merge_via_replace(_encode(syms), pair)
    assert merged == _encode(_bpe_merge_reference(syms, pair)), (
        f"python replace diverged for {syms} merging {pair}"
    )


@given(
    syms=st.lists(st.sampled_from(["a", "b", "aa"]), min_size=1, max_size=8),
    pair=st.tuples(st.sampled_from(["a", "b", "aa"]), st.sampled_from(["a", "b", "aa"])),
)
@settings(max_examples=60, deadline=None)
def test_duckdb_replace_matches_reference_merge(syms, pair):
    import duckdb

    con = duckdb.connect()
    try:
        got = con.execute(
            "SELECT replace(?, ?, ?)",
            [_encode(syms), f" {pair[0]}  {pair[1]} ", f" {pair[0]}{pair[1]} "],
        ).fetchone()[0]
    finally:
        con.close()
    assert got == _encode(_bpe_merge_reference(syms, pair)), (
        f"duckdb replace diverged for {syms} merging {pair}"
    )


# --- BPE encode bounds + boilerplate invariants over the real corpus ------


def test_bpe_encode_counts_are_bounded_by_chars_and_words(spark, sf_dir):
    """For every doc: n_words <= n_bpe_tokens <= total letters —
    merges only ever shrink the per-word symbol count from |chars|
    toward 1, never below 1 per word."""
    from flink_repartition_watermark_example_spark.queries import EXTRA_QUERIES
    from flink_repartition_watermark_example_spark.sources.tables import load_table

    enc = EXTRA_QUERIES["bpe_encode_token_counts"].spark(spark, sf_dir)
    letters = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(
                F.regexp_extract_all(F.lower("text"), F.lit("[a-z]"), 0)
            ).alias("n_letters"),
        )
    )
    bad = (
        enc.join(letters, "doc_id")
        .where(
            (F.col("n_bpe_tokens") < F.col("n_words"))
            | (F.col("n_bpe_tokens") > F.col("n_letters"))
        )
        .count()
    )
    assert bad == 0


def test_boilerplate_flagged_docs_subset_with_consistent_df(spark, sf_dir):
    """Every flagged doc's n_boiler is <= its distinct-shingle count,
    and max_df is the df of one of ITS shingles (so >= the threshold
    and <= the corpus-wide max df)."""
    from flink_repartition_watermark_example_spark.queries import EXTRA_QUERIES
    from flink_repartition_watermark_example_spark.queries_text import (
        _BOILER_MIN_DOCS,
        _boiler_shingles,
    )
    from flink_repartition_watermark_example_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    flagged = EXTRA_QUERIES["boilerplate_flagged_docs"].spark(spark, sf_dir)
    per_doc = _boiler_shingles(docs).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sh")
    )
    rows = flagged.join(per_doc, "doc_id").collect()
    assert rows, "no flagged docs at this SF — thresholds degenerate"
    inv = EXTRA_QUERIES["boilerplate_ngrams"].spark(spark, sf_dir)
    max_df = inv.agg(F.max("n_docs")).collect()[0][0]
    for r in rows:
        assert r["n_boiler"] <= r["n_sh"], r
        assert _BOILER_MIN_DOCS <= r["max_df"] <= max_df, r


def test_winnow_matches_pure_python_reference(spark):
    # Independent reimplementation check: random corpora, a pure-Python
    # winnow (md5 gram hashes, sliding-window min, full windows only,
    # partial-window fallback for short docs) must produce EXACTLY the
    # Spark operator's (doc_id, fp) set — catches window-framing or
    # hash drift that the DuckDB oracle (same SQL shape) could share.
    import hashlib
    import random
    import re

    from flink_repartition_watermark_example_spark.operators import dedup as DD

    rng = random.Random(42)
    vocab = [f"tok{i}" for i in range(30)]
    rows = []
    for doc_id in range(60):
        n_toks = rng.randint(0, 24)  # includes docs shorter than n and w
        rows.append((doc_id, " ".join(rng.choice(vocab) for _ in range(n_toks))))

    def md5_long(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    expected = set()
    n, w = DD.SHINGLE_N, DD.WINNOW_W
    for doc_id, text in rows:
        toks = re.split(r"\s+", text.strip()) if text.strip() else [""]
        grams = [
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        ] if len(toks) >= n else []
        hs = [md5_long(g) for g in grams]
        if not hs:
            continue
        if len(hs) < w:
            expected.add((doc_id, min(hs)))
        else:
            for p in range(len(hs) - w + 1):
                expected.add((doc_id, min(hs[p : p + w])))

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.fp) for r in DD.winnow_fingerprints(docs).collect()
    }
    assert got == expected


def test_span_dedup_reassembles_unduplicated_docs_verbatim(spark, sf_dir):
    """Docs none of whose segments were seen earlier corpus-wide must
    come out of the rewrite pass verbatim (the corpus text is already
    single-space separated, so segment-join(' ') is the identity on
    untouched docs); and the stats pass must agree with the rewrite
    pass on how many segments survived."""
    from pyspark.sql import functions as F

    from flink_repartition_watermark_example_spark.queries import EXTRA_QUERIES
    from flink_repartition_watermark_example_spark.sources.tables import load_table

    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    out = {
        r["doc_id"]: (r["dedup_text"], r["n_kept_segs"])
        for r in EXTRA_QUERIES["span_dedup_docs"].spark(spark, sf_dir).collect()
    }
    assert set(out) <= set(docs)
    untouched = verbatim = 0
    for did, (text, _) in out.items():
        if text == docs[did].strip():
            verbatim += 1
    # every doc whose rewrite kept ALL its segments must be verbatim
    from flink_repartition_watermark_example_spark.queries_pipeline import span_segments

    seg_counts = {
        r["doc_id"]: r["n"]
        for r in span_segments(load_table(spark, sf_dir, "documents"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for did, (text, kept) in out.items():
        if kept == seg_counts[did]:
            untouched += 1
            assert text == docs[did].strip(), did
    assert untouched > 0 and verbatim >= untouched

    # stats pass agrees with the rewrite pass segment-for-segment
    from flink_repartition_watermark_example_spark.queries import QUERIES

    stats = QUERIES["span_dedup_stats"].spark(spark, sf_dir).collect()
    assert sum(r["n_kept"] for r in stats) == sum(k for _, k in out.values())
    assert sum(r["n_segs"] for r in stats) == sum(seg_counts.values())


def test_triangle_memberships_divisible_by_three_and_edge_consistent(
    spark, sf_dir
):
    """Every triangle contributes exactly 3 per-doc memberships, so
    the membership total must be divisible by 3; and every doc in a
    triangle must appear in at least 2 edges of the pair graph."""
    from flink_repartition_watermark_example_spark.queries import EXTRA_QUERIES

    tri = {
        r["doc_id"]: r["n_triangles"]
        for r in EXTRA_QUERIES["neardup_triangles"].spark(spark, sf_dir).collect()
    }
    assert tri, "expected at least one triangle in the near-dup graph"
    assert sum(tri.values()) % 3 == 0
    deg: dict[int, int] = {}
    for r in EXTRA_QUERIES["simhash_neardup_pairs"].spark(spark, sf_dir).collect():
        deg[r["doc_a"]] = deg.get(r["doc_a"], 0) + 1
        deg[r["doc_b"]] = deg.get(r["doc_b"], 0) + 1
    for did in tri:
        assert deg.get(did, 0) >= 2, f"doc {did} in a triangle with degree <2"


def test_tfidf_topk_is_bounded_and_sorted_per_doc(spark, sf_dir):
    """Each doc emits at most TFIDF_TOPK rows, ranks are 1..k dense,
    and scores are non-increasing along the rank."""
    from flink_repartition_watermark_example_spark.queries import EXTRA_QUERIES
    from flink_repartition_watermark_example_spark.queries_text import TFIDF_TOPK

    rows = EXTRA_QUERIES["tfidf_top_terms"].spark(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["rk"], r["score_q"]))
    assert by_doc
    for did, rs in by_doc.items():
        rs.sort()
        assert 1 <= len(rs) <= TFIDF_TOPK
        assert [rk for rk, _ in rs] == list(range(1, len(rs) + 1)), did
        scores = [s for _, s in rs]
        assert scores == sorted(scores, reverse=True), did


def test_rolling_anomaly_rows_really_deviate(spark, sf_dir):
    """Every flagged hour's quantized |z| must exceed the threshold
    quantum (ANOM_Z * 1e6, give or take the floor), and flagged hours
    must be a strict subset of all hours."""
    from flink_repartition_watermark_example_spark.queries import EXTRA_QUERIES
    from flink_repartition_watermark_example_spark.queries_catalog import ANOM_Z, _ZQ
    from flink_repartition_watermark_example_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    n_hours = (
        ev.select(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .distinct()
        .count()
    )
    rows = EXTRA_QUERIES["rolling_anomaly_hours"].spark(spark, sf_dir).collect()
    assert 0 < len(rows) < n_hours
    for r in rows:
        # floor-quantized z: |z| > 2 implies z_q >= 2e6 (positive) or
        # z_q <= -(2e6 + 1) (negative side of floor)
        assert abs(r["z_q"]) >= ANOM_Z * _ZQ - 1, r


def test_degree_ordering_bounds_hub_wedge_fanout(spark):
    """A hub doc in many pairs (one star center) must contribute ZERO
    wedges at itself under degree ordering: all its edges orient
    leaf->hub, so the oriented out-degree of every node in a star is
    <= 1 and no wedge (hence no spurious fan-out) exists — the skew
    bound the id-ordered enumeration lacks (hub id 0 would fan out
    n*(n-1)/2 wedges)."""
    from flink_repartition_watermark_example_spark.queries_dedup import (
        orient_edges_by_degree,
        triangle_membership_counts,
    )

    n = 200
    star = spark.createDataFrame(
        [(0, i) for i in range(1, n + 1)], "a long, b long"
    )
    oe = orient_edges_by_degree(star)
    out_deg = {
        r["src"]: r["od"]
        for r in oe.groupBy("src")
        .agg(F.count(F.lit(1)).alias("od"))
        .collect()
    }
    assert 0 not in out_deg, "hub must have zero oriented out-edges"
    assert max(out_deg.values()) == 1
    assert triangle_membership_counts(star).count() == 0


def test_triangle_counts_match_naive_enumeration(spark):
    """Degree-ordered enumeration equals the brute-force per-node
    triangle count on a seeded random graph (including a hub with
    ties in degree and a few closed triangles)."""
    import itertools
    import random

    from flink_repartition_watermark_example_spark.queries_dedup import (
        triangle_membership_counts,
    )

    rng = random.Random(42)
    nodes = list(range(40))
    edges = set()
    for a, b in itertools.combinations(nodes, 2):
        if rng.random() < 0.12:
            edges.add((a, b))
    for i in range(1, 15):  # hub: node 0 tied into many edges
        edges.add((0, i))
    adj = {v: set() for v in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    expected: dict[int, int] = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for v in (a, b, c):
                expected[v] = expected.get(v, 0) + 1
    got = {
        r["doc_id"]: r["n_triangles"]
        for r in triangle_membership_counts(
            spark.createDataFrame(sorted(edges), "a long, b long")
        ).collect()
    }
    assert got == expected


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**12),  # sparse cluster ids
            st.integers(min_value=1, max_value=500),     # cluster sizes
        ),
        min_size=1,
        max_size=120,
        unique_by=lambda t: t[0],
    )
)
def test_quota_split_two_level_prefix_sum_equals_brute_force(spark, sizes):
    """The sharded two-level prefix sum (256 hash-range shards +
    bounded offset window) must equal the single global cumsum over
    the same (h, cluster_id) order on ANY input — sparse ids, skewed
    sizes, shard-boundary collisions included."""
    import hashlib

    from flink_repartition_watermark_example_spark.queries_dedup import quota_split_assign

    sz = spark.createDataFrame(sizes, "cluster_id long, sz long")
    got = {
        r["cluster_id"]: r["split"] for r in quota_split_assign(sz).collect()
    }

    def h(cid: int) -> int:
        return int(
            hashlib.md5(f"{cid}#splitorder".encode()).hexdigest()[:15], 16
        )

    ordered = sorted(sizes, key=lambda t: (h(t[0]), t[0]))
    total = sum(s for _, s in ordered)
    t90, t95 = total * 90 // 100, total * 95 // 100
    before = 0
    expect = {}
    for cid, s in ordered:
        expect[cid] = (
            "train" if before < t90 else ("val" if before < t95 else "test")
        )
        before += s
    assert got == expect


def test_bigram_lift_totals_derived_from_count_tables_are_exact(spark, sf_dir):
    """r12: bigram_lift derives n_uni/n_bg from the pinned count tables
    (n_uni = sum cu over unigram counts, n_bg = sum pair_count over
    unfiltered bigram counts) instead of re-tokenizing the corpus a 3rd
    and 4th time.  Pin the identity on real data: the derived totals
    must equal the direct row counts of the exploded relations."""
    from pyspark.sql import functions as F

    from flink_repartition_watermark_example_spark.functions import textfns as TX
    from flink_repartition_watermark_example_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(TX.tokens("text").alias("t"))
    n_uni_direct = toks.select(F.explode("t").alias("w")).count()
    bg = toks.where(F.size("t") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1), "
                "i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    n_bg_direct = bg.count()
    cu = toks.select(F.explode("t").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("cu")
    )
    cab = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_count"))
    assert cu.agg(F.sum("cu")).collect()[0][0] == n_uni_direct
    assert cab.agg(F.sum("pair_count")).collect()[0][0] == n_bg_direct
