"""Text-analysis query registrations (north-star surface) — Spark plans
from operators/text.py paired with DuckDB oracles rendered by the same
functions/textfns.py helpers, so both sides stay in lockstep."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_repartition_watermark_example_spark.functions import textfns as TX
from flink_repartition_watermark_example_spark.operators.text import analyze_documents
from flink_repartition_watermark_example_spark.queries import register, register_extra
from flink_repartition_watermark_example_spark.scale import fan_out
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


@register_extra(
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
           CAST(sum(len({_TOKS})) AS BIGINT) AS ws_tokens,
           CAST(sum(len({TX.bpe_tokens_sql('text')})) AS BIGINT) AS bpe_tokens,
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


@register(
    "curation_funnel",
    f"""
    WITH toks AS (SELECT doc_id, text, {_TOKS} AS t FROM documents),
    s AS (
      SELECT doc_id,
             {TX.quality_score_sql('text', 't')} AS q,
             {TX.lang_id_sql('t')} AS lang_pred,
             {TX.fingerprint_sql('t')} AS fp
      FROM toks
    ),
    flags AS (
      SELECT doc_id, fp,
             lang_pred = 'en' AS ep,
             (lang_pred = 'en' AND q >= 0.35) AS lp
      FROM s
    ),
    d AS (
      SELECT *,
             lp AND doc_id = min(CASE WHEN lp THEN doc_id END)
                               OVER (PARTITION BY fp) AS dp
      FROM flags
    )
    SELECT count(*) AS n_total,
           CAST(sum(CASE WHEN ep THEN 1 ELSE 0 END) AS BIGINT) AS n_english,
           CAST(sum(CASE WHEN lp THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
           CAST(sum(CASE WHEN dp THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
    FROM d
    """,
    doc="Training-data curation funnel in one pass: language gate "
    "(English by stopword heuristic), quality gate (score >= 0.35, the "
    "corpus median), then normalized exact "
    "dedup (min-doc_id representative per content fingerprint among "
    "survivors). All gates are scan-side expressions; the only "
    "shuffles are the fingerprint window and the final global "
    "aggregate — the canonical shape of a corpus-cleaning job.",
)
def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = TX.tokens("text")
    s = docs.select(
        "doc_id",
        TX.quality_score(F.col("text"), toks).alias("q"),
        TX.lang_id(toks).alias("lang_pred"),
        TX.fingerprint(toks).alias("fp"),
    )
    flags = s.select(
        "doc_id",
        "fp",
        (F.col("lang_pred") == "en").alias("ep"),
        ((F.col("lang_pred") == "en") & (F.col("q") >= 0.35)).alias("lp"),
    )
    rep = F.min(F.when(F.col("lp"), F.col("doc_id"))).over(Window.partitionBy("fp"))
    d = flags.withColumn("dp", F.col("lp") & (F.col("doc_id") == rep))
    one = F.lit(1)
    zero = F.lit(0)
    return d.agg(
        F.count(one).alias("n_total"),
        F.sum(F.when(F.col("ep"), one).otherwise(zero)).cast("long").alias("n_english"),
        F.sum(F.when(F.col("lp"), one).otherwise(zero)).cast("long").alias("n_quality"),
        F.sum(F.when(F.col("dp"), one).otherwise(zero)).cast("long").alias("n_unique"),
    )


# --- BM25 ranked retrieval -------------------------------------------------
# Rational-idf BM25 (idf = (N - df + 0.5)/(df + 0.5), NO log): ln() is
# not correctly-rounded and differs across libm implementations, so the
# standard log-idf cannot be hash-compared across engines; the rational
# variant is a monotone per-term reweighting computed purely from
# +,-,*,/ (IEEE-exact on both engines when the expression tree
# matches).  Per-term scores are floor-quantized to integers BEFORE the
# per-doc sum so the reduction is order-independent (the repo's
# standard float-determinism pattern, cf. label_centroids).
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("hash", "join", "stream", "vector")
BM25_TOPN = 20
_Q = 1000000000.0  # score quantum: floor(term_score * 1e9)


@register_extra(
    "bm25_search",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    dl AS (SELECT doc_id, len(t) AS dl FROM toks),
    stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_dl
              FROM dl),
    tf AS (SELECT doc_id, g AS term, count(*) AS tf
           FROM (SELECT doc_id, unnest(t) AS g FROM toks)
           WHERE g IN {BM25_TERMS!r} GROUP BY doc_id, g),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             CAST(sum(CAST(floor({_Q} *
               (((CAST(s.n_docs AS DOUBLE) - CAST(df.df AS DOUBLE)) + 0.5)
                  / (CAST(df.df AS DOUBLE) + 0.5))
               * (CAST(tf.tf AS DOUBLE) * {BM25_K1 + 1.0})
               / (CAST(tf.tf AS DOUBLE)
                  + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B}
                      * (CAST(dl.dl AS DOUBLE)
                         / (CAST(s.total_dl AS DOUBLE)
                            / CAST(s.n_docs AS DOUBLE)))))
             ) AS BIGINT)) AS BIGINT) AS score_q
      FROM tf JOIN dl ON dl.doc_id = tf.doc_id
              JOIN df ON df.term = tf.term
              CROSS JOIN stats s
      GROUP BY tf.doc_id
    )
    SELECT doc_id, score_q,
           CAST(row_number() OVER (ORDER BY score_q DESC, doc_id ASC)
                AS BIGINT) AS rank
    FROM scored
    ORDER BY rank LIMIT {BM25_TOPN}
    """,
    doc="BM25 ranked retrieval (rational-idf variant, see constants "
    "above) for a fixed term set: inverted-index shape — explode "
    "tokens, keep query terms only, per-(doc,term) tf, per-term df "
    "broadcast back, one quantized-integer sum per doc, global top-n. "
    "Scale shape: the posting list is filtered to |Q| terms at the "
    "scan, df and corpus stats are scalar-sized broadcasts, and the "
    "only wide ops are the tf hash-agg and the final top-n — no "
    "full-corpus shuffle, which is the property that matters when "
    "the index side is 100 TB.",
)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_repartition_watermark_example_spark.scale import fan_out

    docs = load_table(spark, sf_dir, "documents")
    toks = fan_out(docs, "doc_id").select("doc_id", TX.tokens("text").alias("t"))
    dl = toks.select("doc_id", F.size("t").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").cast("long").alias("total_dl"),
    )
    tf = (
        toks.select("doc_id", F.explode_outer("t").alias("term"))
        .where(F.col("term").isin(*BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    avgdl = F.col("total_dl").cast("double") / F.col("n_docs").cast("double")
    idf = (
        (F.col("n_docs").cast("double") - F.col("df").cast("double")) + F.lit(0.5)
    ) / (F.col("df").cast("double") + F.lit(0.5))
    term_score = (
        idf
        * (F.col("tf").cast("double") * F.lit(BM25_K1 + 1.0))
        / (
            F.col("tf").cast("double")
            + F.lit(BM25_K1)
            * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * (F.col("dl").cast("double") / avgdl))
        )
    )
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", F.floor(F.lit(_Q) * term_score).cast("long").alias("tsq"))
        .groupBy("doc_id")
        .agg(F.sum("tsq").alias("score_q"))
    )
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("score_q").desc(), F.col("doc_id").asc())
    return (
        scored.orderBy(F.col("score_q").desc(), F.col("doc_id").asc())
        .limit(BM25_TOPN)
        .select(
            "doc_id",
            "score_q",
            F.row_number().over(w).cast("long").alias("rank"),
        )
    )


# --- BPE vocabulary induction: the merge-scoring step ---------------------


@register_extra(
    "bpe_pair_counts",
    """
    WITH words AS (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
        FROM documents
    ),
    freq AS (SELECT word, count(*) AS n FROM words GROUP BY word),
    pairs AS (
        SELECT unnest(list_transform(range(1, length(word)),
                                     i -> substr(word, i, 2))) AS pair,
               n
        FROM freq WHERE length(word) >= 2
    )
    SELECT pair, CAST(sum(n) AS BIGINT) AS cnt
    FROM pairs
    GROUP BY pair
    ORDER BY cnt DESC, pair ASC
    LIMIT 40
    """,
    doc="First merge-scoring round of BPE vocabulary training: "
    "adjacent-symbol pair frequencies over the corpus.  The corpus "
    "collapses to (word, freq) FIRST (shuffle O(|vocab|)), then the "
    "quadratic-ish pair fan-out runs over the vocabulary only — the "
    "standard trick that makes BPE training feasible at 100 TB, "
    "where |vocab| << |tokens|.",
)
def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pairs = (
        freq.where(F.length("word") >= 2)
        .select(
            F.explode(
                F.expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")
            ).alias("pair"),
            "n",
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("pair").asc())
        .limit(40)
    )


# --- iterative BPE: k merge rounds ----------------------------------------

_BPE_ROUNDS = 8


def _bpe_round_ctes(rounds: int) -> str:
    """Unrolled-CTE DuckDB twin of the Spark merge loop: round r counts
    pairs over w{r}, b{r} picks the max (cnt DESC, pair ASC), w{r+1}
    applies the merge with the same double-space replace.

    Every CTE is MATERIALIZED: each b{r} is referenced 2+ times
    (twice in w{r+1}, again in consumers like the encode chain) and
    its definition transitively contains all earlier rounds — letting
    the optimizer inline instead of materialize doubles the plan per
    reference, i.e. an exponential 2^rounds blowup (measured: the
    8-round encode oracle went from >3 min to sub-second)."""
    parts = []
    for r in range(rounds):
        parts.append(f"""
    p{r} AS MATERIALIZED (
        SELECT pair, CAST(sum(n) AS BIGINT) AS cnt FROM (
            SELECT unnest(list_transform(range(1, len(toks)),
                                         i -> toks[i] || ' ' || toks[i+1])) AS pair,
                   n
            FROM (SELECT string_split(trim(s), '  ') AS toks, n FROM w{r})
        ) GROUP BY pair
    ),
    b{r} AS MATERIALIZED (
        SELECT pair, cnt FROM p{r} ORDER BY cnt DESC, pair ASC LIMIT 1),
    w{r + 1} AS MATERIALIZED (
        SELECT replace(s,
                       ' ' || replace((SELECT pair FROM b{r}), ' ', '  ') || ' ',
                       ' ' || replace((SELECT pair FROM b{r}), ' ', '') || ' ') AS s,
               n
        FROM w{r}
    )""")
    return ",".join(parts)


_BPE_ORACLE = f"""
    WITH words AS (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
        FROM documents
    ),
    freq AS (SELECT word, count(*) AS n FROM words GROUP BY word),
    w0 AS (
        SELECT '  ' || array_to_string(regexp_extract_all(word, '.'), '  ')
               || '  ' AS s,
               n
        FROM freq
    ),{_bpe_round_ctes(_BPE_ROUNDS)}
    SELECT * FROM (
        {" UNION ALL ".join(f"SELECT {r + 1} AS round, pair, cnt FROM b{r}" for r in range(_BPE_ROUNDS))}
    ) ORDER BY round
"""


@register_extra(
    "bpe_merges",
    _BPE_ORACLE,
    doc=f"Iterative BPE vocabulary training, {_BPE_ROUNDS} merge rounds "
    "(extends bpe_pair_counts' single scoring round to the real "
    "training loop).  The corpus collapses to (word, freq) ONCE; each "
    "round counts adjacent-symbol pairs over the vocabulary, collects "
    "exactly one row (the winning pair — the same O(1)-per-iteration "
    "driver round-trip as graph.py's convergence checks), and applies "
    "the merge as a single string replace.  Words are represented as "
    "double-space-joined symbol strings so the engines' shared "
    "non-overlapping left-to-right replace() IS the greedy BPE merge "
    "(each token gap donates one space to each adjacent match, so "
    "consecutive pairs merge in one pass — verified identical in "
    "Spark, DuckDB, and CPython).  Per-round state is localCheckpointed "
    "|vocab|-sized, never the corpus; at 100 TB this is the standard "
    "wordpiece-training shape.",
)
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges = _bpe_train(load_table(spark, sf_dir, "documents"))
    return spark.createDataFrame(merges, "round int, pair string, cnt bigint")


def _bpe_word_freq(docs: DataFrame) -> DataFrame:
    """Corpus collapsed to (word, freq) — the one corpus-sized pass
    the whole BPE family shares."""
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _bpe_train(docs: DataFrame) -> list[tuple[int, str, int]]:
    """Run the 8-round merge loop; returns [(round, pair, cnt)].  One
    1-row collect per round (the argmax) — the same O(1) driver
    round-trip as graph.py's convergence checks; per-round state is a
    localCheckpointed |vocab|-sized relation, never the corpus."""
    freq = _bpe_word_freq(docs)
    w = freq.select(
        F.concat(
            F.lit("  "), F.array_join(F.split("word", ""), "  "), F.lit("  ")
        ).alias("s"),
        "n",
    ).localCheckpoint()

    merges: list[tuple[int, str, int]] = []
    for r in range(_BPE_ROUNDS):
        # Spark's sequence(1, 0) is DESCENDING, not empty (unlike
        # DuckDB's range) — fully-merged single-symbol words must be
        # filtered out before the pair fan-out.
        pairs = w.where(
            F.size(F.split(F.trim(F.col("s")), "  ")) >= 2
        ).select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(split(trim(s), '  ')) - 1), "
                    "i -> concat(element_at(split(trim(s), '  '), i), ' ', "
                    "element_at(split(trim(s), '  '), i + 1)))"
                )
            ).alias("pair"),
            "n",
        )
        top = (
            pairs.groupBy("pair")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, cnt = top[0]["pair"], int(top[0]["cnt"])
        merges.append((r + 1, pair, cnt))
        pat = " " + pair.replace(" ", "  ") + " "
        rep = " " + pair.replace(" ", "") + " "
        w = w.select(
            F.replace(F.col("s"), F.lit(pat), F.lit(rep)).alias("s"), "n"
        ).localCheckpoint()
    return merges


def _bpe_encode_replace_sql() -> str:
    """DuckDB twin of the encode chain: the word's symbol string with
    the 8 trained merges applied in training order (each round's
    winning pair comes from the same b{r} CTEs the trainer uses)."""
    s = "'  ' || array_to_string(regexp_extract_all(word, '.'), '  ') || '  '"
    for r in range(_BPE_ROUNDS):
        pair = f"(SELECT pair FROM b{r})"
        s = (
            f"replace({s}, ' ' || replace({pair}, ' ', '  ') || ' ', "
            f"' ' || replace({pair}, ' ', '') || ' ')"
        )
    return s


_BPE_ENCODE_ORACLE = f"""
    WITH words AS (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
        FROM documents
    ),
    freq AS (SELECT word, count(*) AS n FROM words GROUP BY word),
    w0 AS (
        SELECT '  ' || array_to_string(regexp_extract_all(word, '.'), '  ')
               || '  ' AS s,
               n
        FROM freq
    ),{_bpe_round_ctes(_BPE_ROUNDS)},
    enc AS (
        SELECT word,
               len(string_split(trim({_bpe_encode_replace_sql()}), '  ')) AS n_tok
        FROM freq
    ),
    dw AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
        FROM documents
    ),
    dwc AS (SELECT doc_id, word, count(*) AS cnt FROM dw GROUP BY doc_id, word)
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_words,
           CAST(sum(cnt * n_tok) AS BIGINT) AS n_bpe_tokens
    FROM dwc JOIN enc USING (word)
    GROUP BY doc_id
"""


@register_extra(
    "bpe_encode_token_counts",
    _BPE_ENCODE_ORACLE,
    doc="Tokenizer APPLICATION — the other half of the bpe_merges "
    "training loop: encode every document with the trained merge list "
    "and report exact per-document word and BPE-token counts.  Scale "
    "shape: the merge chain is applied to the DISTINCT-word relation "
    "(|vocab| rows), never to the corpus — each merge is one literal "
    "string replace inside whole-stage codegen — and the per-word "
    "token count is broadcast-joined back to the per-(doc, word) "
    "occurrence counts.  At 100 TB the encode cost is O(|vocab|) + "
    "one map-side-combined word-count aggregation, the standard "
    "offline-tokenization shape; the trained vocabulary itself is the "
    "broadcast dimension.",
)
def q_bpe_encode_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    merges = _bpe_train(docs)

    s = F.concat(F.lit("  "), F.array_join(F.split("word", ""), "  "), F.lit("  "))
    for _, pair, _ in merges:
        pat = " " + pair.replace(" ", "  ") + " "
        rep = " " + pair.replace(" ", "") + " "
        s = F.replace(s, F.lit(pat), F.lit(rep))
    enc = _bpe_word_freq(docs).select(
        "word", F.size(F.split(F.trim(s), "  ")).alias("n_tok")
    )

    dwc = (
        docs.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
            ).alias("word"),
        )
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        dwc.join(F.broadcast(enc), "word")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_words"),
            F.sum(F.col("cnt") * F.col("n_tok")).cast("long").alias("n_bpe_tokens"),
        )
    )


# --- cross-document boilerplate detection ---------------------------------

# A word 4-gram that appears in at least this many DISTINCT documents
# is boilerplate (navigation chrome, license headers, templated
# spans) — the cross-document complement of repetition_signals'
# intra-document repetition.
_BOILER_N = 4
_BOILER_MIN_DOCS = 3

_BOILER_SH_SQL = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, unnest(list_distinct({TX.shingles_sql('t', _BOILER_N)})) AS g
           FROM toks),
    boiler AS (SELECT g, CAST(count(*) AS BIGINT) AS n_docs
               FROM sh GROUP BY g HAVING count(*) >= {_BOILER_MIN_DOCS})
"""


def _boiler_shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, g): each document's DISTINCT word 4-grams — dedup
    before the explode so a doc repeating its own template counts
    once (document frequency, not term frequency).

    fan_out + explode_outer + null-filter, the repo's standard
    generate discipline: a bare explode lets Catalyst infer
    size(arr)>0 and push the interpreted shingle lambda into the
    scan stage, which on a single-split documents file runs the whole
    corpus's shingling SERIALLY (measured 34 s/65 s at sf1 for the two
    boilerplate queries — the worst entries of the refreshed sweep —
    vs ~linear-in-cores after the fix)."""
    # width = shuffle.partitions (see winnow_fingerprints): downstream
    # sorts/aggs over the exploded rows inherit this width, so the
    # conf sizes each task's working set without adding concurrency
    from flink_repartition_watermark_example_spark.scale import stage_width

    fanned = fan_out(
        docs.select("doc_id", "text"), "doc_id", parts=stage_width(docs)
    )
    return (
        fanned.select(
            "doc_id",
            F.explode_outer(
                F.array_distinct(TX.shingles(TX.tokens("text"), _BOILER_N))
            ).alias("g"),
        )
        .where(F.col("g").isNotNull())
    )


@register_extra(
    "boilerplate_ngrams",
    _BOILER_SH_SQL + "SELECT g AS shingle, n_docs FROM boiler",
    doc="Cross-document boilerplate inventory: word 4-grams present in "
    f">= {_BOILER_MIN_DOCS} distinct documents, with document "
    "frequency.  The suffix-array-style substring-dedup signal "
    "approximated the Spark-native way: per-doc DISTINCT shingles "
    "(array_distinct before the explode caps each doc's contribution "
    "at its unique-template count) feeding one map-side-combined "
    "hash aggregation — same scan shape as minhash_signatures, no "
    "join, no skew (a hot shingle is just a hot agg key handled by "
    "partial aggregation).",
)
def q_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        _boiler_shingles(docs)
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= _BOILER_MIN_DOCS)
        .select(F.col("g").alias("shingle"), "n_docs")
    )


@register_extra(
    "boilerplate_flagged_docs",
    _BOILER_SH_SQL
    + """
    SELECT sh.doc_id,
           CAST(count(*) AS BIGINT) AS n_boiler,
           CAST(max(boiler.n_docs) AS BIGINT) AS max_df
    FROM sh JOIN boiler ON sh.g = boiler.g
    GROUP BY sh.doc_id
    """,
    doc="Documents carrying boilerplate: per doc, how many of its "
    "distinct 4-grams are in the boilerplate inventory and the worst "
    "offender's document frequency — the flag a curation pipeline "
    "filters or strips on.  The inventory side is the >=K-docs "
    "aggregate (small relative to the corpus); the join is a plain "
    "equi-join on the shingle so both sides shuffle-partition by g — "
    "deliberately NOT a forced broadcast, because at 100 TB the "
    "boilerplate inventory of a web corpus is itself large; AQE "
    "promotes it to broadcast when it measures small.",
)
def q_boilerplate_flagged_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    docs = load_table(spark, sf_dir, "documents")
    # the shingle relation feeds BOTH the inventory aggregate and the
    # join's probe side; Catalyst does not share subplans across
    # branches, so persist it (DISK_ONLY — O(corpus) exploded rows,
    # same rationale as the dedup chain's shared shingle stage)
    sh = _boiler_shingles(docs).persist(StorageLevel.DISK_ONLY)
    # pin before the fan-in: the inventory aggregate and the join's
    # probe side launch their stages CONCURRENTLY, and each
    # cache-missing branch recomputes the shingle explode in parallel
    # before any partition lands in the cache — the doubled working
    # set OOM'd the sweep JVM at sf10 (same trap as the dedup chain;
    # one count() serializes the fill)
    sh.count()
    boiler = (
        sh.groupBy("g")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= _BOILER_MIN_DOCS)
    )
    return (
        sh.join(boiler, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_boiler"),
            F.max("n_docs").cast("long").alias("max_df"),
        )
    )


# --- model-based quality filtering: integer linear classifier -------------

# Offline-fitted weights in integer micro-units.  Integer dot product
# => exact, order-insensitive, reproducible across engines (a float
# sigmoid would not hash-match; ranking and thresholding only need
# the monotone linear score).
_LRW_TOK = 120
_LRW_STOP = 35_000
_LRW_DIGIT = -900
_LRW_PUNCT = -1_500
_LRW_UPPER = -300
_LRW_CHAR = 10
_LR_THRESHOLD = 200_000

_LR_STOPLIST = list(TX.STOPWORDS["en"])


@register_extra(
    "quality_lr_scores",
    f"""
    WITH feats AS (
        SELECT doc_id,
               len(regexp_split_to_array(trim(text), '\\s+')) AS f_tok,
               len(list_intersect(list_distinct(regexp_split_to_array(trim(text), '\\s+')),
                                 {_LR_STOPLIST!r})) AS f_stop,
               length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS f_digit,
               length(text) - length(regexp_replace(text, '[^A-Za-z0-9 \\t\\n]', '', 'g')) AS f_punct,
               length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS f_upper,
               length(trim(text)) AS f_char
        FROM documents
    )
    SELECT doc_id,
           CAST({_LRW_TOK} * f_tok + {_LRW_STOP} * f_stop + {_LRW_DIGIT} * f_digit
              + {_LRW_PUNCT} * f_punct + {_LRW_UPPER} * f_upper
              + {_LRW_CHAR} * f_char AS BIGINT) AS score_micro,
           CAST({_LRW_TOK} * f_tok + {_LRW_STOP} * f_stop + {_LRW_DIGIT} * f_digit
              + {_LRW_PUNCT} * f_punct + {_LRW_UPPER} * f_upper
              + {_LRW_CHAR} * f_char >= {_LR_THRESHOLD} AS BOOLEAN) AS kept
    FROM feats
    """,
    doc="Model-based quality filter: a linear classifier (integer "
    "micro-unit weights, fitted offline) over cheap scan-side "
    "features — the fasttext-classifier stage of a curation "
    "pipeline.  Pure column algebra, zero shuffles, zero UDFs; at "
    "100 TB this runs at scan speed and the kept flag drives the "
    "downstream corpus write.",
)
def q_quality_lr_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = TX.tokens("text")
    f_tok = F.size(toks)
    f_stop = F.size(
        F.array_intersect(
            F.array_distinct(toks), F.array(*[F.lit(w) for w in _LR_STOPLIST])
        )
    )
    strip = lambda pat: F.length("text") - F.length(
        F.regexp_replace(F.col("text"), pat, "")
    )
    f_digit = strip("[0-9]")
    f_punct = strip("[^A-Za-z0-9 \\t\\n]")
    f_upper = strip("[A-Z]")
    f_char = F.length(F.trim(F.col("text")))
    score = (
        F.lit(_LRW_TOK) * f_tok
        + F.lit(_LRW_STOP) * f_stop
        + F.lit(_LRW_DIGIT) * f_digit
        + F.lit(_LRW_PUNCT) * f_punct
        + F.lit(_LRW_UPPER) * f_upper
        + F.lit(_LRW_CHAR) * f_char
    ).cast("bigint")
    return docs.select(
        "doc_id",
        score.alias("score_micro"),
        (score >= _LR_THRESHOLD).alias("kept"),
    )


@register_extra(
    "training_mix_weights",
    f"""
    WITH per_src AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(len({TX.bpe_tokens_sql('text')})) AS BIGINT) AS src_tokens
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(sum(src_tokens) AS BIGINT) AS total_tokens,
             count(*) AS n_sources
      FROM per_src
    )
    SELECT p.source, p.n_docs, p.src_tokens,
           CAST(p.src_tokens AS DOUBLE) / t.total_tokens AS actual_share,
           LEAST(3.0, CAST(t.total_tokens AS DOUBLE)
                        / (t.n_sources * p.src_tokens)) AS sample_weight
    FROM per_src p CROSS JOIN tot t
    """,
    doc="Training-data mix planner: per-source BPE token budgets and "
    "the sampling weight that moves the mix toward a uniform "
    "per-source target, upsampling capped at 3x (the standard guard "
    "against epoching a tiny source into memorization).  Scale "
    "shape: one map-side-combined agg to O(sources) rows; the "
    "grand totals come from an unpartitioned window over that "
    "already-reduced relation (O(sources) rows through one "
    "partition — never the raw corpus).  Parity: weights stay "
    "exact-integer ratios until a single double division per row, "
    "so the LEAST cut is engine-stable.",
)
def q_training_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    bpe = F.size(TX.bpe_tokens("text"))
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(bpe).cast("long").alias("src_tokens"),
    )
    w = Window.partitionBy()
    per_src = per_src.select(
        "source",
        "n_docs",
        "src_tokens",
        F.sum("src_tokens").over(w).cast("long").alias("total_tokens"),
        F.count(F.lit(1)).over(w).alias("n_sources"),
    )
    return per_src.select(
        "source",
        "n_docs",
        "src_tokens",
        (F.col("src_tokens").cast("double") / F.col("total_tokens")).alias(
            "actual_share"
        ),
        F.least(
            F.lit(3.0),
            F.col("total_tokens").cast("double")
            / (F.col("n_sources") * F.col("src_tokens")),
        ).alias("sample_weight"),
    )


@register_extra(
    "vocab_growth_by_source",
    f"""
    WITH t AS (SELECT source, unnest({_TOKS}) AS tok FROM documents)
    SELECT source,
           count(*) AS n_tokens,
           count(DISTINCT tok) AS n_distinct,
           CAST(count(DISTINCT tok) AS DOUBLE) / count(*) AS type_token_ratio
    FROM t GROUP BY source
    """,
    doc="Vocabulary growth (Heaps-law) stats per source: total token "
    "occurrences, distinct vocabulary size, type-token ratio — the "
    "corpus-analysis numbers that flag machine-generated or "
    "template-heavy sources (abnormally low TTR) before training.  "
    "Scale shape: one explode + a distinct aggregate keyed "
    "(source, tok) — Zipfian vocabularies combine heavily in the "
    "map-side partial (unlike near-unique (doc, gram) keys, the "
    "documented sf10 OOM shape), so the exchange carries ~|vocab| "
    "rows per source, not the corpus.  Ratio is one double division "
    "after exact integer counts.",
)
def q_vocab_growth_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = fan_out(docs.select("source", "text"), "source", "text").select(
        "source", F.explode(TX.tokens("text")).alias("tok")
    )
    return t.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("tok").alias("n_distinct"),
        (
            F.countDistinct("tok").cast("double") / F.count(F.lit(1))
        ).alias("type_token_ratio"),
    )


@register_extra(
    "source_overlap_matrix",
    """
    WITH f AS (SELECT DISTINCT source, md5(text) AS fp FROM documents)
    SELECT a.source AS source_a, b.source AS source_b,
           count(*) AS shared_fingerprints
    FROM f a JOIN f b ON a.fp = b.fp AND a.source < b.source
    GROUP BY a.source, b.source
    """,
    doc="Cross-source duplication matrix: for every ordered source "
    "pair, how many exact-text fingerprints they share — the "
    "provenance view of dedup (which crawls/datasets re-serve each "
    "other's content) that decides dedup ORDER and source priorities "
    "before a training mix.  Scale shape: the ORACLE says self-join, "
    "the plan does better — distinct (source, fingerprint), then ONE "
    "groupBy(fingerprint) collecting the sorted source set, then "
    "scan-side pair expansion (posexplode + slice).  One parquet "
    "scan and two narrow-key exchanges; the naive fingerprint "
    "self-join read the 2-column corpus twice (no exchange reuse "
    "across the aliased sides).  Per fingerprint at most (#sources "
    "choose 2) pairs, so output is bounded by duplicate mass x S^2, "
    "never all-pairs of documents.",
)
def q_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    f = (
        fan_out(docs.select("source", "text"), "source", "text")
        .select("source", F.md5("text").alias("fp"))
        .dropDuplicates()
    )
    g = f.groupBy("fp").agg(F.sort_array(F.collect_set("source")).alias("ss"))
    pairs = (
        g.where(F.size("ss") >= 2)
        .select(F.col("ss"), F.posexplode("ss").alias("i", "source_a"))
        .select(
            "source_a",
            F.explode(
                F.slice(F.col("ss"), F.col("i") + 2, F.size("ss"))
            ).alias("source_b"),
        )
    )
    return pairs.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("shared_fingerprints")
    )


@register_extra(
    "dup_cluster_size_histogram",
    """
    WITH c AS (
      SELECT md5(text) AS fp, count(*) AS sz FROM documents GROUP BY md5(text)
    )
    SELECT sz AS cluster_size, count(*) AS n_clusters,
           CAST(sz * count(*) AS BIGINT) AS n_docs
    FROM c GROUP BY sz
    """,
    doc="Exact-duplicate cluster-size histogram: how many fingerprint "
    "clusters have 1, 2, 3... members, and how many documents that "
    "mass represents — the one-look summary of how duplicated a "
    "corpus is (and the input for estimating dedup savings before "
    "running the purge).  Two cascaded aggregations, each with "
    "map-side partials: the first keys the near-unique fingerprint "
    "(output O(distinct texts)), the second keys the tiny cluster "
    "size domain.",
)
def q_dup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    c = (
        fan_out(docs.select("text"), "text")
        .groupBy(F.md5("text").alias("fp"))
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    return c.groupBy(F.col("sz").alias("cluster_size")).agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.col("sz") * F.count(F.lit(1))).cast("long").alias("n_docs"),
    )


@register_extra(
    "token_frequency_spectrum",
    f"""
    WITH t AS (SELECT unnest({_TOKS}) AS tok FROM documents),
    f AS (SELECT tok, count(*) AS freq FROM t GROUP BY tok)
    SELECT freq, count(*) AS n_types
    FROM f GROUP BY freq
    """,
    doc="Token frequency-of-frequencies spectrum (count of counts): "
    "how many token TYPES occur exactly f times — the N_f table "
    "Good-Turing smoothing consumes, and the Zipf-curve fingerprint "
    "that distinguishes natural text from templated or synthetic "
    "corpora at a glance.  Same cascaded-aggregation shape as the "
    "cluster histogram: explode once, aggregate the Zipfian token "
    "domain (map-side partials combine heavily), then collapse to "
    "the tiny frequency domain.",
)
def q_token_frequency_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = fan_out(docs.select("text"), "text").select(
        F.explode(TX.tokens("text")).alias("tok")
    )
    f = t.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    return f.groupBy("freq").agg(F.count(F.lit(1)).alias("n_types"))


# --- TF-IDF keyword extraction --------------------------------------------

TFIDF_TOPK = 3
_TFIDF_Q = 1000000000.0  # same quantum discipline as BM25


@register_extra(
    "tfidf_top_terms",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    tf AS (SELECT doc_id, g AS term, count(*) AS tf
           FROM (SELECT doc_id, unnest(t) AS g FROM toks)
           GROUP BY doc_id, g),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    stats AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
    scored AS (
      SELECT tf.doc_id, tf.term,
             CAST(floor({_TFIDF_Q} * (CAST(tf.tf AS DOUBLE)
               * (((CAST(s.n_docs AS DOUBLE) - CAST(df.df AS DOUBLE)) + 0.5)
                  / (CAST(df.df AS DOUBLE) + 0.5)))) AS BIGINT) AS score_q
      FROM tf JOIN df ON df.term = tf.term CROSS JOIN stats s)
    SELECT doc_id, term, score_q,
           CAST(rk AS BIGINT) AS rk
    FROM (SELECT doc_id, term, score_q,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY score_q DESC, term ASC) AS rk
          FROM scored)
    WHERE rk <= {TFIDF_TOPK}
    """,
    doc="TF-IDF keyword extraction: the top-3 most characteristic "
    "terms per document — the per-doc feature a curation pipeline "
    "uses for topic bucketing and cluster labeling.  Rational idf "
    "((N - df + 0.5)/(df + 0.5), the BM25 constant block above): no "
    "ln(), so term scores are IEEE-exact on both engines, and each "
    "score is floor-quantized to an integer before ranking.  Scale "
    "shape: one (doc_id, term) hash-agg for tf (map-side combined), "
    "an O(vocab) df agg joined back ON TERM (the join carries "
    "O(corpus tokens) narrow rows and the df side is vocabulary-"
    "sized — never broadcast a 100 TB corpus, always the vocab), a "
    "scalar n_docs broadcast, and a doc_id-partitioned top-k window "
    "— every exchange is a plain hash shuffle on a near-unique key.",
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from flink_repartition_watermark_example_spark.scale import fan_out

    docs = load_table(spark, sf_dir, "documents")
    toks = fan_out(docs, "doc_id").select(
        "doc_id", TX.tokens("text").alias("t")
    )
    # The (doc_id, term, tf) table feeds three branches (df, n_docs,
    # the scored join) and Catalyst shares no subplans — unpinned, the
    # tokenize+explode+agg subtree executed three times (r12).  Pinned
    # it is computed once; at scale this is the materialize-once tf
    # table every IR/BM25 system builds before scoring.
    tf = (
        toks.select("doc_id", F.explode("t").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    ).localCheckpoint(eager=True)
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = tf.agg(F.countDistinct("doc_id").alias("n_docs"))
    idf = (
        (F.col("n_docs").cast("double") - F.col("df").cast("double"))
        + F.lit(0.5)
    ) / (F.col("df").cast("double") + F.lit(0.5))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "term",
            F.floor(F.lit(_TFIDF_Q) * (F.col("tf").cast("double") * idf))
            .cast("long")
            .alias("score_q"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_q").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= TFIDF_TOPK)
        .select("doc_id", "term", "score_q", "rk")
    )


# --- collocation mining: bigram lift --------------------------------------

LIFT_MIN_SUPPORT = 5
LIFT_TOPN = 50
_LIFT_Q = 1000000.0


@register_extra(
    "bigram_lift",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    bg AS (
      SELECT unnest(list_transform(range(1, len(t)),
                                   i -> t[i] || ' ' || t[i+1])) AS pair
      FROM toks WHERE len(t) >= 2),
    cab AS (SELECT pair, count(*) AS cab FROM bg GROUP BY pair),
    uni AS (SELECT unnest(t) AS w FROM toks),
    cu AS (SELECT w, count(*) AS cu FROM uni GROUP BY w),
    stats AS (SELECT (SELECT count(*) FROM uni) AS n_uni,
                     (SELECT count(*) FROM bg) AS n_bg),
    scored AS (
      SELECT string_split(cab.pair, ' ')[1] AS w1,
             string_split(cab.pair, ' ')[2] AS w2,
             cab.cab AS pair_count,
             CAST(floor({_LIFT_Q} *
               ((CAST(cab.cab AS DOUBLE) / CAST(s.n_bg AS DOUBLE))
                / ((CAST(a.cu AS DOUBLE) / CAST(s.n_uni AS DOUBLE))
                   * (CAST(b.cu AS DOUBLE) / CAST(s.n_uni AS DOUBLE))))
             ) AS BIGINT) AS lift_q
      FROM cab
      JOIN cu a ON a.w = string_split(cab.pair, ' ')[1]
      JOIN cu b ON b.w = string_split(cab.pair, ' ')[2]
      CROSS JOIN stats s
      WHERE cab.cab >= {LIFT_MIN_SUPPORT})
    SELECT w1, w2, CAST(pair_count AS BIGINT) AS pair_count, lift_q
    FROM scored
    ORDER BY lift_q DESC, w1 ASC, w2 ASC
    LIMIT {LIFT_TOPN}
    """,
    doc="Collocation mining: the top bigrams by LIFT — observed "
    "bigram probability over the independence expectation "
    "p(ab)/(p(a)p(b)) — the statistic (a rational PMI, no ln, same "
    "parity discipline as the BM25 block) that surfaces multi-word "
    "expressions worth protecting from tokenizer splits.  Scale "
    "shape: the corpus collapses to bigram and unigram count tables "
    "first (two map-side-combined hash aggs, output O(vocab^2-"
    "observed) and O(vocab)), the two marginal joins run count-"
    "table-vs-count-table (never against the corpus), the totals "
    "are an O(1) broadcast, and the top-n is a single TakeOrdered.",
)
def q_bigram_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_repartition_watermark_example_spark.scale import fan_out

    docs = load_table(spark, sf_dir, "documents")
    # Token arrays feed both the bigram and the unigram branches, and
    # the two corpus totals previously re-ran the tokenize a third and
    # fourth time (r12): pin the token arrays (computed once) and
    # derive the totals from the count tables themselves —
    # n_uni = Σ cu (every token is counted in exactly one unigram
    # group) and n_bg = Σ pair_count over the unfiltered bigram
    # counts — integer sums, identical by definition.
    toks = (
        fan_out(docs, "doc_id")
        .select(TX.tokens("text").alias("t"))
        .localCheckpoint(eager=True)
    )
    bg = toks.where(F.size("t") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1), "
                "i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    cab = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .localCheckpoint(eager=True)
    )
    uni = toks.select(F.explode("t").alias("w"))
    cu = (
        uni.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cu"))
        .localCheckpoint(eager=True)
    )
    stats = cu.agg(F.sum("cu").alias("n_uni")).crossJoin(
        cab.agg(F.sum("pair_count").alias("n_bg"))
    )
    a = cu.select(F.col("w").alias("w1"), F.col("cu").alias("cu_a"))
    b = cu.select(F.col("w").alias("w2"), F.col("cu").alias("cu_b"))
    lift = (
        F.col("pair_count").cast("double") / F.col("n_bg").cast("double")
    ) / (
        (F.col("cu_a").cast("double") / F.col("n_uni").cast("double"))
        * (F.col("cu_b").cast("double") / F.col("n_uni").cast("double"))
    )
    return (
        cab.where(F.col("pair_count") >= LIFT_MIN_SUPPORT)
        .join(a, "w1")
        .join(b, "w2")
        .crossJoin(F.broadcast(stats))
        .select(
            "w1",
            "w2",
            F.col("pair_count").cast("long").alias("pair_count"),
            F.floor(F.lit(_LIFT_Q) * lift).cast("long").alias("lift_q"),
        )
        .orderBy(
            F.col("lift_q").desc(), F.col("w1").asc(), F.col("w2").asc()
        )
        .limit(LIFT_TOPN)
    )


# --- per-source data card -------------------------------------------------

_DC_Q = 1000000.0  # fraction quantum


@register_extra(
    "corpus_datacard",
    f"""
    WITH toks AS (
      SELECT doc_id, source, lang, {_TOKS} AS t FROM documents),
    base AS (
      SELECT source,
             count(*) AS n_docs,
             CAST(sum(len(t)) AS BIGINT) AS total_tokens,
             count(DISTINCT {TX.fingerprint_sql('t')}) AS distinct_fp
      FROM toks GROUP BY source),
    langs AS (
      SELECT source, lang, count(*) AS n,
             row_number() OVER (PARTITION BY source
                                ORDER BY count(*) DESC, lang ASC) AS rn
      FROM toks GROUP BY source, lang)
    SELECT b.source,
           CAST(b.n_docs AS BIGINT) AS n_docs,
           b.total_tokens,
           CAST(b.distinct_fp AS BIGINT) AS distinct_fp,
           CAST(floor({_DC_Q} * (CAST(b.n_docs - b.distinct_fp AS DOUBLE)
                                 / CAST(b.n_docs AS DOUBLE)))
                AS BIGINT) AS dup_frac_q,
           CAST(floor(CAST(b.total_tokens AS DOUBLE)
                      / CAST(b.n_docs AS DOUBLE)) AS BIGINT) AS avg_tokens,
           l.lang AS majority_lang,
           CAST(floor({_DC_Q} * (CAST(l.n AS DOUBLE)
                                 / CAST(b.n_docs AS DOUBLE)))
                AS BIGINT) AS majority_lang_frac_q
    FROM base b JOIN langs l ON l.source = b.source AND l.rn = 1
    """,
    doc="Per-source data card: the one-row-per-source summary a "
    "training pipeline publishes with a dataset release — document "
    "and token counts, normalized-dedup mass (1 - distinct "
    "fingerprints / docs), average document length, and the "
    "majority language with its share.  All fractions derive from "
    "exact integer counts through correctly-rounded double ops and "
    "floor-quantization (module parity discipline).  Scale shape: "
    "ONE corpus scan feeds two aggregations — per-source counts "
    "with an embedded distinct on the near-unique fingerprint key "
    "(partial aggs do the reduction) and the tiny (source, lang) "
    "roll-up — then an O(sources) join.  Nothing downstream of the "
    "first agg touches corpus-sized data.",
)
def q_corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from flink_repartition_watermark_example_spark.scale import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id", "source", "lang", TX.tokens("text").alias("t")
    )
    base = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size("t")).cast("long").alias("total_tokens"),
        F.countDistinct(TX.fingerprint(F.col("t")))
        .cast("long")
        .alias("distinct_fp"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("n").desc(), F.col("lang").asc()
    )
    langs = (
        docs.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    dup_frac = (
        F.col("n_docs").cast("double") - F.col("distinct_fp").cast("double")
    ) / F.col("n_docs").cast("double")
    return (
        base.join(langs, "source")
        .select(
            "source",
            "n_docs",
            "total_tokens",
            "distinct_fp",
            F.floor(F.lit(_DC_Q) * dup_frac).cast("long").alias("dup_frac_q"),
            F.floor(
                F.col("total_tokens").cast("double")
                / F.col("n_docs").cast("double")
            )
            .cast("long")
            .alias("avg_tokens"),
            F.col("lang").alias("majority_lang"),
            F.floor(
                F.lit(_DC_Q)
                * (F.col("n").cast("double") / F.col("n_docs").cast("double"))
            )
            .cast("long")
            .alias("majority_lang_frac_q"),
        )
    )


# --- corpus mixture drift: per-source token-distribution divergence -------
# (round 12)


@register_extra(
    "source_token_divergence",
    f"""
    WITH toks AS (SELECT source, unnest({_TOKS}) AS w FROM documents),
    st AS (SELECT source, w, count(*) AS c_st FROM toks GROUP BY 1, 2),
    tok AS (SELECT w, CAST(sum(c_st) AS BIGINT) AS c_t FROM st GROUP BY 1),
    src AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s,
                   CAST(count(*) AS BIGINT) AS v_s
            FROM st GROUP BY 1),
    tot AS (SELECT CAST(sum(c_t) AS BIGINT) AS n_tot FROM tok),
    inpart AS (
      SELECT st.source,
             sum(abs(CAST(st.c_st AS HUGEINT) * t.n_tot
                     - CAST(tk.c_t AS HUGEINT) * s.n_s)) AS num_in,
             CAST(sum(tk.c_t) AS BIGINT) AS c_in
      FROM st
      JOIN tok tk ON tk.w = st.w
      JOIN src s ON s.source = st.source
      CROSS JOIN tot t
      GROUP BY 1)
    SELECT i.source,
           s.n_s AS n_tokens,
           s.v_s AS vocab_source,
           CAST(floor(1e9 * CAST(i.num_in
                                 + CAST(s.n_s AS HUGEINT) * (t.n_tot - i.c_in)
                                 AS DOUBLE)
                      / (2.0 * CAST(s.n_s AS DOUBLE)
                         * CAST(t.n_tot AS DOUBLE))) AS BIGINT) AS tv_q9
    FROM inpart i
    JOIN src s ON s.source = i.source
    CROSS JOIN tot t
    """,
    doc="Corpus mixture drift: per source, the total-variation distance "
    "between the source's token distribution and the whole-corpus "
    "distribution (quantized at 1e9) plus token/vocab inventories — "
    "the table a data-mixing stage reads to spot a source whose "
    "language shifted (crawl drift, encoder change) before it skews "
    "training.  TV = 1/2 * sum_t |p_s(t) - p(t)| over the FULL vocab: "
    "the numerator is accumulated as exact integers "
    "(|c_st*N - c_t*N_s| as decimal/hugeint), the complement mass of "
    "tokens the source never saw folds in as N_s*(N - sum_{{t in s}} "
    "c_t), and the single double division happens once per source — "
    "the rational-arithmetic discipline (no ln, like bigram_lift) that "
    "keeps both engines bit-identical.  Scale shape: one corpus-scale "
    "map-side-combined (source, token) agg; everything after runs on "
    "count tables — tok is O(vocab) broadcast, src/tot are O(sources) "
    "— so the 100 TB cost is one explode-agg pass.",
)
def q_source_token_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = fan_out(docs, "doc_id").select(
        "source", F.explode(TX.tokens("text")).alias("w")
    )
    # st feeds FOUR plan branches (tok, src, the inpart join, and tot
    # via tok); Catalyst shares no subplans across branches, so the
    # corpus-scale tokenize+agg pass would run once per branch.  The
    # pinned relation is the O(sources x vocab) count table — tiny
    # next to the corpus — and makes the "one explode-agg pass" scale
    # claim actually true in the executed plan (r12).
    st = (
        toks.groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c_st"))
        .localCheckpoint(eager=True)
    )
    tok = st.groupBy("w").agg(F.sum("c_st").cast("long").alias("c_t"))
    src = st.groupBy("source").agg(
        F.sum("c_st").cast("long").alias("n_s"),
        F.count(F.lit(1)).cast("long").alias("v_s"),
    )
    tot = tok.agg(F.sum("c_t").cast("long").alias("n_tot"))

    def dec(c):
        return F.col(c).cast("decimal(38,0)")

    inpart = (
        st.join(F.broadcast(tok), "w")
        .join(F.broadcast(src.select("source", "n_s")), "source")
        .crossJoin(F.broadcast(tot))
        .groupBy("source")
        .agg(
            F.sum(
                F.abs(dec("c_st") * dec("n_tot") - dec("c_t") * dec("n_s"))
            ).alias("num_in"),
            F.sum("c_t").cast("long").alias("c_in"),
        )
    )
    num = (
        F.col("num_in")
        + dec("n_s") * (dec("n_tot") - F.col("c_in").cast("decimal(38,0)"))
    ).cast("double")
    tv_q9 = F.floor(
        (F.lit(1e9) * num)
        / (F.lit(2.0) * F.col("n_s").cast("double") * F.col("n_tot").cast("double"))
    ).cast("long")
    return (
        inpart.join(F.broadcast(src), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("n_s").alias("n_tokens"),
            F.col("v_s").alias("vocab_source"),
            tv_q9.alias("tv_q9"),
        )
    )
