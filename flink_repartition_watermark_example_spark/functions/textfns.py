"""Text column expressions — all JVM-side built-ins, no UDFs.

Every function here has an exact DuckDB twin (the ``*_sql`` renderers)
so text operators stay on the driver's oracle-checked path.  At 100 TB
these run inside whole-stage codegen over the parquet scan: no Python,
no shuffle until an aggregation asks for one.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- tokenization ---------------------------------------------------------


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of trimmed text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def tokens_sql(expr: str) -> str:
    return f"regexp_split_to_array(trim({expr}), '\\s+')"


def shingles(toks: Column, n: int) -> Column:
    """Word n-gram shingles: ['a','b','c','d'], n=3 → ['a b c','b c d'].
    Docs shorter than n tokens yield an empty array."""
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def shingles_sql(toks_expr: str, n: int) -> str:
    return (
        f"CASE WHEN len({toks_expr}) < {n} THEN []::VARCHAR[] ELSE "
        f"list_transform(range(1, len({toks_expr}) - {n - 1} + 1), "
        f"i -> array_to_string(list_slice({toks_expr}, i, i + {n - 1}), ' ')) END"
    )


# --- fixed-size token chunking (training-sample packing) ------------------

CHUNK_SIZE = 32
CHUNK_STRIDE = 24  # size - overlap of 8 tokens


def n_chunks(toks: Column, size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE) -> Column:
    """Number of chunks covering the token list: 1 + ceil((n-size)/stride)
    for n > size, else 1 (every doc yields at least one chunk)."""
    n = F.size(toks)
    return F.when(n <= size, F.lit(1)).otherwise(
        (n - size + (stride - 1)) / stride + 1
    ).cast("int")


def chunk_texts(toks: Column, size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE) -> Column:
    """Array of chunk strings: chunk i = tokens[i*stride, i*stride+size)
    re-joined with spaces — the fixed-window-with-overlap split a
    training pipeline applies before tokenizer packing."""
    return F.transform(
        F.sequence(F.lit(0), n_chunks(toks, size, stride) - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * stride + 1, size)),
    )


def chunk_texts_sql(
    toks_expr: str, size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE
) -> str:
    """DuckDB twin of :func:`chunk_texts`: a list of chunk strings
    (scalar ``range`` builds the index list; DuckDB's table-function
    range cannot reference lateral columns)."""
    nc = (
        f"CASE WHEN len({toks_expr}) <= {size} THEN 1 "
        f"ELSE (len({toks_expr}) - {size} + {stride - 1}) // {stride} + 1 END"
    )
    return (
        f"list_transform(range(0, {nc}), i -> "
        f"array_to_string(list_slice({toks_expr}, "
        f"i * {stride} + 1, i * {stride} + {size}), ' '))"
    )


# --- language ID heuristic ------------------------------------------------

# Tiny per-language stopword inventories (public-knowledge common words).
# The heuristic: score(lang) = #distinct tokens ∩ stopwords(lang); pick
# the argmax with a fixed tiebreak order, 'und' if all scores are 0.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "for", "on", "with"),
    "es": ("el", "la", "de", "los", "las", "y", "en", "que", "un", "una"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "zu"),
    "fr": ("le", "les", "et", "des", "un", "une", "est", "dans", "pour", "que"),
    "zh": ("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"),
}
LANG_ORDER = tuple(STOPWORDS)  # deterministic tiebreak: first wins


def lang_scores(toks: Column) -> dict[str, Column]:
    d = F.array_distinct(toks)
    return {
        lang: F.size(F.array_intersect(d, F.array(*[F.lit(w) for w in words])))
        for lang, words in STOPWORDS.items()
    }


def lang_id(toks: Column) -> Column:
    # First language in LANG_ORDER whose score equals the global max,
    # 'und' when every score is 0.  Formulated against a SHARED
    # greatest(...) so each score expression appears ~3 times in the
    # tree; the previous running-(best, best_score) when-chain embedded
    # the whole accumulator twice per step — ~2^|langs| copies of the
    # early scores, a few-thousand-node expression tree whose
    # analysis+codegen dominated rep-0 of every lang-id consumer
    # (text_analysis 1.9 s rep-0 measured r13; VERDICT r12 #4).
    # Equivalence: the old chain's invariant was best = first lang in
    # LANG_ORDER (within the processed suffix) with score == suffix
    # max > 0 — at the last step exactly "first lang with score ==
    # global max > 0", which is what this computes; ties break to the
    # earlier lang because it is processed LAST here, and all-zero
    # (or null-token) docs fall through to 'und' in both forms.
    scores = lang_scores(toks)
    mx = F.greatest(*[scores[lang] for lang in LANG_ORDER])
    best = F.lit("und")
    for lang in reversed(LANG_ORDER):
        cond = (scores[lang] > 0) & (scores[lang] == mx)
        best = F.when(cond, F.lit(lang)).otherwise(best)
    return best


def lang_id_sql(toks_expr: str) -> str:
    score = {
        lang: (
            f"len(list_intersect(list_distinct({toks_expr}), "
            f"{list(words)!r}))"
        )
        for lang, words in STOPWORDS.items()
    }
    # Same semantics as lang_id(): first language in LANG_ORDER with the
    # strictly-highest score; 'und' when all zero.
    whens = []
    for i, lang in enumerate(LANG_ORDER):
        others_before = [f"{score[lang]} > {score[o]}" for o in LANG_ORDER[:i]]
        others_after = [f"{score[lang]} >= {score[o]}" for o in LANG_ORDER[i + 1:]]
        conds = [f"{score[lang]} > 0"] + others_before + others_after
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(whens) + " ELSE 'und' END"


# --- quality score --------------------------------------------------------
# score = 0.5*min(1, n_tokens/200) + 0.3*min(1, 10*stop/n_tokens)
#       + 0.2*min(1, avg_word_len/8), all double arithmetic in fixed
# order so Spark and DuckDB produce identical bits.

_EN = STOPWORDS["en"]


def quality_score(text_col: Column, toks: Column) -> Column:
    n = F.size(toks).cast("double")
    stop = F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in _EN]))).cast("double")
    awl = (F.length(F.trim(text_col)) - (n - F.lit(1.0))) / n
    return (
        F.least(F.lit(1.0), n / F.lit(200.0)) * F.lit(0.5)
        + F.least(F.lit(1.0), F.lit(10.0) * stop / n) * F.lit(0.3)
        + F.least(F.lit(1.0), awl / F.lit(8.0)) * F.lit(0.2)
    )


def quality_score_sql(text_expr: str, toks_expr: str) -> str:
    n = f"len({toks_expr})::DOUBLE"
    stop = f"len(list_intersect(list_distinct({toks_expr}), {list(_EN)!r}))::DOUBLE"
    awl = f"((length(trim({text_expr})) - ({n} - 1.0)) / {n})"
    return (
        f"least(1.0, {n} / 200.0) * 0.5"
        f" + least(1.0, 10.0 * {stop} / {n}) * 0.3"
        f" + least(1.0, {awl} / 8.0) * 0.2"
    )


# --- fingerprint ----------------------------------------------------------


def fingerprint(toks: Column) -> Column:
    """Order-insensitive content fingerprint: md5 of the sorted distinct
    token set — two docs with the same bag of words collide, which is
    the normalized-dedup key."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))))


def fingerprint_sql(toks_expr: str) -> str:
    return (
        f"md5(array_to_string(list_sort(list_distinct({toks_expr})), ' '))"
    )


# --- BPE-ish subword-boundary tokenization --------------------------------

# Portable across Java regex (Spark) and DuckDB's RE2: letter runs,
# digit runs, or a single non-alphanumeric non-space symbol — the
# pre-tokenization split every BPE-family tokenizer applies before
# merges.  Counting these approximates LLM token counts far better
# than whitespace words (punctuation and numbers tokenize separately).
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def bpe_tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_PATTERN), 0)


def bpe_tokens_sql(expr: str) -> str:
    return f"regexp_extract_all({expr}, '{BPE_PATTERN}')"
