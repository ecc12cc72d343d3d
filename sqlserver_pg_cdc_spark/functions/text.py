"""Text analysis for large-scale training-data pipelines.

Language-ID (stopword-set heuristic), quality scoring, token counting,
document fingerprinting, and shingling — each as a pure Column expression
with a DuckDB-SQL twin for the oracle harness. All arithmetic is integer
or same-order IEEE double (no transcendentals), so results are
bit-identical across engines.

These are extensions beyond the reference's surface (BASELINE.json north
star): the operators a 100 TB document-corpus pipeline needs before
training — filter by language/quality, count tokens, fingerprint for
dedup.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# fixed stopword registries (tiny, broadcast as literals into the plan)
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "nicht", "ist", "ich", "ein", "zu", "mit"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "que", "pour", "dans"],
    "es": ["el", "los", "las", "y", "es", "un", "una", "que", "por", "con"],
}
_LANG_ORDER = ["en", "de", "fr", "es"]  # deterministic tie-break priority

PUNCT_CLASS = r"[.,;:!?]"


_UC = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_LC = "abcdefghijklmnopqrstuvwxyz"


def ascii_lower(col: Column | str) -> Column:
    """ASCII-only case folding via translate — IDENTICAL on both engines.

    Unicode lower() is NOT: Java applies special casing (Turkish dotted
    I gains a combining mark, word-final Greek sigma becomes ς) where
    DuckDB does simple folding — any pipeline hashing or tokenizing
    lowered text diverges on such inputs. The cross-engine contract is
    therefore ASCII folding; non-ASCII case is preserved as-is (full
    Unicode casefolding belongs to an ICU-backed UDF, outside the
    oracle-checked surface)."""
    return F.translate(_c(col), _UC, _LC)


def ascii_lower_sql(col: str) -> str:
    return f"translate({col}, '{_UC}', '{_LC}')"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Lowercased whitespace tokens, empty strings removed."""
    return F.filter(
        F.split(ascii_lower(F.trim(_c(col))), r"\s+"), lambda t: t != F.lit("")
    )


def tokens_sql(col: str) -> str:
    return (
        f"list_filter(string_split_regex({ascii_lower_sql(f'trim({col})')}, '\\s+'), t -> t <> '')"
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def token_count_sql(col: str) -> str:
    return f"len({tokens_sql(col)})"


# GPT-2-style pre-tokenizer classes (contraction suffixes, letter runs,
# digit runs, punctuation runs, each with optional leading space) —
# deliberately WITHOUT the trailing-whitespace lookahead of the original
# pattern, because DuckDB's RE2 engine has no lookahead; pure-whitespace
# spans are simply not counted as tokens. Approximates BPE token counts
# well enough for corpus budgeting (the real tokenizer runs at training
# time, not in the lake).
_SUBWORD_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+"


def subword_tokens(col: Column | str) -> Column:
    """BPE-ish pre-tokenization: the subword units a GPT-2-family
    tokenizer would split on, before byte-pair merges."""
    return F.regexp_extract_all(_c(col), F.lit(_SUBWORD_RE), 0)


def subword_tokens_sql(col: str) -> str:
    pat = _SUBWORD_RE.replace("'", "''")
    return f"regexp_extract_all({col}, '{pat}')"


def subword_count(col: Column | str) -> Column:
    """Pre-merge subword count — the standard upper-bound estimate for
    LLM token budgeting over a corpus."""
    return F.size(subword_tokens(col))


def subword_count_sql(col: str) -> str:
    return f"len({subword_tokens_sql(col)})"


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language distinct-stopword hit count."""
    toks = tokens(col)
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in STOPWORDS.items()
    }


def lang_id(col: Column | str) -> Column:
    """argmax over stopword hits with fixed priority en>de>fr>es; 'und'
    (undetermined) when nothing matches."""
    scores = lang_scores(col)
    best: Column = F.lit("und")
    best_score: Column = F.lit(0)
    # iterate in REVERSE priority so earlier languages win ties via >=
    for lang in reversed(_LANG_ORDER):
        s = scores[lang]
        cond = s >= best_score
        take = (s > 0) & cond
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, s).otherwise(best_score)
    return best


def lang_id_sql(col: str) -> str:
    toks = tokens_sql(col)
    score = {
        lang: f"len(list_intersect({toks}, {_sql_array(words)}))"
        for lang, words in STOPWORDS.items()
    }
    # same reverse fold, expressed as nested CASE on materialized scores
    inner = f"SELECT {', '.join(f'{score[l]} AS s_{l}' for l in _LANG_ORDER)}"
    expr = "'und'"
    best = "0"
    for lang in reversed(_LANG_ORDER):
        expr = f"CASE WHEN s_{lang} > 0 AND s_{lang} >= ({best}) THEN '{lang}' ELSE {expr} END"
        best = f"CASE WHEN s_{lang} >= ({best}) THEN s_{lang} ELSE ({best}) END"
    return f"(SELECT {expr} FROM ({inner}))"


def _sql_array(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def punct_count(col: Column | str) -> Column:
    c = _c(col)
    return F.length(c) - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))


def punct_count_sql(col: str) -> str:
    return f"length({col}) - length(regexp_replace({col}, '{PUNCT_CLASS}', '', 'g'))"


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: token volume (capped), low
    punctuation density, stopword presence. Rational arithmetic only —
    identical IEEE ops on both engines."""
    c = _c(col)
    n_tok = token_count(c).cast("double")
    length = F.greatest(F.length(c), F.lit(1)).cast("double")
    punct_ratio = punct_count(c).cast("double") / length
    sw_hits = sum(lang_scores(c).values()).cast("double")
    sw_component = F.least(sw_hits / F.lit(5.0), F.lit(1.0))
    vol_component = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    return vol_component * 0.5 + (F.lit(1.0) - punct_ratio) * 0.3 + sw_component * 0.2


def quality_score_sql(col: str) -> str:
    toks = tokens_sql(col)
    sw = " + ".join(
        f"len(list_intersect({toks}, {_sql_array(w)}))" for w in STOPWORDS.values()
    )
    return (
        f"(least(CAST(len({toks}) AS DOUBLE) / 100.0, 1.0) * 0.5"
        f" + (1.0 - CAST({punct_count_sql(col)} AS DOUBLE)"
        f"   / CAST(greatest(length({col}), 1) AS DOUBLE)) * 0.3"
        f" + least(CAST(({sw}) AS DOUBLE) / 5.0, 1.0) * 0.2)"
    )


def normalize_text(col: Column | str) -> Column:
    """lower + collapse whitespace + trim — the canonical doc form."""
    return F.trim(F.regexp_replace(ascii_lower(_c(col)), r"\s+", " "))


def normalize_text_sql(col: str) -> str:
    return f"trim(regexp_replace({ascii_lower_sql(col)}, '\\s+', ' ', 'g'))"


def fingerprint(col: Column | str) -> Column:
    """Stable content fingerprint over the normalized text (the rolling-
    hash analog, expressed as one md5 over the canonical form)."""
    return F.md5(normalize_text(col))


def fingerprint_sql(col: str) -> str:
    return f"md5({normalize_text_sql(col)})"


def shingles_from_tokens(toks: Column | str, k: int = 3) -> Column:
    """Word k-gram shingles (distinct) from an ALREADY-PROJECTED token
    array column — the form every hot path must use.

    PERF TRAP: the gram construction captures the token array inside the
    ``transform``'s slice lambda, and Spark evaluates lambda-captured
    subtrees PER ELEMENT (codegen subexpression elimination does not
    reach HOF lambda bodies). Inlining ``tokens(text)`` here therefore
    re-runs the regex tokenizer once per output gram — measured ~8x
    slower on the minhash path at sf0.1. Project ``tokens(text)`` in its
    own ``select`` first and pass the attribute; the two-step projection
    is safe from re-merging because CollapseProject refuses to duplicate
    non-cheap expressions.
    """
    t = _c(toks)
    n = F.size(t)
    grams = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice(t, i, k)),
    )
    # guard: Spark's sequence(1, m) with m < 1 counts DOWN, not empty
    return F.when(n >= k, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def shingles(col: Column | str, k: int = 3) -> Column:
    """Word k-gram shingles (distinct), the dedup/minhash unit.

    Convenience single-expression form. On any path that explodes or
    otherwise iterates the grams, use the two-step projection with
    :func:`shingles_from_tokens` instead (see its PERF TRAP note)."""
    return shingles_from_tokens(tokens(col), k)


def shingles_sql(col: str, k: int = 3) -> str:
    toks = tokens_sql(col)
    return (
        f"list_distinct(list_transform(range(1, greatest(len({toks}) - {k - 1}, 0) + 1), "
        f"i -> array_to_string(list_slice({toks}, i, i + {k - 1}), ' ')))"
    )


def all_shingles_from_tokens(toks: Column | str, k: int = 2) -> Column:
    """Word k-grams WITH multiplicity from an already-projected token
    array attribute (see shingles_from_tokens for why the two-step
    projection is mandatory on hot paths)."""
    t = _c(toks)
    n = F.size(t)
    grams = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice(t, i, k)),
    )
    # guard: Spark's sequence(1, m) with m < 1 counts DOWN, not empty
    return F.when(n >= k, grams).otherwise(F.array().cast("array<string>"))


def all_shingles(col: Column | str, k: int = 2) -> Column:
    """Word k-grams WITH multiplicity (repetition analysis needs counts,
    not the distinct dedup unit). Single-expression convenience form —
    hot paths use all_shingles_from_tokens over a projected attribute."""
    return all_shingles_from_tokens(tokens(col), k)


def all_shingles_sql(col: str, k: int = 2) -> str:
    toks = tokens_sql(col)
    return (
        f"list_transform(range(1, greatest(len({toks}) - {k - 1}, 0) + 1), "
        f"i -> array_to_string(list_slice({toks}, i, i + {k - 1}), ' '))"
    )


def repetition_profile(df, id_col: str, text_col: str, k: int = 2):
    """Gopher-style repetition signals per document: total/distinct
    k-gram counts, the most-frequent k-gram's count, duplicate fraction
    and top-gram share.

    Shape: explode k-grams -> two hash aggregations keyed by (doc, gram)
    then (doc) — linear in corpus token count, map-side combinable, and
    the shuffle key includes the doc id so it cannot skew. (A per-row
    nested-HOF formulation avoids the shuffle but re-evaluates the gram
    array per distinct gram — quadratic per document and ~50x slower in
    practice; the relational form is the scale path.)
    """
    from pyspark.sql import functions as F

    # two-step projection: tokenize once per row, THEN gram+explode from
    # the attribute (inlining tokens() re-evaluates it per gram — see
    # shingles_from_tokens)
    grams = df.select(F.col(id_col), tokens(text_col).alias("__toks")).select(
        F.col(id_col), F.explode(all_shingles_from_tokens("__toks", k)).alias("g")
    )
    agg = (
        grams.groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_grams"),
            F.count(F.lit(1)).alias("n_distinct_grams"),
            F.max("cnt").cast("long").alias("top_gram_n"),
        )
    )
    out = df.select(id_col).join(agg, id_col, "left")
    n = F.coalesce(F.col("n_grams"), F.lit(0))
    d = F.coalesce(F.col("n_distinct_grams"), F.lit(0))
    t = F.coalesce(F.col("top_gram_n"), F.lit(0))
    return out.select(
        id_col,
        n.cast("long").alias("n_grams"),
        d.cast("long").alias("n_distinct_grams"),
        t.cast("long").alias("top_gram_n"),
        F.when(n > 0, F.lit(1.0) - d.cast("double") / n.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("dup_gram_frac"),
        F.when(n > 0, t.cast("double") / n.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("top_gram_frac"),
    )


def repetition_profile_sql(table: str, id_col: str, text_col: str, k: int = 2) -> str:
    grams = all_shingles_sql(text_col, k)
    return f"""
WITH g AS (SELECT {id_col}, unnest({grams}) AS g FROM {table}),
c AS (SELECT {id_col}, g, count(*) AS cnt FROM g GROUP BY 1, 2),
a AS (SELECT {id_col},
             CAST(sum(cnt) AS BIGINT) AS n_grams,
             count(*) AS n_distinct_grams,
             CAST(max(cnt) AS BIGINT) AS top_gram_n
      FROM c GROUP BY 1)
SELECT d.{id_col},
       coalesce(n_grams, 0) AS n_grams,
       coalesce(n_distinct_grams, 0) AS n_distinct_grams,
       coalesce(top_gram_n, 0) AS top_gram_n,
       CASE WHEN coalesce(n_grams, 0) > 0
            THEN 1.0 - CAST(n_distinct_grams AS DOUBLE) / CAST(n_grams AS DOUBLE)
            ELSE 0.0 END AS dup_gram_frac,
       CASE WHEN coalesce(n_grams, 0) > 0
            THEN CAST(top_gram_n AS DOUBLE) / CAST(n_grams AS DOUBLE)
            ELSE 0.0 END AS top_gram_frac
FROM {table} d LEFT JOIN a USING ({id_col})
"""


# Gopher quality-rule bundle (Rae et al. 2021, appendix A1.1): the
# document-level filters MassiveText applies before training. Thresholds
# per the paper; every signal is integer/rational arithmetic on the
# shared tokenizer, so both engines produce identical doubles.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MEAN_WORD_LEN_RANGE = (3.0, 10.0)
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8
GOPHER_MIN_STOPWORD_HITS = 2

_GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_signals(col: Column | str) -> dict[str, Column]:
    """The raw per-document signals the Gopher rules threshold.
    NULL text is treated as empty (coalesced on both engines), so every
    signal is well-defined and the pass flag is False, never NULL."""
    c = F.coalesce(_c(col), F.lit(""))
    toks = tokens(c)
    n = F.size(toks)
    nd = n.cast("double")
    safe_n = F.greatest(n, F.lit(1)).cast("double")
    total_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    # '#' and unicode/ascii ellipsis occurrences, counted over raw text
    symbols = (
        F.length(c) - F.length(F.regexp_replace(c, r"#", ""))
        + (F.length(c) - F.length(F.regexp_replace(c, r"\.\.\.|…", ""))) / 3
    )
    stop_hits = F.size(
        F.array_intersect(toks, F.array(*[F.lit(w) for w in _GOPHER_STOPS]))
    )
    return {
        "n_words": n.cast("long"),
        "mean_word_len": total_len.cast("double") / safe_n,
        "symbol_word_ratio": symbols.cast("double") / safe_n,
        "alpha_word_frac": alpha_words.cast("double") / safe_n,
        "stopword_hits": stop_hits.cast("long"),
        "_nd": nd,
    }


def gopher_pass(col: Column | str) -> Column:
    """True when the document clears every Gopher document-level rule."""
    s = gopher_signals(col)
    lo, hi = GOPHER_MEAN_WORD_LEN_RANGE
    return (
        (s["n_words"] >= GOPHER_MIN_WORDS)
        & (s["n_words"] <= GOPHER_MAX_WORDS)
        & (s["mean_word_len"] >= lo)
        & (s["mean_word_len"] <= hi)
        & (s["symbol_word_ratio"] <= GOPHER_MAX_SYMBOL_RATIO)
        & (s["alpha_word_frac"] >= GOPHER_MIN_ALPHA_WORD_FRAC)
        & (s["stopword_hits"] >= GOPHER_MIN_STOPWORD_HITS)
    )


def gopher_signals_sql(col: str) -> dict[str, str]:
    col = f"coalesce({col}, '')"  # NULL text == empty, as in gopher_signals
    toks = tokens_sql(col)
    stops = _sql_array(_GOPHER_STOPS)
    safe_n = f"CAST(greatest(len({toks}), 1) AS DOUBLE)"
    total_len = f"list_sum(list_transform({toks}, t -> length(t)))"
    alpha = f"len(list_filter({toks}, t -> regexp_matches(t, '[a-z]')))"
    symbols = (
        f"(length({col}) - length(replace({col}, '#', ''))"
        f" + (length({col}) - length(regexp_replace({col}, '\\.\\.\\.|…', '', 'g'))) / 3)"
    )
    return {
        "n_words": f"CAST(len({toks}) AS BIGINT)",
        "mean_word_len": f"CAST(coalesce({total_len}, 0) AS DOUBLE) / {safe_n}",
        "symbol_word_ratio": f"CAST({symbols} AS DOUBLE) / {safe_n}",
        "alpha_word_frac": f"CAST({alpha} AS DOUBLE) / {safe_n}",
        "stopword_hits": f"CAST(len(list_intersect({toks}, {stops})) AS BIGINT)",
    }


def gopher_pass_sql(col: str) -> str:
    s = gopher_signals_sql(col)
    lo, hi = GOPHER_MEAN_WORD_LEN_RANGE
    return (
        f"({s['n_words']} >= {GOPHER_MIN_WORDS} AND {s['n_words']} <= {GOPHER_MAX_WORDS}"
        f" AND {s['mean_word_len']} >= {lo!r} AND {s['mean_word_len']} <= {hi!r}"
        f" AND {s['symbol_word_ratio']} <= {GOPHER_MAX_SYMBOL_RATIO!r}"
        f" AND {s['alpha_word_frac']} >= {GOPHER_MIN_ALPHA_WORD_FRAC!r}"
        f" AND {s['stopword_hits']} >= {GOPHER_MIN_STOPWORD_HITS})"
    )
