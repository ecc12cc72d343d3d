"""Statistical language-model scoring over a document corpus.

Perplexity-style quality filtering (CCNet / Gopher style): train bigram
counts on a reference corpus, score every candidate document by its
average per-bigram log-probability under stupid backoff, and gate on
the score.  Plus the two other tokenizer-adjacent count jobs a training
pipeline runs over the lake: TF-IDF term extraction and the first BPE
merge iteration (adjacent-symbol-pair counting).

Extensions beyond the reference's reconciliation surface (BASELINE.json
north star: training-data pipeline operators); built on the shared
tokenizer in ``functions/text.py``.

Cross-engine hash stability
---------------------------
``ln()`` is a transcendental — IEEE does not require it to be
correctly rounded, so Spark (Java ``Math.log``) and the DuckDB oracle
may differ in the last ulp.  Every log here is therefore quantized to a
fixed-point grid BEFORE aggregation: ``floor(1e6 * ln(p))`` as BIGINT.
A 1-ulp disagreement (~1e-15 abs) only changes the floor when the true
value sits within 1e-15 of a 1e-6 grid line — probability ~1e-9 per
evaluation.  The per-document sums are then exact integer arithmetic
(order-independent, map-side combinable), and only the final division
back to a double depends on floats — same operands on both engines,
hence identical quotients.

Scale shape (100 TB corpus)
---------------------------
- Count tables are bounded by the VOCABULARY (unigrams, observed
  bigrams), not the corpus: they live in the shuffle, never the driver.
- Scoring is one explode of the candidate docs + shuffle joins on the
  gram key + one map-side-combinable integer aggregation per doc.
  Hot grams (stopword pairs) are AQE skew-split like every gram join
  in this repo; no broadcast of unbounded gram sets.
- BPE pair counting aggregates (word, count) first — per-word work is
  O(word length) on the DISTINCT vocabulary, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sqlserver_pg_cdc_spark.functions import text as TX

# stupid-backoff discount (Brants et al. 2007) and the fixed-point grid
BACKOFF_ALPHA = 0.4
_FP = 1_000_000


def _fp_log(expr: str) -> str:
    """Fixed-point ``floor(1e6 * ln(x))`` — identical SQL text feeds
    both Spark's and DuckDB's parser (the dialects agree on all of it),
    so the quantized values provably come from the same expression."""
    return f"CAST(floor({_FP} * ln({expr})) AS BIGINT)"


def lm_score(
    train_df: DataFrame,
    score_df: DataFrame,
    id_col: str,
    text_col: str,
    alpha: float = BACKOFF_ALPHA,
) -> DataFrame:
    """Score documents under a bigram stupid-backoff LM trained on
    ``train_df``: ``(id, n_bigrams, avg_logprob)``.

    Per bigram (w1, w2) of a scored document:

    - seen bigram:   S = C(w1 w2) / C(w1)
    - backoff:       S = alpha * (C(w2) + 1) / (N + V)

    where N = total training tokens, V = training vocabulary size (the
    +1/+V Laplace floor keeps OOV words finite).  The score is the mean
    of ``ln S`` over the document's bigrams — higher is more fluent
    under the reference corpus.  Documents with < 2 tokens score NULL
    with ``n_bigrams = 0``.
    """
    uni = (
        train_df.select(F.explode(TX.tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cw"))
    )
    bi = (
        train_df.select(TX.tokens(text_col).alias("__toks"))
        .select(F.explode(TX.all_shingles_from_tokens("__toks", 2)).alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("cg"))
    )
    totals = uni.agg(
        F.sum("cw").alias("n_tokens"), F.count("*").alias("v_size")
    )  # one row — safe broadcast

    doc_bi = score_df.select(
        F.col(id_col), TX.tokens(text_col).alias("__toks")
    ).select(
        F.col(id_col), F.explode_outer(TX.all_shingles_from_tokens("__toks", 2)).alias("g")
    ).withColumn("w1", F.split("g", " ").getItem(0)).withColumn(
        "w2", F.split("g", " ").getItem(1)
    )
    joined = (
        doc_bi.join(bi, "g", "left")
        .join(uni.select(F.col("w").alias("w1"), F.col("cw").alias("c1")), "w1", "left")
        .join(uni.select(F.col("w").alias("w2"), F.col("cw").alias("c2")), "w2", "left")
        .crossJoin(F.broadcast(totals))
    )
    seen = _fp_log("CAST(cg AS DOUBLE) / CAST(c1 AS DOUBLE)")
    backoff = _fp_log(
        f"CAST({alpha!r} AS DOUBLE) * (CAST(coalesce(c2, 0) + 1 AS DOUBLE)"
        " / CAST(n_tokens + v_size AS DOUBLE))"
    )
    lp = F.when(F.col("g").isNull(), F.lit(None).cast("bigint")).otherwise(
        F.when(F.col("cg").isNotNull() & F.col("c1").isNotNull(), F.expr(seen))
        .otherwise(F.expr(backoff))
    )
    return (
        joined.withColumn("lp_fp", lp)
        .groupBy(id_col)
        .agg(
            F.count("g").cast("long").alias("n_bigrams"),
            F.sum("lp_fp").alias("sum_fp"),
        )
        .select(
            id_col,
            "n_bigrams",
            F.when(
                F.col("n_bigrams") > 0,
                F.col("sum_fp").cast("double")
                / (F.col("n_bigrams").cast("double") * F.lit(float(_FP))),
            ).alias("avg_logprob"),
        )
    )


def lm_score_sql(
    train_expr: str,
    score_expr: str,
    id_col: str,
    text_col: str,
    alpha: float = BACKOFF_ALPHA,
) -> str:
    """DuckDB twin of :func:`lm_score` (same fixed-point grid)."""
    toks = TX.tokens_sql(text_col)
    grams = TX.all_shingles_sql(text_col, 2)
    seen = _fp_log("CAST(b.cg AS DOUBLE) / CAST(u1.cw AS DOUBLE)")
    backoff = _fp_log(
        f"CAST({alpha!r} AS DOUBLE) * (CAST(coalesce(u2.cw, 0) + 1 AS DOUBLE)"
        " / CAST(t.n_tokens + t.v_size AS DOUBLE))"
    )
    return f"""
WITH train AS ({train_expr}),
score AS ({score_expr}),
uni AS (
    SELECT w, count(*) AS cw
    FROM (SELECT unnest({toks}) AS w FROM train)
    GROUP BY w
),
bi AS (
    SELECT g, count(*) AS cg
    FROM (SELECT unnest({grams}) AS g FROM train) GROUP BY g
),
totals AS (SELECT sum(cw) AS n_tokens, count(*) AS v_size FROM uni),
doc_bi AS (
    SELECT {id_col}, unnest(gs) AS g
    FROM (SELECT {id_col}, {grams} AS gs FROM score)
),
scored AS (
    SELECT d.{id_col},
           CASE WHEN b.cg IS NOT NULL AND u1.cw IS NOT NULL
                THEN {seen} ELSE {backoff} END AS lp_fp
    FROM doc_bi d
    LEFT JOIN bi b ON d.g = b.g
    LEFT JOIN uni u1 ON string_split(d.g, ' ')[1] = u1.w
    LEFT JOIN uni u2 ON string_split(d.g, ' ')[2] = u2.w
    CROSS JOIN totals t
)
SELECT s.{id_col},
       CAST(count(sc.lp_fp) AS BIGINT) AS n_bigrams,
       CASE WHEN count(sc.lp_fp) > 0
            THEN CAST(sum(sc.lp_fp) AS DOUBLE)
                 / (CAST(count(sc.lp_fp) AS DOUBLE) * {float(_FP)!r})
       END AS avg_logprob
FROM score s
LEFT JOIN scored sc ON s.{id_col} = sc.{id_col}
GROUP BY s.{id_col}
"""


def tfidf_top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_k: int = 3,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document:
    ``(id, term, tf, score, rank)``.

    ``score = tf * floor(1e6 * ln(N / df(term))) / 1e6`` — the idf is
    fixed-point-quantized so ranking (and the emitted double) is exact
    integer arithmetic, bit-stable across engines.  Ties break by term
    (ascending) for a deterministic ranking.

    Scale: explode → (doc, term) counts → term df counts (vocabulary-
    bounded) → shuffle join on term → per-doc window top-k.  Linear in
    corpus tokens; the window partitions on the document id, never
    globally.
    """
    terms = df.select(F.col(id_col), F.explode(TX.tokens(text_col)).alias("term"))
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.agg(F.count("*").alias("n_docs"))  # one row
    idf = _fp_log("CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)")
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score_fp", F.col("tf") * F.expr(idf))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_fp").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            id_col,
            "term",
            F.col("tf").cast("long").alias("tf"),
            (F.col("score_fp").cast("double") / F.lit(float(_FP))).alias("score"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def tfidf_top_terms_sql(
    table_expr: str, id_col: str, text_col: str, top_k: int = 3
) -> str:
    toks = TX.tokens_sql(text_col)
    idf = _fp_log("CAST(n.n_docs AS DOUBLE) / CAST(d.df AS DOUBLE)")
    return f"""
WITH src AS ({table_expr}),
terms AS (
    SELECT {id_col}, unnest({toks}) AS term FROM src
),
tf AS (SELECT {id_col}, term, count(*) AS tf FROM terms GROUP BY {id_col}, term),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM src),
scored AS (
    SELECT tf.{id_col}, tf.term, tf.tf, tf.tf * {idf} AS score_fp
    FROM tf JOIN dfreq d ON tf.term = d.term CROSS JOIN n
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY {id_col} ORDER BY score_fp DESC, term ASC) AS rank
    FROM scored
)
SELECT {id_col}, term, CAST(tf AS BIGINT) AS tf,
       CAST(score_fp AS DOUBLE) / {float(_FP)!r} AS score,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {top_k}
"""


def bpe_pair_counts(
    df: DataFrame,
    text_col: str,
    top_k: int = 20,
) -> DataFrame:
    """The first BPE merge iteration over the corpus: count adjacent
    character pairs inside words, weighted by word frequency —
    ``(pair, n_words, total_count, rank)``, the ``top_k`` most frequent.

    Scale: one explode to words, one (word → count) aggregation —
    everything after runs on the DISTINCT vocabulary (bounded), with
    per-word work O(len).  This is exactly how BPE/unigram tokenizer
    training distributes its count phase; iterating merges would loop
    this operator over re-segmented symbol sequences.
    """
    words = (
        df.select(F.explode(TX.tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
    )
    # filter BEFORE the transform: Spark's sequence(1, m) with m < 1
    # counts DOWN (same guard as functions/text.py shingles)
    pairs = words.filter(F.length("w") >= 2).select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
        "wc",
    )
    agg = pairs.groupBy("pair").agg(
        F.count("*").cast("long").alias("n_words"),
        F.sum("wc").cast("long").alias("total_count"),
    )
    # top-k first (TakeOrderedAndProject — no global window over the
    # full pair table), then rank the <= k survivors
    top = agg.orderBy(F.col("total_count").desc(), F.col("pair").asc()).limit(top_k)
    w_rank = Window.orderBy(F.col("total_count").desc(), F.col("pair").asc())
    return top.withColumn("rank", F.row_number().over(w_rank).cast("long"))


def bpe_pair_counts_sql(table_expr: str, text_col: str, top_k: int = 20) -> str:
    toks = TX.tokens_sql(text_col)
    return f"""
WITH words AS (
    SELECT w, count(*) AS wc
    FROM (SELECT unnest({toks}) AS w FROM ({table_expr}))
    GROUP BY w
),
pairs AS (
    SELECT unnest(list_transform(range(1, length(w)),
                  i -> substr(w, CAST(i AS INT), 2))) AS pair, wc
    FROM words WHERE length(w) >= 2
),
agg AS (
    SELECT pair, CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(wc) AS BIGINT) AS total_count
    FROM pairs GROUP BY pair
),
ranked AS (
    SELECT *, CAST(row_number() OVER (
        ORDER BY total_count DESC, pair ASC) AS BIGINT) AS rank
    FROM agg
)
SELECT pair, n_words, total_count, rank FROM ranked WHERE rank <= {top_k}
"""


def _merge_fold_expr(syms_col: str, a: str, b: str) -> str:
    """One BPE merge applied to a symbol array: leftmost-first,
    non-overlapping (the fold consumes the merged token, so 'aaa' under
    ('a','a') becomes ['aa','a'] — standard BPE semantics)."""

    def q(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    ab = q(a + b)
    return (
        f"aggregate({syms_col}, CAST(array() AS ARRAY<STRING>), (acc, x) -> "
        f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = {q(a)} AND x = {q(b)} "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array({ab})) "
        f"ELSE concat(acc, array(x)) END)"
    )


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int = 8,
) -> list[tuple[str, str]]:
    """Train ``n_merges`` BPE merges over the corpus: the distributed
    count phase of tokenizer training, iterated.

    Each round counts adjacent symbol pairs over the DISTINCT
    vocabulary (weighted by word frequency), takes the most frequent
    pair (ties break lexicographically), and re-segments the vocabulary
    with one fold expression — per-round work is O(vocab x word length),
    never O(corpus), exactly how industrial BPE training distributes.
    Only the single winning pair crosses to the driver per round.

    Returns the ordered merge list [(left, right), ...].
    """
    words = (
        df.select(F.explode(TX.tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
        .withColumn("syms", F.expr("transform(split(w, ''), x -> x)"))
        .select("wc", "syms")
        .localCheckpoint()
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = (
            # filter BEFORE the transform: sequence(1, m) counts DOWN
            # for single-symbol words (m = 0)
            words.filter(F.size("syms") >= 2)
            .select(
                "wc",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> struct(element_at(syms, i) AS a, "
                        "element_at(syms, i + 1) AS b))"
                    )
                ).alias("p"),
            )
            .groupBy("p")
            .agg(F.sum("wc").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("p.a").asc(), F.col("p.b").asc())
            .limit(1)
            .collect()
        )
        if not pairs:
            break
        a, b = pairs[0]["p"]["a"], pairs[0]["p"]["b"]
        merges.append((a, b))
        words = words.select(
            "wc", F.expr(_merge_fold_expr("syms", a, b)).alias("syms")
        ).localCheckpoint()
    return merges


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize with a trained merge list: whitespace pre-tokenize,
    split to characters, apply every merge in training order — ONE
    projection of chained fold expressions, no shuffle, no Python.
    Appends ``out_col`` (array<string> of subword tokens, word
    boundaries preserved) and ``{out_col}_count``."""
    seg = "transform(split(x, ''), c -> c)"  # word -> initial chars
    for a, b in merges:
        seg = _merge_fold_expr(f"({seg})", a, b)
    out = F.expr(f"flatten(transform(__toks, x -> {seg}))")
    return (
        df.withColumn("__toks", TX.tokens(text_col))
        .withColumn(out_col, out)
        .withColumn(f"{out_col}_count", F.size(out_col).cast("long"))
        .drop("__toks")
    )
