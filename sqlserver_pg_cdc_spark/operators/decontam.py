"""Benchmark decontamination: flag training documents that share word
k-grams with an evaluation/benchmark set.

The standard pre-training hygiene step (GPT-3 appendix C / PaLM style):
any training document containing an n-gram that also appears in a held
-out benchmark is contaminated — keeping it inflates eval scores. The
operator is an extension beyond the reference's reconciliation surface
(BASELINE.json north star: training-data pipeline operators), built on
the same shingle machinery as the dedup family (functions/text.py).

Scale shape (the corpus is the 100 TB side, the eval set is merely
"smaller", often still millions of grams):

- eval k-grams: one explode + distinct, shuffled on the gram;
- corpus k-grams: one explode — the expensive pass, done ONCE;
- ONE shuffle join on the gram (NO broadcast by default: a full eval
  suite's gram set does not fit a driver; pass ``broadcast_eval=True``
  only when it provably does), then ONE aggregation producing both the
  per-doc gram count and the hit count. Hot grams (stopword runs) are
  AQE skew-split, same as the boilerplate detector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.functions import text as TX


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_hits: int = 1,
    broadcast_eval: bool = False,
) -> DataFrame:
    """Per-corpus-document contamination report:
    ``(id, n_grams, n_eval_hits, contam_frac, contaminated)``.

    ``n_grams`` counts the document's DISTINCT k-grams (shingles are
    distinct-per-doc); ``n_eval_hits`` counts how many of those occur
    anywhere in ``eval_df``; ``contaminated`` is the ``min_hits``
    threshold flag. Documents with fewer than k tokens have no k-grams
    and are reported clean with n_grams = 0."""
    # two-step projections (tokens, then grams-from-attribute): the
    # inlined form re-runs the tokenizer per gram — see shingles_from_tokens
    eval_grams = eval_df.select(TX.tokens(text_col).alias("__toks")).select(
        F.explode(TX.shingles_from_tokens("__toks", k)).alias("g")
    )
    return decontaminate_against_grams(
        corpus, eval_grams, id_col, text_col, k=k, min_hits=min_hits,
        broadcast_eval=broadcast_eval,
    )


def decontaminate_against_grams(
    corpus: DataFrame,
    eval_grams: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_hits: int = 1,
    broadcast_eval: bool = False,
) -> DataFrame:
    """`decontaminate` against an ALREADY-extracted eval gram frame
    ``(g)`` — the seam the streamed eval index uses: its stored gram
    arrays explode straight into this join, no eval re-tokenize."""
    eval_grams = eval_grams.select("g").distinct().withColumn("__hit", F.lit(1))
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)
    doc_grams = corpus.select(
        F.col(id_col), TX.tokens(text_col).alias("__toks")
    ).select(
        F.col(id_col), F.explode_outer(TX.shingles_from_tokens("__toks", k)).alias("g")
    )
    per_doc = (
        doc_grams.join(eval_grams, "g", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.col("g")).cast("long").alias("n_grams"),
            F.count_if(F.col("__hit").isNotNull()).cast("long").alias("n_eval_hits"),
        )
    )
    return per_doc.select(
        id_col,
        "n_grams",
        "n_eval_hits",
        F.when(
            F.col("n_grams") > 0,
            F.col("n_eval_hits").cast("double") / F.col("n_grams").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("contam_frac"),
        (F.col("n_eval_hits") >= min_hits).alias("contaminated"),
    )


def decontaminate_sql(
    corpus_sql: str,
    eval_sql: str,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_hits: int = 1,
) -> str:
    """DuckDB oracle twin (validation scale)."""
    grams = TX.shingles_sql(text_col, k)
    return f"""
WITH eg AS (
    SELECT DISTINCT unnest({grams}) AS g FROM ({eval_sql})
),
dg AS (
    SELECT {id_col}, unnest(
        CASE WHEN len({grams}) = 0 THEN [NULL] ELSE {grams} END
    ) AS g
    FROM ({corpus_sql})
),
per_doc AS (
    SELECT {id_col},
           count(g) AS n_grams,
           count(*) FILTER (WHERE g IN (SELECT g FROM eg)) AS n_eval_hits
    FROM dg GROUP BY {id_col}
)
SELECT {id_col},
       CAST(n_grams AS BIGINT) AS n_grams,
       CAST(n_eval_hits AS BIGINT) AS n_eval_hits,
       CASE WHEN n_grams > 0
            THEN CAST(n_eval_hits AS DOUBLE) / CAST(n_grams AS DOUBLE)
            ELSE 0.0 END AS contam_frac,
       n_eval_hits >= {min_hits} AS contaminated
FROM per_doc
"""
