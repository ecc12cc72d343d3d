"""Bloom-filter membership sketch over document content fingerprints.

The ingest-time exact-dedup PRE-FILTER: before an exact-dup join against
a 100 TB standing corpus, probe each new document's fingerprint against
a Bloom sketch of the corpus. A negative probe (the overwhelming
majority of a fresh crawl) skips the corpus join entirely; only probe
positives — true duplicates plus a tunable false-positive sliver — pay
the point lookup. Mirrors the reference's "cheap guard before the
expensive comparison" pattern (count compare before checksum compare,
``SURVEY.md §2.4`` A5/A6) at the document-membership level.

Representation: one row per 62-bit word, ``(word_idx, word)``. Sparse —
unset words are absent — so a sketch's size is bounded by min(set bits,
``n_words``) rows, it shuffles on ``word_idx``, and two sketches merge
with one ``bit_or`` aggregation (decomposable state, same law the
continuous-aggregate states follow). 62 bits per word because DuckDB's
``<<`` raises on a 63-bit shift (sign overflow) — capping at bit 61
keeps every word positive and bit-identical on both engines.

Hash family: the classic two-hash construction over the fingerprint's
md5 (same scheme as the MinHash signatures in ``operators/dedup.py``):
``pos_i = (a + i*b) mod m`` with (a, b) the two 48-bit md5 halves.
Bloom guarantees NO false negatives for any (k, m); false-positive rate
is ``(1 - e^(-k*n/m))^k``, fully deterministic here because the hash
stream is md5-derived (no RNG) — both engines compute identical bits,
so even the false positives match the oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.functions.text import fingerprint, fingerprint_sql

_WORD_BITS = 62  # DuckDB's BIGINT << raises at 63 (sign overflow)


def _positions(fp_col, n_words: int, k: int) -> list:
    """k bit positions in [0, n_words*62) from a fingerprint column.

    ``b`` is forced odd (``b | 1``): m = n_words*62 is even, so an odd
    step can never be ≡ 0 (mod m) and the double-hash family never
    degenerates to a single probe position.
    """
    m = n_words * _WORD_BITS
    a = F.conv(F.substring(fp_col, 1, 12), 16, 10).cast("bigint")
    b = F.conv(F.substring(fp_col, 13, 12), 16, 10).cast("bigint").bitwiseOR(
        F.lit(1)
    )
    return [F.pmod(a + F.lit(i) * b, F.lit(m)) for i in range(k)]


def _positions_sql(fp_sql: str, n_words: int, k: int) -> str:
    """SQL list of the same k positions (DuckDB); same ``b | 1`` family."""
    m = n_words * _WORD_BITS
    a = f"(('0x' || substr({fp_sql}, 1, 12))::BIGINT)"
    b = f"((('0x' || substr({fp_sql}, 13, 12))::BIGINT) | 1)"
    return "[" + ", ".join(f"(({a} + {i} * {b}) % {m})" for i in range(k)) + "]"


def bloom_build(
    df: DataFrame, text_col: str, n_words: int = 1024, k: int = 5
) -> DataFrame:
    """Sparse Bloom sketch ``(word_idx, word)`` over content fingerprints.

    One explode (k positions per doc) + one ``bit_or`` aggregation keyed
    on the word index — map-side combinable, bounded output
    (≤ ``n_words`` rows regardless of corpus size). At warehouse scale
    the sketch is written to a table at ingest and merged per partition
    with :func:`bloom_merge`.
    """
    pos = df.select(
        F.explode(
            F.array(*_positions(fingerprint(text_col), n_words, k))
        ).alias("pos")
    )
    return (
        pos.select(
            (F.col("pos") / _WORD_BITS).cast("bigint").alias("word_idx"),
            # F.shiftleft only takes a literal shift amount — go through
            # the SQL form for a column-valued shift
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_WORD_BITS} AS INT))"
            ).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )


def bloom_build_sql(
    select_sql: str, text_col: str, n_words: int = 1024, k: int = 5
) -> str:
    """DuckDB twin of :func:`bloom_build` (``select_sql`` is a relation)."""
    pos_list = _positions_sql(fingerprint_sql(text_col), n_words, k)
    return f"""
SELECT (pos // {_WORD_BITS}) AS word_idx,
       bit_or(1::BIGINT << (pos % {_WORD_BITS})::INT) AS word
FROM (SELECT unnest({pos_list}) AS pos FROM ({select_sql}))
GROUP BY word_idx
"""


def bloom_probe(
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    bloom_df: DataFrame,
    n_words: int = 1024,
    k: int = 5,
) -> DataFrame:
    """``(id, maybe_present)`` for each new document against a sketch.

    ``maybe_present = false`` is definitive (no false negatives): the
    document is NOT in the corpus and skips the dedup join entirely.
    ``true`` means "send to the exact check" (true dup or a
    deterministic false positive at the configured ``(n_words, k)``
    rate).

    Shape: per (doc, word) required-bit masks (k rows/doc collapsing to
    ≤ k words), one equi-join against the sketch on ``word_idx`` (the
    sketch side is ≤ ``n_words`` rows — broadcastable at any corpus
    size), then a ``bool_and`` roll-up per doc. Work ∝ new batch,
    never the corpus.
    """
    pos = new_df.select(
        F.col(id_col),
        F.explode(
            F.array(*_positions(fingerprint(text_col), n_words, k))
        ).alias("pos"),
    )
    need = (
        pos.select(
            F.col(id_col),
            (F.col("pos") / _WORD_BITS).cast("bigint").alias("word_idx"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_WORD_BITS} AS INT))"
            ).alias("bit"),
        )
        .groupBy(id_col, "word_idx")
        .agg(F.bit_or("bit").alias("need"))
    )
    joined = need.join(F.broadcast(bloom_df), "word_idx", "left")
    ok = (
        F.coalesce(F.col("word"), F.lit(0).cast("bigint")).bitwiseAND(F.col("need"))
        == F.col("need")
    )
    return (
        joined.select(F.col(id_col), ok.alias("ok"))
        .groupBy(id_col)
        .agg(F.bool_and("ok").alias("maybe_present"))
    )


def bloom_probe_sql(
    new_sql: str,
    id_col: str,
    text_col: str,
    bloom_sql: str,
    n_words: int = 1024,
    k: int = 5,
) -> str:
    """DuckDB twin of :func:`bloom_probe`."""
    pos_list = _positions_sql(fingerprint_sql(text_col), n_words, k)
    return f"""
WITH bloom AS ({bloom_sql}),
pos AS (
    SELECT {id_col}, unnest({pos_list}) AS pos FROM ({new_sql})
),
need AS (
    SELECT {id_col}, (pos // {_WORD_BITS}) AS word_idx,
           bit_or(1::BIGINT << (pos % {_WORD_BITS})::INT) AS need
    FROM pos GROUP BY {id_col}, word_idx
)
SELECT n.{id_col},
       bool_and((coalesce(b.word, 0) & n.need) = n.need) AS maybe_present
FROM need n LEFT JOIN bloom b ON n.word_idx = b.word_idx
GROUP BY n.{id_col}
"""


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two sketches built with the same (n_words, k): one
    ``bit_or`` re-aggregation. ``merge(bloom(A), bloom(B)) ==
    bloom(A ∪ B)`` exactly — the property that lets per-shard sketches
    build in parallel and roll up hierarchically."""
    return (
        a.unionByName(b).groupBy("word_idx").agg(F.bit_or("word").alias("word"))
    )
