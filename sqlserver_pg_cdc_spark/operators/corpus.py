"""Corpus-preparation operators for training-data pipelines:
segment-level dedup, context-window chunking.

These complete the document-level dedup family (``operators/dedup.py``)
one level down: real pipelines (CCNet, RefinedWeb) remove *repeated
spans* — boilerplate lines, shared headers — from otherwise-unique
documents, then re-cut the survivors into model-context-sized chunks.

Scale shape: everything here is explode -> hash-keyed aggregation ->
anti-join -> per-doc rebuild; every shuffle keys on the segment text or
the doc id, both bounded-cardinality keys, and all aggregations are
map-side combinable. No driver state, no UDFs — pure Catalyst
expressions, so the whole family stays inside whole-stage codegen.

Each operator ships a DuckDB SQL twin (the cross-engine oracle the
driver's correctness gate runs); the Python and SQL forms share one
recurrence so they stay bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.functions import text as TX


def segment_frame(
    df: DataFrame, id_col: str, text_col: str, seg_tokens: int
) -> DataFrame:
    """(doc, pos, seg): the document cut into DISJOINT ``seg_tokens``-token
    windows (the last one may be shorter). Empty docs produce no rows."""
    seg = int(seg_tokens)
    # two-step projection: tokenize once per row; the slice lambda then
    # captures a cheap attribute (inlined tokens() would re-run the
    # tokenizer per segment — see TX.shingles_from_tokens)
    base = df.select(F.col(id_col).alias("doc"), TX.tokens(text_col).alias("__toks"))
    toks = F.col("__toks")
    nseg = F.ceil(F.size(toks).cast("double") / F.lit(float(seg))).cast("int")
    # sequence(0, -1) would generate a DESCENDING range — guard empties
    arr = F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(0), nseg - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i * seg + 1, seg)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return base.select("doc", F.posexplode(arr).alias("pos", "seg"))


def _segment_frame_sql(table: str, id_col: str, text_col: str, seg_tokens: int) -> str:
    seg = int(seg_tokens)
    toks = TX.tokens_sql(text_col)
    return f"""
SELECT doc, unnest(segs) AS seg, unnest(range(0, len(segs))) AS pos
FROM (
    SELECT doc,
           list_transform(
               range(0, CAST(ceil(CAST(len(toks) AS DOUBLE) / {seg}.0) AS BIGINT)),
               i -> array_to_string(list_slice(toks, i * {seg} + 1, i * {seg} + {seg}), ' ')
           ) AS segs
    FROM (SELECT {id_col} AS doc, {toks} AS toks FROM {table})
)
"""


def segment_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seg_tokens: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document segment-level exact dedup (the line-dedup of
    CCNet/RefinedWeb, with fixed token windows standing in for lines):
    any ``seg_tokens``-token segment whose exact text appears in >=
    ``min_docs`` DISTINCT documents is removed from every document, and
    the survivors are re-concatenated in order.

    Returns one row per input document:
    ``(id, clean_text, n_segments, n_removed)`` — docs whose every
    segment was removed (or that were empty) come back with
    ``clean_text = ''``.

    Plan: one segment explode feeding (a) the document-frequency
    aggregation — (seg, doc) distinct then count, both map-side
    combinable, keyed on the segment hash — and (b) a left_anti join
    against the common-segment set (a plain shuffle join; the common
    set is unbounded at corpus scale, so it is never broadcast), then a
    per-doc ``array_sort(collect_list(struct(pos, seg)))`` rebuild.
    Reference analog: the reference validates row-level content equality
    (`src/core/validators/row_validator.py`); this is the corpus-hygiene
    generalization of the same exact-hash comparison."""
    segs = segment_frame(df, id_col, text_col, seg_tokens)
    docfreq = (
        segs.select("seg", "doc")
        .distinct()
        .groupBy("seg")
        .agg(F.count(F.lit(1)).alias("dfreq"))
    )
    common = docfreq.filter(F.col("dfreq") >= int(min_docs)).select("seg")
    kept = segs.join(common, "seg", "left_anti")
    rebuilt = kept.groupBy("doc").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda x: x["seg"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    counts = segs.groupBy("doc").agg(F.count(F.lit(1)).alias("n_segments"))
    return (
        df.select(F.col(id_col).alias("doc"))
        .join(counts, "doc", "left")
        .join(rebuilt, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            F.coalesce(F.col("n_segments"), F.lit(0)).cast("long").alias("n_segments"),
            (
                F.coalesce(F.col("n_segments"), F.lit(0))
                - F.coalesce(F.col("n_kept"), F.lit(0))
            )
            .cast("long")
            .alias("n_removed"),
        )
    )


def segment_dedup_sql(
    table: str,
    id_col: str,
    text_col: str,
    seg_tokens: int = 8,
    min_docs: int = 2,
) -> str:
    """DuckDB twin of :func:`segment_dedup` (same segmentation, same
    document-frequency rule, same ordered rebuild)."""
    segs = _segment_frame_sql(table, id_col, text_col, seg_tokens)
    return f"""
WITH segs AS ({segs}),
docfreq AS (
    SELECT seg, count(*) AS dfreq
    FROM (SELECT DISTINCT seg, doc FROM segs) GROUP BY seg
),
common AS (SELECT seg FROM docfreq WHERE dfreq >= {int(min_docs)}),
kept AS (SELECT * FROM segs WHERE seg NOT IN (SELECT seg FROM common)),
reb AS (
    SELECT doc, string_agg(seg, ' ' ORDER BY pos) AS clean_text,
           count(*) AS n_kept
    FROM kept GROUP BY doc
),
cnt AS (SELECT doc, count(*) AS n_segments FROM segs GROUP BY doc)
SELECT b.{id_col},
       coalesce(r.clean_text, '') AS clean_text,
       CAST(coalesce(c.n_segments, 0) AS BIGINT) AS n_segments,
       CAST(coalesce(c.n_segments, 0) - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed
FROM {table} b
LEFT JOIN cnt c ON b.{id_col} = c.doc
LEFT JOIN reb r ON b.{id_col} = r.doc
"""


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """Cut documents into model-context-sized token windows with
    ``overlap`` tokens of context carried between consecutive chunks
    (the pre-tokenization step before sequence packing).

    Chunks start at positions 0, stride, 2*stride, ... with
    ``stride = chunk_tokens - overlap``; a document of n <= chunk_tokens
    tokens yields exactly one chunk; empty documents yield none.

    Returns ``(id, chunk_id, n_tokens, chunk_text)``. Pure per-row
    expression work riding the scan (tokenize + sequence + slice —
    no shuffle at all); downstream packing (`operators/packing.py`)
    handles the bin assignment."""
    chunk = int(chunk_tokens)
    stride = chunk - int(overlap)
    if stride <= 0:
        raise ValueError("chunk_tokens must exceed overlap")
    # two-step projection: tokenize once per row (see segment_frame)
    base = df.select(F.col(id_col), TX.tokens(text_col).alias("__toks"))
    toks = F.col("__toks")
    n = F.size(toks)
    nchunks = (
        F.when(n <= 0, F.lit(0))
        .when(n <= chunk, F.lit(1))
        .otherwise(
            F.ceil((n - F.lit(chunk)).cast("double") / F.lit(float(stride))).cast("int")
            + 1
        )
    )
    arr = F.when(
        nchunks > 0,
        F.transform(
            F.sequence(F.lit(0), nchunks - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i * stride + 1, chunk)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    out = base.select(
        F.col(id_col),
        n.alias("__n"),
        F.posexplode(arr).alias("chunk_id", "chunk_text"),
    )
    return out.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.least(F.lit(chunk), F.col("__n") - F.col("chunk_id") * stride)
        .cast("long")
        .alias("n_tokens"),
        "chunk_text",
    )


def chunk_documents_sql(
    table: str,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 32,
    overlap: int = 8,
) -> str:
    """DuckDB twin of :func:`chunk_documents`."""
    chunk = int(chunk_tokens)
    stride = chunk - int(overlap)
    if stride <= 0:
        raise ValueError("chunk_tokens must exceed overlap")
    toks = TX.tokens_sql(text_col)
    nchunks = (
        f"CASE WHEN len(toks) <= 0 THEN 0 WHEN len(toks) <= {chunk} THEN 1 "
        f"ELSE CAST(ceil(CAST(len(toks) - {chunk} AS DOUBLE) / {stride}.0) AS BIGINT) + 1 END"
    )
    return f"""
SELECT {id_col},
       CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(least({chunk}, n - chunk_id * {stride}) AS BIGINT) AS n_tokens,
       chunk_text
FROM (
    SELECT {id_col}, len(toks) AS n,
           unnest(range(0, {nchunks})) AS chunk_id,
           unnest(list_transform(
               range(0, {nchunks}),
               i -> array_to_string(
                   list_slice(toks, i * {stride} + 1, i * {stride} + {chunk}), ' ')
           )) AS chunk_text
    FROM (SELECT {id_col}, {toks} AS toks FROM {table})
)
"""


def window_hash_frame(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """(doc, pos, wh): every OVERLAPPING ``k``-token window of each
    document, keyed by the md5 of its text (the cross-engine hash
    family; the window string itself never leaves the projection, so
    the shuffled frame is O(tokens x 16B) rather than O(tokens x k) —
    the payload discipline that makes overlapping-window scans viable
    at corpus scale). Docs shorter than ``k`` tokens produce no rows."""
    kk = int(k)
    base = df.select(F.col(id_col).alias("doc"), TX.tokens(text_col).alias("__toks"))
    toks = F.col("__toks")
    nwin = F.size(toks) - F.lit(kk - 1)
    arr = F.when(
        nwin > 0,
        F.transform(
            F.sequence(F.lit(0), nwin - 1),
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, kk))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return base.select("doc", F.posexplode(arr).alias("pos", "wh"))


def _window_hash_frame_sql(table: str, id_col: str, text_col: str, k: int) -> str:
    kk = int(k)
    toks = TX.tokens_sql(text_col)
    return f"""
SELECT doc, pos,
       md5(array_to_string(list_slice(toks, pos + 1, pos + {kk}), ' ')) AS wh
FROM (
    SELECT doc, toks,
           unnest(range(0, greatest(len(toks) - {kk - 1}, 0))) AS pos
    FROM (SELECT {id_col} AS doc, {toks} AS toks FROM {table})
)
"""


def duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Exact-substring duplicate spans (the Lee et al. 2022
    'Deduplicating Training Data' shape, with overlapping token-window
    hashing standing in for the suffix array): every MAXIMAL token span
    covered by ``k``-token windows whose exact text recurs in >=
    ``min_docs`` distinct documents.

    Returns ``(id, span_start, span_end, n_windows)`` — token offsets,
    end exclusive; one row per maximal span. Overlapping duplicate
    windows merge by gaps-and-islands: a new span starts where the gap
    to the previous duplicate window exceeds ``k`` (contiguous coverage
    breaks). Unlike :func:`segment_dedup` (disjoint windows = line
    dedup), this catches duplicated passages at ANY token alignment.

    Plan: one window explode (md5-keyed, O(tokens x 16B)) feeding the
    document-frequency aggregation and a semi-join back; the island
    numbering is one per-doc window pass keyed on the doc id. All
    shuffles key on window hash or doc — bounded, skew-resistant keys."""
    from pyspark.sql import Window as W

    wins = window_hash_frame(df, id_col, text_col, k)
    docfreq = (
        wins.select("wh", "doc")
        .distinct()
        .groupBy("wh")
        .agg(F.count(F.lit(1)).alias("dfreq"))
    )
    common = docfreq.filter(F.col("dfreq") >= int(min_docs)).select("wh")
    dup = wins.join(common, "wh", "left_semi").select("doc", "pos")
    w = W.partitionBy("doc").orderBy("pos")
    brk = F.when(
        F.lag("pos").over(w).isNull()
        | ((F.col("pos") - F.lag("pos").over(w)) > int(k)),
        1,
    ).otherwise(0)
    islands = dup.withColumn("__brk", brk).withColumn(
        "__island", F.sum("__brk").over(w)
    )
    return (
        islands.groupBy("doc", "__island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + int(k)).cast("long").alias("span_end"),
            F.count(F.lit(1)).cast("long").alias("n_windows"),
        )
        .select(
            F.col("doc").alias(id_col), "span_start", "span_end", "n_windows"
        )
    )


def duplicate_spans_sql(
    table: str, id_col: str, text_col: str, k: int = 8, min_docs: int = 2
) -> str:
    """DuckDB twin of :func:`duplicate_spans` (same md5 window keys,
    same gaps-and-islands recurrence)."""
    kk = int(k)
    wins = _window_hash_frame_sql(table, id_col, text_col, kk)
    return f"""
WITH wins AS ({wins}),
common AS (
    SELECT wh FROM (
        SELECT wh, count(*) AS dfreq
        FROM (SELECT DISTINCT wh, doc FROM wins) GROUP BY wh
    ) WHERE dfreq >= {int(min_docs)}
),
dup AS (SELECT w.doc, w.pos FROM wins w JOIN common USING (wh)),
flagged AS (
    SELECT doc, pos,
           CASE WHEN lag(pos) OVER (PARTITION BY doc ORDER BY pos) IS NULL
                  OR pos - lag(pos) OVER (PARTITION BY doc ORDER BY pos) > {kk}
                THEN 1 ELSE 0 END AS brk
    FROM dup
),
isl AS (
    SELECT doc, pos,
           sum(brk) OVER (PARTITION BY doc ORDER BY pos
                          ROWS UNBOUNDED PRECEDING) AS island
    FROM flagged
)
SELECT doc AS {id_col},
       CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(pos) + {kk} AS BIGINT) AS span_end,
       CAST(count(*) AS BIGINT) AS n_windows
FROM isl
GROUP BY doc, island
"""


def strip_duplicate_spans_sql(
    table: str, id_col: str, text_col: str, k: int = 8, min_docs: int = 2
) -> str:
    """DuckDB twin of the find->strip composition (duplicate_spans +
    strip_duplicate_spans): the end-to-end path a Lee-et-al-style
    pipeline actually runs, hash-pinned cross-engine."""
    spans = duplicate_spans_sql(table, id_col, text_col, k, min_docs)
    toks = TX.tokens_sql(text_col)
    return f"""
WITH spans AS ({spans}),
toks AS (
    SELECT doc, pos, tk[pos + 1] AS tok
    FROM (
        SELECT doc, tk, unnest(range(0, len(tk))) AS pos
        FROM (SELECT {id_col} AS doc, {toks} AS tk FROM {table})
    )
),
kept AS (
    SELECT t.doc, t.pos, t.tok FROM toks t
    WHERE NOT EXISTS (
        SELECT 1 FROM spans s
        WHERE s.{id_col} = t.doc
          AND t.pos >= s.span_start AND t.pos < s.span_end
    )
),
rebuilt AS (
    SELECT doc, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
           count(*) AS n_kept
    FROM kept GROUP BY doc
),
totals AS (SELECT doc, count(*) AS n_tokens FROM toks GROUP BY doc)
SELECT d.{id_col},
       coalesce(r.clean_text, '') AS clean_text,
       CAST(coalesce(tt.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(tt.n_tokens, 0) - coalesce(r.n_kept, 0) AS BIGINT)
           AS n_removed
FROM (SELECT {id_col} FROM {table}) d
LEFT JOIN totals tt ON tt.doc = d.{id_col}
LEFT JOIN rebuilt r ON r.doc = d.{id_col}
"""


def strip_duplicate_spans(
    df: DataFrame, spans: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Rebuild each document with its duplicate spans REMOVED (the
    apply step of exact-substring dedup): tokens whose offset falls in
    any of the doc's spans are dropped, survivors re-concatenated in
    order. Returns ``(id, clean_text, n_tokens, n_removed)``.

    The span join keys on the doc id (spans per doc are few), so the
    range predicate rides an equi-join — no cartesian anywhere."""
    toks = df.select(
        F.col(id_col).alias("doc"), TX.tokens(text_col).alias("__toks")
    ).select("doc", F.posexplode_outer("__toks").alias("pos", "tok"))
    sp = spans.select(
        F.col(id_col).alias("doc"), "span_start", "span_end"
    )
    hit = (
        toks.join(
            sp,
            (toks.doc == sp.doc)
            & (toks.pos >= sp.span_start)
            & (toks.pos < sp.span_end),
            "left_semi",
        )
    )
    kept = toks.join(hit, ["doc", "pos"], "left_anti").filter(
        F.col("tok").isNotNull()
    )
    rebuilt = kept.groupBy("doc").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda x: x["tok"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = toks.filter(F.col("tok").isNotNull()).groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_tokens")
    )
    return (
        df.select(F.col(id_col).alias("doc"))
        .join(totals, "doc", "left")
        .join(rebuilt, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            (
                F.coalesce("n_tokens", F.lit(0)) - F.coalesce("n_kept", F.lit(0))
            ).cast("long").alias("n_removed"),
        )
    )
