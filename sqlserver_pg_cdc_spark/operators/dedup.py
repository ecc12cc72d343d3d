"""Document deduplication for training-data pipelines.

Five families, each designed for 100 TB scale:

- exact: one hash-groupBy on the content fingerprint (map-side combine,
  single shuffle on a 128-bit key).
- n-gram Jaccard: shingle-set similarity join, blocked to avoid the O(n²)
  cross product.
- MinHash + LSH: per-doc signature via one explode+groupBy pass (k min
  aggregates), banded into buckets, candidate pairs from equi-joins on
  the band key — the classic sub-quadratic near-dup path.
- SimHash: 60-bit sign-aggregated token hashes; near-dups share the
  simhash (or differ in few bits).
- embedding cosine: near-dup pairs above a cosine threshold, label-blocked
  here; the ANN machinery lives in operators/similarity.py.

Every hash is md5-derived so the DuckDB oracle can reproduce results
bit-for-bit (Spark's xxhash64/hash have no DuckDB twin). At production
scale, swap ``_hex_to_long``'s md5 for xxhash64 — one line, same plan
shape, no oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.functions.text import (
    fingerprint,
    fingerprint_sql,
    shingles,
    shingles_from_tokens,
    shingles_sql,
    tokens,
    tokens_sql,
)

# 15 hex chars = 60 bits: fits bigint exactly in both engines
_HEX_LEN = 15


def _hex_to_long(hex_col: Column) -> Column:
    return F.conv(F.substring(hex_col, 1, _HEX_LEN), 16, 10).cast("bigint")


def _hex_to_long_sql(hex_expr: str) -> str:
    return f"(('0x' || substr({hex_expr}, 1, {_HEX_LEN}))::BIGINT)"


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of byte-identical (normalized) documents: one groupBy on the
    fingerprint; keeps the minimum id as the canonical representative."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("keep_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def exact_dup_groups_sql(table: str, id_col: str, text_col: str) -> str:
    return f"""
SELECT fp, count(*) AS n_docs, min({id_col}) AS keep_id
FROM (SELECT {id_col}, {fingerprint_sql(text_col)} AS fp FROM {table})
GROUP BY fp HAVING count(*) > 1
"""


# ---------------------------------------------------------------------------
# n-gram Jaccard similarity join (blocked)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
    block_col: str | None = None,
) -> DataFrame:
    """Pairs (a < b) with shingle-set Jaccard >= threshold.

    ``block_col`` keys the self-join (same language, same length bucket,
    an LSH band...) — without it this is a cross join, which is only
    acceptable for validation-scale inputs.
    """
    base = (
        df.select(
            F.col(id_col).alias("doc"),
            tokens(text_col).alias("__toks"),
            *(
                [F.col(block_col).alias("blk")]
                if block_col
                else [F.lit(0).alias("blk")]
            ),
        )
        # filter on the TOKEN count, not size(sh): a size(sh) predicate on
        # an un-persisted frame is pushed below the projection re-inlined
        # against raw text (full per-gram re-evaluation per row); the
        # token-count form only duplicates the tokenizer once per row.
        # size(sh) > 0 <=> n_tokens >= k exactly.
        .filter(F.size("__toks") >= k)
        .select("doc", shingles_from_tokens("__toks", k).alias("sh"), "blk")
    )
    a = base.select(F.col("doc").alias("a"), F.col("sh").alias("sh_a"), "blk")
    b = base.select(F.col("doc").alias("b"), F.col("sh").alias("sh_b"), "blk")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    jacc = inter / union
    return (
        a.join(b, "blk")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", jacc.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs_sql(
    table: str,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
    block_col: str | None = None,
) -> str:
    blk = block_col if block_col else "0"
    sh = shingles_sql(text_col, k)
    return f"""
WITH base AS (
    SELECT {id_col} AS doc, {sh} AS sh, {blk} AS blk FROM {table}
), nonempty AS (SELECT * FROM base WHERE len(sh) > 0)
SELECT x.doc AS a, y.doc AS b,
       CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
         / CAST(len(list_distinct(list_concat(x.sh, y.sh))) AS DOUBLE) AS jaccard
FROM nonempty x JOIN nonempty y ON x.blk = y.blk AND x.doc < y.doc
WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
        / CAST(len(list_distinct(list_concat(x.sh, y.sh))) AS DOUBLE) >= {threshold}
"""


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

# 12 hex chars = 48 bits; i*b stays under 2^53, no bigint overflow
_MH_BITS = 48
_MH_MOD = 1 << _MH_BITS


def shingle_frame(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """(doc, sh: array<string>) — the shared input of signatures and
    verification. Compute once; persist (or write to a table) when both
    consumers run in one job.

    NOTE deliberately no ``size(sh) > 0`` filter here: a filter on the
    computed column makes Catalyst evaluate the (expensive) shingle
    expression twice — once for the predicate, once for the downstream
    explode (no cross-operator CSE). Exploding an empty array already
    yields no rows; filter AFTER persist when the empty docs matter.

    Two-step projection (tokens, then grams-from-attribute): inlining
    the tokenizer into the gram lambda re-evaluates it per gram — see
    shingles_from_tokens.
    """
    return df.select(
        F.col(id_col).alias("doc"), tokens(text_col).alias("__toks")
    ).select("doc", shingles_from_tokens("__toks", k).alias("sh"))


def _signatures_from_exploded(exploded: DataFrame, num_hashes: int) -> DataFrame:
    hashed = exploded.select(
        "doc",
        F.conv(F.substring(F.md5("shingle"), 1, 12), 16, 10).cast("bigint").alias("a"),
        F.conv(F.substring(F.md5("shingle"), 13, 12), 16, 10).cast("bigint").alias("b"),
    )
    aggs = [
        F.min(F.pmod(F.col("a") + F.lit(i) * F.col("b"), F.lit(_MH_MOD))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return hashed.groupBy("doc").agg(*aggs)


def minhash_signatures_from_shingles(
    sh_df: DataFrame, num_hashes: int = 16
) -> DataFrame:
    """Signatures from a MATERIALIZED (persisted/table) shingle frame.

    Only use on cached/stored input: exploding a freshly-projected array
    column defeats generator inlining and re-evaluates the shingle
    expression ~4x slower than the direct form in minhash_signatures.
    """
    return _signatures_from_exploded(
        sh_df.select("doc", F.explode("sh").alias("shingle")), num_hashes
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 16, k: int = 3
) -> DataFrame:
    """(id, h0..h{n-1}) — column per hash function.

    One explode + one groupBy, and ONE md5 per shingle: the k hash family
    is the classic two-hash construction h_i = (a + i*b) mod 2^48 with
    (a, b) the two 48-bit halves of the shingle's md5 — 16x less hashing
    than md5-per-function, same statistical behavior. Map-side partial
    min keeps this a single cheap shuffle on the doc id. Tokenization is
    its own projection (two-step): inlined, the gram lambda re-runs the
    regex tokenizer per shingle — measured ~8x slower (see
    shingles_from_tokens).
    """
    exploded = df.select(
        F.col(id_col).alias("doc"), tokens(text_col).alias("__toks")
    ).select("doc", F.explode(shingles_from_tokens("__toks", k)).alias("shingle"))
    return _signatures_from_exploded(exploded, num_hashes)


def _minhash_signatures_sql(
    table: str, id_col: str, text_col: str, num_hashes: int, k: int
) -> str:
    sh = shingles_sql(text_col, k)
    a = "(('0x' || substr(md5(sh), 1, 12))::BIGINT)"
    b = "(('0x' || substr(md5(sh), 13, 12))::BIGINT)"
    mins = ", ".join(
        f"min(({a} + {i} * {b}) % {_MH_MOD}) AS h{i}" for i in range(num_hashes)
    )
    return f"""
SELECT doc, {mins}
FROM (SELECT {id_col} AS doc, unnest({sh}) AS sh FROM {table})
GROUP BY doc
"""


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """Band the signature and bucket-join: docs agreeing on ALL hashes of
    any band collide.

    Plan shape matters here: banding via ONE explode into (band_id,
    band_key) rows and ONE self-join on that composite key — not a join
    per band, which re-executes the whole signature sub-DAG per band
    (4 bands were 16 shuffles; this form is 3). No cross product anywhere.
    """
    keyed = minhash_band_frame(signatures, bands, rows_per_band)
    left = keyed.select(F.col("doc").alias("a"), "band_id", "band_key")
    right = keyed.select(F.col("doc").alias("b"), "band_id", "band_key")
    return (
        left.join(right, ["band_id", "band_key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def minhash_band_frame(
    signatures: DataFrame, bands: int, rows_per_band: int
) -> DataFrame:
    """(doc, band_id, band_key) — the banded form of a signature frame.
    Persisted to a table, this IS the incremental-dedup index of a
    corpus: new documents join their bands against it instead of
    re-hashing the whole corpus."""
    band_structs = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.md5(
                F.concat_ws(
                    "|", *[f"h{b * rows_per_band + r}" for r in range(rows_per_band)]
                )
            ).alias("band_key"),
        )
        for b in range(bands)
    ]
    return signatures.select(
        "doc", F.explode(F.array(*band_structs)).alias("bk")
    ).select("doc", "bk.band_id", "bk.band_key")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
) -> DataFrame:
    rows = num_hashes // bands
    return lsh_candidate_pairs(
        minhash_signatures(df, id_col, text_col, num_hashes, k), bands, rows
    )


def minhash_lsh_pairs_sql(
    table: str,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
) -> str:
    rows = num_hashes // bands
    sig = _minhash_signatures_sql(table, id_col, text_col, num_hashes, k)
    sep = " || '|' || "
    keyed_ctes, band_selects = [], []
    for b in range(bands):
        concat = sep.join(
            f"CAST(h{b * rows + r} AS VARCHAR)" for r in range(rows)
        )
        keyed_ctes.append(
            f"keyed{b} AS (SELECT doc, md5({concat}) AS band_key FROM sig)"
        )
        band_selects.append(
            f"SELECT x.doc AS a, y.doc AS b FROM keyed{b} x JOIN keyed{b} y "
            f"ON x.band_key = y.band_key AND x.doc < y.doc"
        )
    union = " UNION ".join(band_selects)  # UNION dedups, matching .distinct()
    return f"WITH sig AS ({sig}), {', '.join(keyed_ctes)} {union}"


def minhash_jaccard_verified_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    sh_df: DataFrame | None = None,
    sig_df: DataFrame | None = None,
) -> DataFrame:
    """The scale path: LSH candidate generation + exact Jaccard verify.

    Only pairs colliding in an LSH band get their true shingle-set Jaccard
    computed — candidates are O(near-dups), not O(n²/blocks). This is the
    composition to use beyond validation scale (the blocked
    ngram_jaccard_pairs cross-join is ~25x slower at sf0.1 already).

    ``sh_df``: an already-PERSISTED ``(doc, sh)`` shingle frame for the
    same corpus and k (from :func:`shingle_frame`) — pass it when other
    steps (e.g. the incremental band index) share the tokenize pass;
    ownership stays with the caller (it is not unpersisted here).
    ``sig_df``: an already-PERSISTED signature frame for the same corpus
    and num_hashes — pass it when the band index build shares the
    signature pass too (signatures are the second-most expensive step
    after shingling; computing them once for both consumers measured
    ~1s off the incremental-clustering contract query at sf0.1).
    """
    # the shingle frame feeds BOTH signature generation and verification;
    # persist it so the expensive tokenize+shingle pass runs once (at
    # warehouse scale, write it to a table instead)
    caller_owns_shingles = sh_df is not None
    sh_cached = (
        sh_df
        if sh_df is not None
        else shingle_frame(df, id_col, text_col, k).persist()
    )
    # the persisted frame is materialized once; the verify joins filter
    # empties from the CACHED data, not by recomputing shingles
    sh = sh_cached.filter(F.size("sh") > 0)
    sig = (
        sig_df
        if sig_df is not None
        else minhash_signatures_from_shingles(sh, num_hashes)
    )
    rows = num_hashes // bands
    cands = lsh_candidate_pairs(sig, bands, rows)
    a = sh.select(F.col("doc").alias("a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc").alias("b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    result = (
        cands.join(a, "a").join(b, "b")
        .select("a", "b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    # materialize the (small) verified-pair set so the big shingle cache
    # can be released now instead of leaking for the session lifetime
    # NOTE: the returned frame is persisted (it replaced the much larger
    # shingle cache); callers looping over many corpora should unpersist
    # it when done
    result = result.persist()
    result.count()
    if not caller_owns_shingles:
        sh_cached.unpersist()
    return result


def minhash_jaccard_verified_pairs_sql(
    table: str,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
) -> str:
    cands = minhash_lsh_pairs_sql(table, id_col, text_col, num_hashes, bands, k)
    sh = shingles_sql(text_col, k)
    return f"""
WITH cands AS ({cands}),
     sh AS (SELECT {id_col} AS doc, {sh} AS s FROM {table})
SELECT a, b,
       CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
         / CAST(len(list_distinct(list_concat(x.s, y.s))) AS DOUBLE) AS jaccard
FROM cands JOIN sh x ON cands.a = x.doc JOIN sh y ON cands.b = y.doc
WHERE len(x.s) > 0 AND len(y.s) > 0
  AND CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        / CAST(len(list_distinct(list_concat(x.s, y.s))) AS DOUBLE) >= {threshold}
"""


def minhash_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    sh_df: DataFrame | None = None,
    sig_df: DataFrame | None = None,
) -> DataFrame:
    """The corpus-side LSH index: (doc, band_id, band_key), computed
    once at ingest and persisted as a table. Incremental dedup of a new
    batch then touches ONLY the new documents' text — the 100 TB shape,
    where re-hashing the standing corpus per ingest is the failure
    mode.

    ``sh_df``: an already-PERSISTED ``(doc, sh)`` shingle frame for the
    same corpus and k (from :func:`shingle_frame`) — pass it when the
    index build shares the tokenize+shingle pass with pair verification
    (one job computing both); ownership stays with the caller.
    ``sig_df``: an already-PERSISTED signature frame — sharing it skips
    even the per-shingle hashing; the index is then one banding
    projection over cached rows."""
    if sig_df is not None:
        sigs = sig_df
    elif sh_df is not None:
        sigs = minhash_signatures_from_shingles(sh_df, num_hashes)
    else:
        sigs = minhash_signatures(df, id_col, text_col, num_hashes, k)
    return minhash_band_frame(sigs, bands, num_hashes // bands)


def minhash_incremental_dedup(
    new_df: DataFrame,
    corpus_df: DataFrame,
    index_df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    new_sh_df: DataFrame | None = None,
    new_sig_df: DataFrame | None = None,
    corpus_sh_df: DataFrame | None = None,
) -> DataFrame:
    """Near-dups of NEW documents against an EXISTING corpus via its
    precomputed band index: (a=new doc, b=existing doc, jaccard).

    Work is proportional to the new batch + candidates, never the
    standing corpus: only new docs are shingled/hashed; the band join
    hits the index ONCE (the candidate frame is persisted — it feeds
    both the corpus semi-join and the final verify join); exact-Jaccard
    verification joins candidates back to corpus text through a
    semi-join, so only colliding existing docs are re-shingled
    (O(near-dups) point lookups, pushdown-friendly).

    NOTE the returned frame is persisted (it replaced the larger
    shingle/candidate caches, which are released before returning);
    callers looping over many ingest batches should unpersist each
    result when done with it.

    ``new_sh_df``: an already-PERSISTED shingle frame of the NEW batch
    — pass it when the caller also clusters the batch internally (one
    tokenize pass for both); ownership stays with the caller.
    ``new_sig_df``: an already-PERSISTED signature frame of the new
    batch — sharing it also skips the per-shingle hashing (the
    incremental-clustering contract query computes signatures once for
    the band probe AND the batch's internal pair verification).
    ``corpus_sh_df``: an already-PERSISTED ``(doc, sh)`` shingle frame
    of the CORPUS — when the caller just built the index inline (the
    contract queries) or maintains a shingle-bearing streamed index
    (`streaming/minhash.MinhashIndexSink` stores shingles in state),
    verification semi-joins the cached shingles instead of re-tokenizing
    the colliding corpus documents' text."""
    rows_per_band = num_hashes // bands
    caller_owns_new_sh = new_sh_df is not None
    new_sh = (
        new_sh_df
        if new_sh_df is not None
        else shingle_frame(new_df, id_col, text_col, k).persist()
    )
    nsh = new_sh.filter(F.size("sh") > 0)
    new_sig = (
        new_sig_df
        if new_sig_df is not None
        else minhash_signatures_from_shingles(nsh, num_hashes)
    )
    new_bands = minhash_band_frame(new_sig, bands, rows_per_band)
    cands = (
        new_bands.join(index_df, ["band_id", "band_key"])
        .select(new_bands.doc.alias("a"), index_df.doc.alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()  # consumed twice: corpus semi-join + verify join
    )
    # re-shingle ONLY the colliding existing docs. NO size(sh) filter
    # here: on an un-persisted frame Catalyst pushes that predicate below
    # the projections AND the semi-join, re-inlined against raw text — the
    # full per-gram shingle expression then runs over the ENTIRE corpus
    # (measured: 2x ~5 s at sf0.1 for a 91-doc fetch). It is also
    # redundant: an empty-shingle doc has no bands, so it cannot appear
    # in the index or in cands.
    if corpus_sh_df is not None:
        old_sh = corpus_sh_df.join(
            cands.select(F.col("b").alias("doc")).distinct(), "doc", "left_semi"
        )
    else:
        hit_old = corpus_df.join(
            cands.select(F.col("b").alias(id_col)).distinct(), id_col, "left_semi"
        )
        old_sh = shingle_frame(hit_old, id_col, text_col, k)
    a = nsh.select(F.col("doc").alias("a"), F.col("sh").alias("sh_a"))
    b = old_sh.select(F.col("doc").alias("b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    result = (
        cands.join(a, "a").join(b, "b")
        .select("a", "b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    result = result.persist()
    result.count()
    cands.unpersist()
    if not caller_owns_new_sh:
        new_sh.unpersist()
    return result


def minhash_incremental_dedup_sql(
    new_sql: str,
    corpus_sql: str,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
) -> str:
    """DuckDB twin: the index is materialized inline from corpus_sql
    (the oracle has no persisted table, same result)."""
    rows = num_hashes // bands
    sig_new = _minhash_signatures_sql(f"({new_sql})", id_col, text_col, num_hashes, k)
    sig_old = _minhash_signatures_sql(f"({corpus_sql})", id_col, text_col, num_hashes, k)
    sh = shingles_sql(text_col, k)
    sep = " || '|' || "
    band_selects = []
    for b in range(bands):
        concat = sep.join(f"CAST(h{b * rows + r} AS VARCHAR)" for r in range(rows))
        band_selects.append(
            f"SELECT n.doc AS a, o.doc AS b "
            f"FROM (SELECT doc, md5({concat}) AS bk FROM sig_new) n "
            f"JOIN (SELECT doc, md5({concat}) AS bk FROM sig_old) o "
            f"ON n.bk = o.bk AND n.doc <> o.doc"
        )
    cands = " UNION ".join(band_selects)  # UNION dedups, matching .distinct()
    jac = (
        "CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)"
        " / CAST(len(list_distinct(list_concat(x.s, y.s))) AS DOUBLE)"
    )
    return f"""
WITH sig_new AS ({sig_new}), sig_old AS ({sig_old}),
cands AS ({cands}),
shn AS (SELECT {id_col} AS doc, {sh} AS s FROM ({new_sql})),
sho AS (SELECT {id_col} AS doc, {sh} AS s FROM ({corpus_sql}))
SELECT a, b, {jac} AS jaccard
FROM cands JOIN shn x ON cands.a = x.doc JOIN sho y ON cands.b = y.doc
WHERE len(x.s) > 0 AND len(y.s) > 0 AND {jac} >= {threshold}
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60  # 15 hex chars -> bigint-safe in both engines


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """60-bit SimHash per document.

    Each token contributes +1/-1 per bit position (sign of md5 bit);
    the fingerprint sets bit b iff the aggregate is >= 0. One explode +
    one groupBy with 60 conditional-sum aggregates — stays in codegen.
    """
    exploded = df.select(
        F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("tok")
    ).select("doc", _hex_to_long(F.md5(F.col("tok"))).alias("th"))
    aggs = [
        F.sum(
            F.when(F.shiftrightunsigned(F.col("th"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(SIMHASH_BITS)
    ]
    sums = exploded.groupBy("doc").agg(*aggs)
    fp = None
    for b in range(SIMHASH_BITS):
        bit = F.when(F.col(f"s{b}") >= 0, F.lit(1 << b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        fp = bit if fp is None else fp + bit
    return sums.select("doc", fp.alias("simhash"))


def simhash_sql(table: str, id_col: str, text_col: str) -> str:
    toks = tokens_sql(text_col)
    th = _hex_to_long_sql("md5(tok)")
    sums = ", ".join(
        f"sum(CASE WHEN (th >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(SIMHASH_BITS)
    )
    fp = " + ".join(
        f"CASE WHEN s{b} >= 0 THEN {1 << b}::BIGINT ELSE 0::BIGINT END"
        for b in range(SIMHASH_BITS)
    )
    return f"""
SELECT doc, ({fp}) AS simhash FROM (
    SELECT doc, {sums} FROM (
        SELECT {id_col} AS doc, {th} AS th
        FROM (SELECT {id_col}, unnest({toks}) AS tok FROM {table})
    ) GROUP BY doc
)
"""


_SIMHASH_BANDS = 6
_SIMHASH_BAND_BITS = SIMHASH_BITS // _SIMHASH_BANDS  # 10 bits per band


def simhash_near_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 5
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, banded.

    Pigeonhole: ``bands`` bands can absorb at most ``bands`` differing
    bits one-per-band, so any pair within Hamming <= bands-1 is
    GUARANTEED to agree exactly on some band — with 6 bands of 10 bits
    the equi-join on (band_id, band_value) has full recall for
    max_hamming <= 5 (the default). Beyond bands-1 the candidate set is
    approximate. Exact Hamming distance (bit_count of xor) filters
    candidates; both primitives verified identical in DuckDB.
    """
    if max_hamming > _SIMHASH_BANDS - 1:
        import warnings

        warnings.warn(
            f"banded recall is only guaranteed for hamming <= {_SIMHASH_BANDS - 1}; "
            f"pairs up to {max_hamming} are found best-effort",
            stacklevel=2,
        )
    # the fingerprint frame feeds both sides of the self-join; persist it
    # so the 60-aggregate simhash DAG runs once, release after the (small)
    # pair set materializes
    fp = simhash(df, id_col, text_col).persist()
    mask = (1 << _SIMHASH_BAND_BITS) - 1
    bands = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.shiftrightunsigned(F.col("simhash"), b * _SIMHASH_BAND_BITS)
            .bitwiseAND(mask)
            .alias("band_val"),
        )
        for b in range(_SIMHASH_BANDS)
    ]
    keyed = fp.select(
        "doc", "simhash", F.explode(F.array(*bands)).alias("bk")
    ).select("doc", "simhash", "bk.band_id", "bk.band_val")
    left = keyed.select(F.col("doc").alias("a"), F.col("simhash").alias("ha"),
                        "band_id", "band_val")
    right = keyed.select(F.col("doc").alias("b"), F.col("simhash").alias("hb"),
                         "band_id", "band_val")
    # long to sidestep engine-specific narrow widths (DuckDB bit_count
    # yields TINYINT; Spark int) — identical values either way
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long")
    result = (
        left.join(right, ["band_id", "band_val"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
        .persist()
    )
    result.count()
    fp.unpersist()
    return result


def simhash_near_pairs_sql(
    table: str, id_col: str, text_col: str, max_hamming: int = 5
) -> str:
    fp = simhash_sql(table, id_col, text_col)
    mask = (1 << _SIMHASH_BAND_BITS) - 1
    band_rows = " UNION ALL ".join(
        f"SELECT doc, simhash, {b} AS band_id, "
        f"(simhash >> {b * _SIMHASH_BAND_BITS}) & {mask} AS band_val FROM fp"
        for b in range(_SIMHASH_BANDS)
    )
    return f"""
WITH fp AS ({fp}), keyed AS ({band_rows})
SELECT DISTINCT x.doc AS a, y.doc AS b,
       CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
FROM keyed x JOIN keyed y
  ON x.band_id = y.band_id AND x.band_val = y.band_val AND x.doc < y.doc
WHERE bit_count(xor(x.simhash, y.simhash)) <= {max_hamming}
"""


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    block_col: str | None = None,
) -> DataFrame:
    """Pairs (a < b) with cosine >= threshold; optionally blocked (label,
    LSH bucket from operators/similarity.py) to avoid the cross join."""
    from sqlserver_pg_cdc_spark.functions.vectors import dot, norm

    # norm precomputed per vector, not per pair (O(n) vs O(pairs) sqrt-dots)
    base = df.select(
        F.col(id_col).alias("doc"),
        F.col(vec_col).alias("v"),
        norm(vec_col).alias("nv"),
        *( [F.col(block_col).alias("blk")] if block_col else [F.lit(0).alias("blk")] ),
    )
    a = base.select(F.col("doc").alias("a"), F.col("v").alias("va"), F.col("nv").alias("na"), "blk")
    b = base.select(F.col("doc").alias("b"), F.col("v").alias("vb"), F.col("nv").alias("nb"), "blk")
    cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    pairs = a.join(b, "blk").filter(F.col("a") < F.col("b"))
    # the pair stream is byte-small but compute-heavy (one 64-dim dot per
    # row); AQE's size-based coalescing collapses it to ~1 partition and
    # single-threads the scoring. An EXPLICIT repartition (which AQE
    # respects) spreads the dots across the cluster.
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    pairs = pairs.repartition(n_parts, "a", "b")
    return (
        pairs.select("a", "b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def embedding_near_dup_pairs_sql(
    table: str,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    block_col: str | None = None,
) -> str:
    from sqlserver_pg_cdc_spark.functions.vectors import cosine_sql

    blk = block_col if block_col else "0"
    cos = cosine_sql("x.v", "y.v")
    return f"""
WITH base AS (SELECT {id_col} AS doc, {vec_col} AS v, {blk} AS blk FROM {table})
SELECT x.doc AS a, y.doc AS b, {cos} AS cosine
FROM base x JOIN base y ON x.blk = y.blk AND x.doc < y.doc
WHERE {cos} >= {threshold}
"""


def dup_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 20,
    driver_threshold: int = 200_000,
) -> DataFrame:
    """Connected components over near-dup pairs: turns a pair list into
    duplicate CLUSTERS — the step an actual corpus dedup needs between
    pair detection and document selection. Returns one row per node:
    ``(doc, component, keep)`` where ``component`` is the cluster's
    minimum doc id and ``keep`` marks the canonical survivor.

    Algorithm: iterative min-label propagation (hash-min), switching to
    path compression (pointer jumping) from the third round on. Each
    round every node takes the min label among itself and its
    neighbors; under compression it additionally follows the label's
    OWN label one more hop (label(label) <= label since labels decrease
    monotonically), doubling the effective propagation distance per
    round — so deep chains converge in O(log diameter) rounds instead
    of O(diameter). The first two rounds skip the extra join because
    near-dup graphs are usually diameter <= 2 (measured: sf0.1
    converges in 2 rounds; the compression join only pays for itself on
    deeper graphs). All shuffles key on the node id; a driver-side
    convergence check caps the loop. No collect of nodes or edges
    beyond the size-gated fast path below; state per round is one
    (node, label) frame.

    Fast path: when the pair set is small (``<= driver_threshold``,
    checked with a bounded ``limit(n+1).count()``), the components are
    computed with a driver-side union-find over the collected pairs —
    the same decision a broadcast join makes for a small build side.
    The near-dup pair set of a deduplicated corpus is O(near-dups), not
    O(corpus), so this is the common case even at large scale, and it
    replaces ~6 scheduler-bound Spark jobs (2-3 label-propagation
    rounds × join+checkpoint+count) with one collect: measured 6.3s ->
    ~0.3s on the sf0.1 clustering queries, identical output (union by
    min root makes each root the component's minimum member — the same
    min-label contract). Pass ``driver_threshold=0`` to force the
    distributed loop.
    """
    if driver_threshold:
        # one bounded job: collect at most threshold+1 pairs; the +1 row
        # (if present) proves the set is too big and the distributed
        # loop runs instead. Memory is capped at ~threshold small rows.
        rows = pairs.select(a_col, b_col).limit(driver_threshold + 1).collect()
        if len(rows) <= driver_threshold:
            parent: dict = {}

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]  # path halving
                    x = parent[x]
                return x

            for r in rows:
                a, b = r[0], r[1]
                if a not in parent:
                    parent[a] = a
                if b not in parent:
                    parent[b] = b
                ra, rb = find(a), find(b)
                if ra != rb:
                    # union by MIN root: the root of every tree is its
                    # component's minimum member at all times
                    if ra < rb:
                        parent[rb] = ra
                    else:
                        parent[ra] = rb
            out_rows = [(x, find(x), x == find(x)) for x in parent]
            id_type = dict(pairs.dtypes)[a_col]
            return pairs.sparkSession.createDataFrame(
                out_rows,
                f"doc {id_type}, component {id_type}, keep boolean",
            )
    edges = (
        pairs.select(F.col(a_col).alias("x"), F.col(b_col).alias("y"))
        .unionByName(
            pairs.select(F.col(b_col).alias("x"), F.col(a_col).alias("y"))
        )
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("x").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .persist()
    )
    for i in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.y == labels.node)
            .groupBy(F.col("x").alias("node"))
            .agg(F.min("label").alias("nlabel"))
        )
        # convergence flag rides along with the update, and
        # localCheckpoint truncates the lineage so the plan (and the
        # driver's planning time) stays flat across rounds instead of
        # growing per iteration
        if i < 2:
            stepped = (
                labels.join(neighbor_min, "node", "left")
                .select(
                    "node",
                    F.least(
                        F.col("label"),
                        F.coalesce(F.col("nlabel"), F.col("label")),
                    ).alias("label"),
                    (F.col("nlabel") < F.col("label")).alias("changed"),
                )
                .localCheckpoint()
            )
        else:
            combined = labels.join(neighbor_min, "node", "left").select(
                "node",
                F.col("label").alias("old"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("mid"),
            )
            # path compression: jump to the label's own (post-min)
            # label. Every label value IS a node id present in
            # `combined`, and its label is <= itself, so one extra
            # shuffle join per round buys a doubling of propagation
            # distance on deep graphs.
            ptr = combined.select(
                F.col("node").alias("pn"), F.col("mid").alias("pl")
            )
            new_label = F.coalesce(F.col("pl"), F.col("mid"))
            stepped = (
                combined.join(ptr, combined.mid == ptr.pn, "left")
                .select(
                    "node",
                    new_label.alias("label"),
                    (new_label < F.col("old")).alias("changed"),
                )
                .localCheckpoint()
            )
        changed = stepped.filter(F.col("changed")).limit(1).count()
        labels.unpersist()
        labels = stepped.select("node", "label")
        if changed == 0:
            break
    out = labels.select(
        F.col("node").alias("doc"),
        F.col("label").alias("component"),
        (F.col("node") == F.col("label")).alias("keep"),
    )
    edges.unpersist()
    return out


def dup_components_incremental(
    labels: DataFrame,
    new_pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    driver_threshold: int = 200_000,
) -> DataFrame:
    """Fold a NEW batch's near-dup pairs into standing duplicate
    clusters without re-clustering the corpus — the ingest-time
    companion of :func:`dup_components` (as :func:`minhash_incremental_dedup`
    is to the pair detection).

    ``labels`` is the persisted ``(doc, component, ...)`` clustering of
    the standing corpus; ``new_pairs`` are the pairs the new batch
    introduced (new↔corpus from the incremental band index, new↔new
    from clustering the batch). Each endpoint maps to its SUPER-NODE —
    its existing component id if labeled, else itself — so the
    propagation loop runs on the component-level quotient graph, which
    is O(new pairs), never O(corpus). Untouched components keep their
    labels through a left join; only members of merged components are
    relabeled. Because every component id is the minimum member doc id,
    min-of-mins over the quotient graph equals the global minimum:
    the result is IDENTICAL to re-running :func:`dup_components` over
    the union of all pairs (property-tested, and the contract query's
    oracle is exactly that from-scratch recompute).

    Output covers labeled corpus docs plus every doc in ``new_pairs``
    (same convention as dup_components: pairless docs are absent).

    Fast path (same decision rule as :func:`dup_components`): when BOTH
    the standing labels and the new pair set are small (bounded
    ``limit(n+1)`` probes), the whole fold runs as one driver-side
    union-find seeded from the existing components — replacing the
    ~6 scheduler-bound quotient-fold jobs (two label joins, the
    sup-edge clustering, relabel join, anti-join, union) with two
    bounded collects; identical output because union-by-min-root
    preserves the min-member-component invariant the quotient fold
    relies on. The labels side of a real corpus clustering is
    O(docs-with-dups), not O(corpus), so this is the common case even
    at scale; ``driver_threshold=0`` forces the distributed fold.
    """
    if driver_threshold:
        lab_rows = (
            labels.select("doc", "component")
            .limit(driver_threshold + 1)
            .collect()
        )
        if len(lab_rows) <= driver_threshold:
            pair_rows = (
                new_pairs.select(a_col, b_col)
                .limit(driver_threshold + 1)
                .collect()
            )
            if len(pair_rows) <= driver_threshold:
                parent: dict = {}

                def find(x):
                    while parent[x] != x:
                        parent[x] = parent[parent[x]]  # path halving
                        x = parent[x]
                    return x

                for r in lab_rows:
                    doc, comp = r[0], r[1]
                    parent.setdefault(comp, comp)
                    parent[doc] = comp if doc != comp else doc
                for r in pair_rows:
                    a, b = r[0], r[1]
                    parent.setdefault(a, a)
                    parent.setdefault(b, b)
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        if ra < rb:
                            parent[rb] = ra
                        else:
                            parent[ra] = rb
                out_rows = [(x, find(x), x == find(x)) for x in parent]
                id_type = dict(labels.dtypes)["doc"]
                return labels.sparkSession.createDataFrame(
                    out_rows,
                    f"doc {id_type}, component {id_type}, keep boolean",
                )
    lab_a = labels.select(
        F.col("doc").alias(a_col), F.col("component").alias("__ca")
    )
    lab_b = labels.select(
        F.col("doc").alias(b_col), F.col("component").alias("__cb")
    )
    sup_edges = (
        new_pairs.select(a_col, b_col)
        .join(lab_a, a_col, "left")
        .join(lab_b, b_col, "left")
        .select(
            F.coalesce("__ca", F.col(a_col)).alias("a"),
            F.coalesce("__cb", F.col(b_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    sup_map = dup_components(sup_edges).select(
        F.col("doc").alias("component"), F.col("component").alias("__new_comp")
    )
    relabeled = (
        labels.select("doc", "component")
        .join(sup_map, "component", "left")
        .select(
            "doc", F.coalesce("__new_comp", F.col("component")).alias("component")
        )
    )
    new_nodes = (
        new_pairs.select(F.col(a_col).alias("doc"))
        .unionByName(new_pairs.select(F.col(b_col).alias("doc")))
        .distinct()
        .join(labels.select("doc"), "doc", "left_anti")
    )
    new_labels = (
        new_nodes.join(
            sup_map.withColumnRenamed("component", "doc"), "doc", "left"
        ).select("doc", F.coalesce("__new_comp", F.col("doc")).alias("component"))
    )
    return relabeled.unionByName(new_labels).select(
        "doc",
        "component",
        (F.col("doc") == F.col("component")).alias("keep"),
    )


def dup_components_sql(pairs_sql: str, a_col: str = "a", b_col: str = "b") -> str:
    """DuckDB oracle: transitive closure by recursive CTE (UNION dedups,
    so the recursion terminates), then min label per node. Validation
    scale only — the closure materializes O(component²) rows."""
    return f"""
WITH RECURSIVE
pairs AS ({pairs_sql}),
edges AS (
    SELECT {a_col} AS x, {b_col} AS y FROM pairs
    UNION
    SELECT {b_col} AS x, {a_col} AS y FROM pairs
),
reach(node, label) AS (
    SELECT x, x FROM edges
    UNION
    SELECT e.x, r.label FROM reach r JOIN edges e ON e.y = r.node
)
SELECT node AS doc, min(label) AS component,
       node = min(label) AS keep
FROM reach GROUP BY node
"""


def embedding_near_dup_lsh_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    bands: int = 8,
    planes_per_band: int = 4,
    dim: int = 64,
    seed: str = "emb-dedup",
) -> DataFrame:
    """The 100-TB embedding near-dup: banded hyperplane LSH blocking
    (OR-construction, same shape as the MinHash/SimHash banding above)
    instead of within-block all-pairs.

    Each vector gets ``bands`` bucket keys — band b's key is the sign
    pattern of ``planes_per_band`` deterministic hyperplanes
    (similarity.hyperplanes: md5-derived, engine/partition stable).
    Candidates = pairs sharing ANY band's bucket (one banded self-join,
    deduped), then the exact cosine verifies. Collision probability for
    angle θ is (1-θ/π)^r per band, 1-(1-p^r)^B overall — with the 8x4
    default, ≥99.9% recall at cosine 0.95, graceful decay below.
    Candidate count is O(near-pairs), never O(n²), and each shuffle key
    is (band, bucket) so skew is bounded by bucket occupancy.

    Tuning (measured on the 2000-vector uniform fixture): 8x4 yields
    ~820k candidates (40% of all pairs — uniform data is LSH's worst
    case) with 67% recall at the low cosine-0.3 cut; 8x8 cuts candidates
    11x to ~72k while keeping ≥98% recall at cosine 0.95; 8x10 cuts a
    further 3.6x to ~20k at ≥96% theoretical recall for cosine 0.95
    (1-(1-0.898^10)^8), and 100% for exact copies — the contract query's
    operating point. For production dedup of real (clustered) embeddings
    use 8-10 planes per band; keep 4 only when hunting low-similarity
    correlations.
    """
    from sqlserver_pg_cdc_spark.functions.vectors import dot, norm
    from sqlserver_pg_cdc_spark.operators.similarity import (
        _allbits_expr,
        hyperplanes,
    )

    base = df.select(
        F.col(id_col).alias("doc"),
        F.col(vec_col).alias("v"),
        norm(vec_col).alias("nv"),
    ).persist()
    # one transform HOF for all bands' bits, sliced per band — same
    # values as the per-band bucket concat, ~80x less analyzer surface
    allbits = _allbits_expr(
        "v",
        [
            hyperplanes(planes_per_band, dim, f"{seed}|band{b}")
            for b in range(bands)
        ],
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.substring(
                "__bits", b * planes_per_band + 1, planes_per_band
            ).alias("bkt"),
        )
        for b in range(bands)
    ]
    keyed = base.select("doc", allbits.alias("__bits")).select(
        "doc", F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc", "bb.band", "bb.bkt")
    cand = (
        keyed.select(F.col("doc").alias("a"), "band", "bkt")
        .join(keyed.select(F.col("doc").alias("b"), "band", "bkt"), ["band", "bkt"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    scored = (
        cand.join(
            base.select(F.col("doc").alias("a"), F.col("v").alias("va"), F.col("nv").alias("na")),
            "a",
        )
        .join(
            base.select(F.col("doc").alias("b"), F.col("v").alias("vb"), F.col("nv").alias("nb")),
            "b",
        )
        .select(
            "a",
            "b",
            (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .persist()
    )
    scored.count()  # materialize before releasing the vector frame
    base.unpersist()
    return scored


def embedding_band_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    bands: int = 8,
    planes_per_band: int = 10,
    dim: int = 64,
    seed: str = "emb-dedup",
) -> DataFrame:
    """The corpus-side hyperplane-LSH index: (doc, band, bkt), computed
    at ingest and persisted. New embeddings join their bucket keys
    against it — incremental near-dup without re-bucketing the standing
    corpus (mirror of :func:`minhash_index` for vectors).

    All 80 sign bits come from ONE transform HOF (`_allbits_expr`)
    materialized once per row, then each band's bucket is a substring
    slice — character-identical values to the per-band `_bucket_expr`
    concat, at a fraction of the per-action analyzer/codegen cost that
    used to dominate every banded embedding query at bench scale."""
    from sqlserver_pg_cdc_spark.operators.similarity import (
        _allbits_expr,
        hyperplanes,
    )

    allbits = _allbits_expr(
        vec_col,
        [
            hyperplanes(planes_per_band, dim, f"{seed}|band{b}")
            for b in range(bands)
        ],
    )
    step = df.select(F.col(id_col).alias("doc"), allbits.alias("__bits"))
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.substring(
                "__bits", b * planes_per_band + 1, planes_per_band
            ).alias("bkt"),
        )
        for b in range(bands)
    ]
    return step.select(
        "doc", F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc", "bb.band", "bb.bkt")


def embedding_incremental_near_dup(
    new_df: DataFrame,
    corpus_df: DataFrame,
    index_df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    bands: int = 8,
    planes_per_band: int = 10,
    dim: int = 64,
    seed: str = "emb-dedup",
) -> DataFrame:
    """Near-dups of NEW embeddings against an EXISTING corpus via its
    precomputed band index: (a=new id, b=existing id, cosine).

    Only the new batch is bucketed; the band join hits the index once
    (candidates persisted); exact-cosine verification fetches only the
    colliding corpus vectors through a semi-join. Work ∝ new batch +
    collisions — the ingest-time shape of the banded near-dup.

    NOTE the returned frame is persisted (caches released before
    returning); looping callers should unpersist each result."""
    from sqlserver_pg_cdc_spark.functions.vectors import dot, norm

    new_bands = embedding_band_index(
        new_df, id_col, vec_col, bands, planes_per_band, dim, seed
    )
    cands = (
        new_bands.join(index_df, ["band", "bkt"])
        .select(new_bands.doc.alias("a"), index_df.doc.alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()  # consumed twice: corpus semi-join + verify join
    )
    a_vec = new_df.select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("va"), norm(vec_col).alias("na")
    )
    hit_old = corpus_df.join(
        cands.select(F.col("b").alias(id_col)).distinct(), id_col, "left_semi"
    )
    b_vec = hit_old.select(
        F.col(id_col).alias("b"), F.col(vec_col).alias("vb"), norm(vec_col).alias("nb")
    )
    result = (
        cands.join(a_vec, "a")
        .join(b_vec, "b")
        .select(
            "a",
            "b",
            (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .persist()
    )
    result.count()
    cands.unpersist()
    return result


def embedding_incremental_near_dup_sql(
    new_sql: str,
    corpus_sql: str,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    bands: int = 8,
    planes_per_band: int = 10,
    dim: int = 64,
    seed: str = "emb-dedup",
) -> str:
    from sqlserver_pg_cdc_spark.functions.vectors import cosine_sql
    from sqlserver_pg_cdc_spark.operators.similarity import _bucket_sql, hyperplanes

    def keyed(src: str) -> str:
        return " UNION ALL ".join(
            f"SELECT doc, {_bucket_sql('v', hyperplanes(planes_per_band, dim, f'{seed}|band{b}'))} "
            f"AS bkt, {b} AS band FROM {src}"
            for b in range(bands)
        )

    cos = cosine_sql("ba.v", "bb.v")
    return f"""
WITH nbase AS (SELECT {id_col} AS doc, {vec_col} AS v FROM ({new_sql})),
obase AS (SELECT {id_col} AS doc, {vec_col} AS v FROM ({corpus_sql})),
nkeyed AS ({keyed('nbase')}),
okeyed AS ({keyed('obase')}),
cand AS (
    SELECT DISTINCT n.doc AS a, o.doc AS b
    FROM nkeyed n JOIN okeyed o ON n.band = o.band AND n.bkt = o.bkt
                 AND n.doc <> o.doc
)
SELECT a, b, {cos} AS cosine
FROM cand JOIN nbase ba ON ba.doc = a JOIN obase bb ON bb.doc = b
WHERE {cos} >= {threshold}
"""


def embedding_near_dup_lsh_pairs_sql(
    table: str,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    bands: int = 8,
    planes_per_band: int = 4,
    dim: int = 64,
    seed: str = "emb-dedup",
) -> str:
    from sqlserver_pg_cdc_spark.functions.vectors import cosine_sql
    from sqlserver_pg_cdc_spark.operators.similarity import _bucket_sql, hyperplanes

    band_rows = " UNION ALL ".join(
        f"SELECT doc, {_bucket_sql('v', hyperplanes(planes_per_band, dim, f'{seed}|band{b}'))} "
        f"AS bkt, {b} AS band FROM base"
        for b in range(bands)
    )
    cos = cosine_sql("ba.v", "bb.v")
    return f"""
WITH base AS (SELECT {id_col} AS doc, {vec_col} AS v FROM {table}),
keyed AS ({band_rows}),
cand AS (
    SELECT DISTINCT x.doc AS a, y.doc AS b
    FROM keyed x JOIN keyed y ON x.band = y.band AND x.bkt = y.bkt AND x.doc < y.doc
)
SELECT a, b, {cos} AS cosine
FROM cand JOIN base ba ON ba.doc = a JOIN base bb ON bb.doc = b
WHERE {cos} >= {threshold}
"""


def select_canonical(
    df: DataFrame,
    id_col: str,
    text_col: str,
    score_col: str | None = None,
    prefer: str = "max",
) -> DataFrame:
    """Score-aware canonical selection over exact-dup groups: among
    documents with identical NORMALIZED text (same fingerprint — they
    can still differ in case/whitespace), keep the copy with the best
    score instead of the arbitrary minimum id. ``score_col`` is any
    numeric column already on the frame (a model quality score, a
    perplexity, a compactness measure); when None, the built-in
    heuristic ``quality_score(text)`` is used. ``prefer`` is "max"
    (higher score wins) or "min".

    Returns one row per document in a dup group (singletons are
    trivially kept and omitted): ``(id, fp, score, keep)`` — exactly
    one keep per group, ties broken by id for determinism.

    One shuffle on the fingerprint: the selection window and the group
    count share the partition key, so Catalyst plans a single exchange.
    This is the selection step `dup_components` defers (its keep is
    min-id); corpus pipelines prefer the best-scored survivor."""
    from sqlserver_pg_cdc_spark.functions.text import quality_score
    from pyspark.sql import Window

    if prefer not in ("max", "min"):
        raise ValueError("prefer must be 'max' or 'min'")
    score = (
        F.col(score_col).cast("double") if score_col else quality_score(text_col)
    )
    scored = df.select(
        F.col(id_col),
        fingerprint(text_col).alias("fp"),
        score.alias("score"),
    )
    order = F.col("score").desc() if prefer == "max" else F.col("score").asc()
    w = Window.partitionBy("fp").orderBy(order, F.col(id_col))
    wc = Window.partitionBy("fp")
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wc))
        .filter(F.col("__n") > 1)
        .select(id_col, "fp", "score", (F.col("__rk") == 1).alias("keep"))
    )


def select_canonical_sql(
    table: str,
    id_col: str,
    text_col: str,
    score_col: str | None = None,
    prefer: str = "max",
) -> str:
    from sqlserver_pg_cdc_spark.functions.text import quality_score_sql

    if prefer not in ("max", "min"):
        raise ValueError("prefer must be 'max' or 'min'")
    score = (
        f"CAST({score_col} AS DOUBLE)" if score_col else quality_score_sql(text_col)
    )
    direction = "DESC" if prefer == "max" else "ASC"
    return f"""
SELECT {id_col}, fp, score, (__rk = 1) AS keep
FROM (
    SELECT {id_col}, fp, score,
           row_number() OVER (PARTITION BY fp ORDER BY score {direction}, {id_col}) AS __rk,
           count(*) OVER (PARTITION BY fp) AS __n
    FROM (
        SELECT {id_col},
               {fingerprint_sql(text_col)} AS fp,
               {score} AS score
        FROM {table}
    )
)
WHERE __n > 1
"""
