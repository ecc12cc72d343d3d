"""Approximate-nearest-neighbor search over embedding columns.

Two paths:

- ``topk_brute_force``: exact cosine top-k. The query set is broadcast
  (it is small by construction), each partition scores its vectors, and
  only per-partition top-k survivors reach the final shuffle — O(N·d)
  scan work, no N×N blowup. This is the correctness baseline.
- ``topk_lsh``: random-hyperplane LSH. Vectors hash to a sign-pattern
  bucket; a query only scores candidates in its bucket (multi-probe over
  Hamming-1 neighbors to recover recall). At 100 TB the bucket column is
  precomputed once and the join is an equi-join on (bucket), cutting the
  scan by ~2^planes.

Hyperplanes are deterministic: generated from a seeded md5 stream in
Python and embedded as plan literals, so the DuckDB oracle shares them
exactly (no cross-engine RNG needed).
"""

from __future__ import annotations

import hashlib
import struct
import weakref

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.functions.vectors import cosine, cosine_sql, dot


def hyperplanes(
    n_planes: int, dim: int, seed: str = "ann-seed"
) -> tuple[tuple[float, ...], ...]:
    """Deterministic pseudo-random planes in [-0.5, 0.5)^dim.

    Component (p, d) derives from md5(seed|p|d) — stable across engines,
    sessions, and partitions. Memoized: every banded query regenerates
    the same plane family. Returned as immutable tuples so no caller can
    mutate the process-global cache entry.
    """
    cached = _PLANES_CACHE.get((n_planes, dim, seed))
    if cached is not None:
        return cached
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}|{p}|{d}".encode()).digest()
            (u,) = struct.unpack(">Q", h[:8])
            row.append(u / 2**64 - 0.5)
        planes.append(tuple(row))
    frozen = tuple(planes)
    _PLANES_CACHE[(n_planes, dim, seed)] = frozen
    return frozen


_PLANES_CACHE: dict[tuple[int, int, str], tuple[tuple[float, ...], ...]] = {}

# parsed bucket Columns, keyed weakly on the owning SparkSession (a
# Column wraps a JVM expression handle — it must not outlive its session)
_BUCKET_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _bucket_expr(vec: str, planes: list[list[float]]) -> Column:
    """Sign pattern of the vector against each plane, as a bit string.

    Built as ONE SQL string parsed JVM-side: constructing the plane
    literals as python Column objects costs a py4j round-trip per
    component (planes x dim x F.lit = thousands of driver calls, ~7s for
    an 8x10x64 banding); F.expr is a single call and yields the
    identical Catalyst tree (zip_with + left-fold aggregate, so the
    float semantics match dot()/dot_sql exactly).

    ``vec`` must be a plain column name (it is spliced into a SQL
    string; arbitrary Column expressions don't round-trip and the
    splice is unavailable under Spark Connect).

    The parsed Column is memoized per (session, vec, planes): parsing a
    banding's ~5k float literals costs ~1 s of driver+Catalyst time, and
    one banded query builds the same expressions two or three times
    (index side + probe side), several queries share one plane family.
    The cache is keyed on the live SparkSession so entries cannot leak
    JVM references across a session restart."""
    if not isinstance(vec, str):
        raise TypeError(
            f"_bucket_expr needs a column name (str), got {type(vec).__name__}"
        )
    from pyspark.sql import SparkSession

    sess = SparkSession.getActiveSession()
    key = (vec, tuple(tuple(p) for p in planes))
    per_sess = _BUCKET_CACHE.setdefault(sess, {}) if sess is not None else {}
    cached = per_sess.get(key)
    if cached is not None:
        return cached
    name = f"`{vec}`" if not vec.isidentifier() else vec
    bits = []
    for plane in planes:
        arr = "array(" + ", ".join(f"{x!r}D" for x in plane) + ")"
        d = (
            f"aggregate(zip_with({name}, {arr}, "
            f"(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            f"0.0D, (acc, x) -> acc + x)"
        )
        bits.append(f"CASE WHEN {d} >= 0 THEN '1' ELSE '0' END")
    col = F.expr("concat(" + ", ".join(bits) + ")")
    per_sess[key] = col
    return col


def _allbits_expr(vec: str, families: "list") -> Column:
    """ALL bands' sign bits in ONE HOF: ``transform`` over a 2-D plane
    literal (band-major), each element the SAME ``aggregate(zip_with)``
    left fold `_bucket_expr` inlines per plane — so the produced bits
    are character-identical to concatenating the per-band buckets, at
    one-eightieth the analyzer/codegen surface. The per-plane copy was
    the driver-side hot spot of every banded embedding query: Catalyst
    analyzed and codegen'd 80 separate HOF trees PER ACTION (~3-5 s at
    ANY data size for an 8x10x64 banding); one transform resolves one
    lambda. Caller slices band b with substring(bits, b*planes+1,
    planes) over the MATERIALIZED column (CollapseProject keeps a
    multiply-referenced non-cheap alias, so the fold runs once per
    row)."""
    if not isinstance(vec, str):
        raise TypeError(
            f"_allbits_expr needs a column name (str), got {type(vec).__name__}"
        )
    from pyspark.sql import SparkSession

    sess = SparkSession.getActiveSession()
    key = ("__allbits", vec, tuple(tuple(tuple(p) for p in f) for f in families))
    per_sess = _BUCKET_CACHE.setdefault(sess, {}) if sess is not None else {}
    cached = per_sess.get(key)
    if cached is not None:
        return cached
    name = f"`{vec}`" if not vec.isidentifier() else vec
    rows = []
    for fam in families:
        for plane in fam:
            rows.append(
                "array(" + ", ".join(f"{x!r}D" for x in plane) + ")"
            )
    mat = "array(" + ", ".join(rows) + ")"
    d = (
        f"aggregate(zip_with({name}, p, "
        f"(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"0.0D, (acc, x) -> acc + x)"
    )
    col = F.expr(
        f"concat_ws('', transform({mat}, p -> "
        f"CASE WHEN {d} >= 0 THEN '1' ELSE '0' END))"
    )
    per_sess[key] = col
    return col


def _bucket_sql(vec: str, planes: list[list[float]]) -> str:
    from sqlserver_pg_cdc_spark.functions.vectors import dot_sql

    bits = []
    for plane in planes:
        arr = "[" + ", ".join(repr(x) for x in plane) + "]::DOUBLE[]"
        bits.append(f"CASE WHEN {dot_sql(vec, arr)} >= 0 THEN '1' ELSE '0' END")
    return " || ".join(bits)


def with_lsh_bucket(
    df: DataFrame, vec_col: str, n_planes: int = 8, dim: int = 64, seed: str = "ann-seed"
) -> DataFrame:
    """Materialize the LSH bucket column (precompute once at ingest)."""
    return df.withColumn(
        "lsh_bucket", _bucket_expr(vec_col, hyperplanes(n_planes, dim, seed))
    )


def topk_brute_force(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str | None = None,
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine per query: (query_id, rank, id, cosine).

    Ties break on the candidate id for full determinism.
    """
    from sqlserver_pg_cdc_spark.functions.vectors import dot, norm

    qid = query_id_col or id_col
    # NULL vectors have no direction — excluded on both engines
    vectors = vectors.filter(F.col(vec_col).isNotNull())
    queries = queries.filter(F.col(vec_col).isNotNull())
    # norms precomputed ONCE per vector — cosine() inline would recompute
    # both norms per (query, candidate) pair, an O(N*Q*d) waste
    q = F.broadcast(
        queries.select(
            F.col(qid).alias("query_id"),
            F.col(vec_col).alias("qv"),
            norm(vec_col).alias("qn"),
        )
    )
    v = vectors.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), norm(vec_col).alias("vn")
    )
    scored = q.crossJoin(v).filter(F.col("query_id") != F.col("id")).select(
        "query_id",
        "id",
        (dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("vn"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "id", "cosine")
    )


def topk_brute_force_sql(
    table: str,
    id_col: str,
    vec_col: str,
    query_pred: str,
    k: int = 10,
) -> str:
    """Oracle twin; ``query_pred`` selects the query rows (e.g. 'vec_id < 5')."""
    cos = cosine_sql("q.qv", "v.v")
    return f"""
WITH q AS (SELECT {id_col} AS query_id, {vec_col} AS qv FROM {table}
           WHERE ({query_pred}) AND {vec_col} IS NOT NULL),
     v AS (SELECT {id_col} AS id, {vec_col} AS v FROM {table}
           WHERE {vec_col} IS NOT NULL)
SELECT query_id, rank, id, cosine FROM (
    SELECT query_id, id, {cos} AS cosine,
           row_number() OVER (PARTITION BY query_id ORDER BY {cos} DESC, id) AS rank
    FROM q, v WHERE query_id <> id
) WHERE rank <= {k}
"""


def train_ivf_centroids(
    vectors: DataFrame,
    vec_col: str,
    n_cells: int = 16,
    max_iter: int = 20,
    seed: int = 42,
) -> DataFrame:
    """Distributed spherical k-means producing the centroid table
    ``(cell_id, cv, cn)`` that with_ivf_cell/topk_ivf consume.

    Vectors are L2-normalized first, so euclidean Lloyd's on the unit
    sphere optimizes the cosine objective the IVF probe uses. Training
    runs through Spark ML's KMeans (k-means|| init, map-side partial
    assignment per iteration — fully distributed; only the k centers
    ever reach the driver). Centroids are NOT renormalized: the cosine
    assignment divides by ``cn`` anyway, and keeping the raw means is
    standard IVF practice."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from sqlserver_pg_cdc_spark.functions.vectors import norm

    nrm = norm(vec_col)
    unit = vectors.select(
        F.transform(F.col(vec_col), lambda x: x.cast("double") / nrm).alias("__uv")
    )
    feats = unit.select(array_to_vector("__uv").alias("features"))
    model = KMeans(k=n_cells, maxIter=max_iter, seed=seed, featuresCol="features").fit(
        feats
    )
    spark = vectors.sparkSession
    rows = [
        (i, [float(x) for x in center])
        for i, center in enumerate(model.clusterCenters())
    ]
    cents = spark.createDataFrame(rows, "cell_id int, cv array<double>")
    return cents.select("cell_id", "cv", norm("cv").alias("cn"))


def _cell_argmax_expr(cents: list) -> str:
    """Max-cosine cell id over ``__v``/``__vn`` columns as ONE
    JVM-parsed literal expression (the py4j-literal-expression-cost
    pattern, see _bucket_expr): no k-way row blowup, no shuffle, no
    window. ``cents`` are collected (cell_id, cv, cn) rows sorted by
    cell_id; the fold keeps the FIRST max, matching the
    (cc DESC, cell_id ASC) window tiebreak."""
    cell_structs = []
    for r in cents:
        # NOTE perf: an unrolled 0.0D + v[0]*c0 + ... form was tried and
        # MEASURED SLOWER (4.0s vs 1.8s steady at sf0.1) — the 16x64-term
        # tree defeats whole-stage codegen; the HOF fold stays.
        lits = ", ".join(f"{float(x)!r}D" for x in r["cv"])
        d = (
            f"aggregate(zip_with(__v, array({lits}), "
            "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, "
            "(acc, x) -> acc + x)"
        )
        cc = f"({d} / (__vn * {float(r['cn'])!r}D))"
        cell_structs.append(
            f"named_struct('cc', {cc}, 'cell', {int(r['cell_id'])})"
        )
    return (
        f"aggregate(slice(array({', '.join(cell_structs)}), 2, "
        f"{len(cell_structs) - 1}), {cell_structs[0]}, "
        "(acc, x) -> IF(x.cc > acc.cc, x, acc)).cell"
    )


def with_ivf_cell(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int = 16,
    centroids: DataFrame | None = None,
    centroid_rows: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """IVF-flat cell assignment: every vector goes to its max-cosine
    cell. Returns (assigned, centroids).

    ``centroids`` should come from :func:`train_ivf_centroids` (the
    scale path: k-means-trained cells, the assigned table written
    partitioned by cell, queries probing only their nearest cells).
    Without it, the first ``n_cells`` vectors by id stand in as
    deterministic centroids — fine for tests and oracles, not for
    production recall.

    ``centroid_rows``: ALREADY-collected ``(cell_id, cv, cn)`` rows —
    the seam for callers that hold the epoch on the driver (e.g.
    `DiversitySampleSink`'s validated epoch cache): assignment then
    costs ZERO Spark jobs here instead of a createDataFrame + collect
    round trip per call. The rows must be exactly what collecting
    ``centroids`` would return (same floats, same fields)."""
    from sqlserver_pg_cdc_spark.functions.vectors import norm

    # NULL vectors have no direction: exclude them from cells, centroid
    # seeds, and candidates on BOTH engines (the SQL twins filter too)
    vectors = vectors.filter(F.col(vec_col).isNotNull())
    if centroids is None and centroid_rows is None:
        centroids = (
            vectors.orderBy(id_col).limit(n_cells)
            .select(F.col(id_col).alias("cell_id"), F.col(vec_col).alias("cv"),
                    norm(vec_col).alias("cn"))
        )
    # Assignment is a PER-ROW argmax over the k centroids, built as one
    # JVM-parsed literal expression (the py4j-literal-expression-cost
    # pattern, see _bucket_expr): no k-way row blowup, no shuffle, no
    # window — the old crossJoin+row_number form amplified the corpus
    # k-fold through an exchange, which at warehouse scale dominates the
    # whole IVF build. Collecting the centroids is bounded by design
    # (k rows — they already fit a broadcast). Float semantics are
    # identical: same dot-fold order, same divide, and the fold keeps
    # the FIRST max (cells iterated by ascending cell_id), matching the
    # (cc DESC, cell_id ASC) window tiebreak.
    cents = (
        sorted(centroid_rows, key=lambda r: r["cell_id"])
        if centroid_rows is not None
        else sorted(centroids.collect(), key=lambda r: r["cell_id"])
    )
    if not cents:  # empty corpus: no cells, no assignments
        assigned = vectors.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            F.lit(None).cast("int").alias("cell_id"),
        ).limit(0)
        return assigned, centroids
    argmax = _cell_argmax_expr(cents)
    assigned = (
        vectors.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("__v"),
            norm(vec_col).alias("__vn"),
        )
        .select("id", F.col("__v").alias("v"), F.expr(argmax).alias("cell_id"))
    )
    return assigned, centroids


def topk_ivf(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 2,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF search: assign corpus to cells once, probe each query's
    ``n_probe`` nearest cells, exact cosine within the probed candidates.
    Pass ``centroids`` from train_ivf_centroids for trained cells."""
    assigned, centroids = with_ivf_cell(
        vectors, id_col, vec_col, n_cells, centroids=centroids
    )
    return topk_ivf_assigned(
        assigned, centroids, queries, id_col, vec_col, k=k, n_probe=n_probe
    )


def topk_ivf_assigned(
    assigned: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """The probe phase of IVF search against a PREBUILT cell-assigned
    corpus ``(id, v, cell_id)`` — the path both the one-shot build and
    the stream-maintained index (`streaming/ann.IvfIndexSink`) share:
    each query ranks the centroids, fetches only its ``n_probe`` cells'
    candidates, exact cosine within them."""
    from pyspark.sql import Window as W

    from sqlserver_pg_cdc_spark.functions.vectors import dot, norm

    queries = queries.filter(F.col(vec_col).isNotNull())  # no direction
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
                       norm(vec_col).alias("qn"))
    qs = q.crossJoin(F.broadcast(centroids)).select(
        "query_id", "qv", "qn", "cell_id",
        (dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cc"),
    )
    wq = W.partitionBy("query_id").orderBy(F.col("cc").desc(), F.col("cell_id"))
    probes = (
        qs.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qv", "qn", "cell_id")
    )
    # assigned carries v but not vn (with_ivf_cell drops it); re-derive once
    assigned_n = assigned.withColumn("vn", norm(F.col("v")))
    scored = (
        F.broadcast(probes)
        .join(assigned_n, "cell_id")
        .filter(F.col("query_id") != F.col("id"))
        .select("query_id", "id",
                (dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("vn"))).alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "id", "cosine")
    )


def topk_ivf_sql(
    table: str,
    id_col: str,
    vec_col: str,
    query_pred: str,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 2,
) -> str:
    """Oracle twin of topk_ivf with the deterministic first-k-vector
    centroids: same max-cosine cell assignment (ties to the lowest
    cell), same n_probe nearest cells per query, same within-candidate
    exact ranking — value-identical to the Spark plan."""
    cell_cos = cosine_sql("x.v", "c.cv")
    q_cos = cosine_sql("q.qv", "c.cv")
    final_cos = cosine_sql("p.qv", "a.v")
    return f"""
WITH cent AS (
    SELECT {id_col} AS cell_id, {vec_col} AS cv
    FROM {table} WHERE {vec_col} IS NOT NULL ORDER BY {id_col} LIMIT {n_cells}
),
assigned AS (
    SELECT id, v, cell_id FROM (
        SELECT x.id, x.v, c.cell_id,
               row_number() OVER (PARTITION BY x.id
                                  ORDER BY {cell_cos} DESC, c.cell_id) AS rn
        FROM (SELECT {id_col} AS id, {vec_col} AS v FROM {table}
              WHERE {vec_col} IS NOT NULL) x, cent c
    ) WHERE rn = 1
),
probes AS (
    SELECT query_id, qv, cell_id FROM (
        SELECT q.query_id, q.qv, c.cell_id,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY {q_cos} DESC, c.cell_id) AS rn
        FROM (SELECT {id_col} AS query_id, {vec_col} AS qv
              FROM {table} WHERE ({query_pred}) AND {vec_col} IS NOT NULL) q, cent c
    ) WHERE rn <= {n_probe}
)
SELECT query_id, rank, id, cosine FROM (
    SELECT p.query_id, a.id, {final_cos} AS cosine,
           row_number() OVER (PARTITION BY p.query_id
                              ORDER BY {final_cos} DESC, a.id) AS rank
    FROM probes p JOIN assigned a ON p.cell_id = a.cell_id
    WHERE p.query_id <> a.id
) WHERE rank <= {k}
"""


def topk_lsh_sql(
    table: str,
    id_col: str,
    vec_col: str,
    query_pred: str,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    seed: str = "ann-seed",
) -> str:
    """Oracle twin of topk_lsh (single-bucket form, multiprobe=False):
    the md5-derived hyperplanes are engine-independent constants, so the
    bucket strings — and therefore the candidate sets — match exactly."""
    bucket = _bucket_sql("v", hyperplanes(n_planes, dim, seed))
    q_bucket = _bucket_sql("qv", hyperplanes(n_planes, dim, seed))
    cos = cosine_sql("q.qv", "x.v")
    return f"""
WITH v AS (SELECT {id_col} AS id, {vec_col} AS v, {bucket} AS bucket FROM {table}
           WHERE {vec_col} IS NOT NULL),
q AS (SELECT {id_col} AS query_id, {vec_col} AS qv, {q_bucket} AS bucket
      FROM {table} WHERE ({query_pred}) AND {vec_col} IS NOT NULL)
SELECT query_id, rank, id, cosine FROM (
    SELECT q.query_id, x.id, {cos} AS cosine,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {cos} DESC, x.id) AS rank
    FROM q JOIN v x ON q.bucket = x.bucket
    WHERE q.query_id <> x.id
) WHERE rank <= {k}
"""


def topk_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    seed: str = "ann-seed",
    multiprobe: bool = True,
) -> DataFrame:
    """LSH-bucketed top-k: score only same-bucket candidates (plus
    Hamming-1 probe buckets when ``multiprobe``)."""
    from sqlserver_pg_cdc_spark.functions.vectors import dot, norm

    # NULL vectors have no direction — excluded on both engines
    vectors = vectors.filter(F.col(vec_col).isNotNull())
    queries = queries.filter(F.col(vec_col).isNotNull())

    planes = hyperplanes(n_planes, dim, seed)
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                       norm(vec_col).alias("vn")).withColumn(
        "bucket", _bucket_expr("v", planes)
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        norm(vec_col).alias("qn"),
    ).withColumn("qbucket", _bucket_expr("qv", planes))
    if multiprobe:
        # query probes its own bucket and every Hamming-1 neighbor
        flips = [q.select("query_id", "qv", "qn", F.col("qbucket").alias("probe"))]
        for i in range(1, n_planes + 1):
            flipped_bit = F.when(
                F.substring("qbucket", i, 1) == "1", F.lit("0")
            ).otherwise(F.lit("1"))
            probe = F.concat(
                F.substring("qbucket", 1, i - 1),
                flipped_bit,
                F.substring("qbucket", i + 1, n_planes - i),
            )
            flips.append(q.select("query_id", "qv", "qn", probe.alias("probe")))
        probes = flips[0]
        for fdf in flips[1:]:
            probes = probes.unionByName(fdf)
    else:
        probes = q.select("query_id", "qv", "qn", F.col("qbucket").alias("probe"))
    scored = (
        F.broadcast(probes)
        .join(v, probes.probe == v.bucket)
        .filter(F.col("query_id") != F.col("id"))
        .select("query_id", "id",
                (dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("vn"))).alias("cosine"))
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "id", "cosine")
    )


# --- product quantization (PQ) ----------------------------------------------
#
# The 100 TB memory story for embedding search: a 64-dim float vector is
# 256 B; its PQ code (m_sub codes of <=256 entries each) is m_sub bytes —
# a 32x compression at the defaults, which is what lets a candidate scan
# hold the WHOLE corpus's codes in a fraction of the raw footprint while
# the full vectors stay in cold parquet, touched only for the final
# re-rank of a few candidates per query. Reference analog: the
# reference's validation plane bounds its working set the same way
# (checksums stand in for rows); here codes stand in for vectors.


def pq_codebooks(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    m_sub: int = 8,
    k_codes: int = 16,
) -> list[list[tuple[float, ...]]]:
    """Deterministic codebooks for oracles and tests: subvector slices of
    the first ``k_codes`` non-NULL vectors by id (the first-k-vectors
    discipline with_ivf_cell uses). ``[m][j]`` -> j-th codeword of
    subspace m. Production recall wants :func:`train_pq_codebooks`."""
    rows = (
        vectors.filter(F.col(vec_col).isNotNull())
        .orderBy(id_col)
        .limit(k_codes)
        .select(F.col(vec_col).alias("v"))
        .collect()
    )
    if not rows:
        return []
    d = len(rows[0]["v"])
    if d % m_sub != 0:
        raise ValueError(f"dim {d} not divisible into {m_sub} subspaces")
    sub = d // m_sub
    return [
        [
            tuple(float(x) for x in r["v"][m * sub : (m + 1) * sub])
            for r in rows
        ]
        for m in range(m_sub)
    ]


def train_pq_codebooks(
    vectors: DataFrame,
    vec_col: str,
    m_sub: int = 8,
    k_codes: int = 16,
    max_iter: int = 20,
    seed: int = 42,
) -> list[list[tuple[float, ...]]]:
    """k-means-trained codebooks (the production path): one distributed
    KMeans per subspace over that subspace's slices. m_sub small jobs;
    only m_sub*k_codes codewords ever reach the driver. Not
    SQL-reproducible (k-means|| init) — recall is pytest-checked against
    brute force instead, like train_ivf_centroids."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # normalize the element type: parquet written elsewhere may carry
    # float or decimal arrays, and array_to_vector up-casts only from
    # double — train on the same double space the encode expressions use
    vectors = vectors.withColumn(
        vec_col, F.col(vec_col).cast("array<double>")
    )
    first = vectors.filter(F.col(vec_col).isNotNull()).select(
        F.size(vec_col).alias("d")
    ).limit(1).collect()
    if not first:
        return []
    d = first[0]["d"]
    if d % m_sub != 0:
        raise ValueError(f"dim {d} not divisible into {m_sub} subspaces")
    sub = d // m_sub
    src = vectors.filter(F.col(vec_col).isNotNull()).select(
        *[
            F.slice(F.col(vec_col), m * sub + 1, sub).alias(f"__s{m}")
            for m in range(m_sub)
        ]
    ).persist()
    try:
        books = []
        for m in range(m_sub):
            feats = src.select(array_to_vector(f"__s{m}").alias("features"))
            model = KMeans(
                k=k_codes, maxIter=max_iter, seed=seed + m,
                featuresCol="features",
            ).fit(feats)
            books.append(
                [tuple(float(x) for x in c) for c in model.clusterCenters()]
            )
        return books
    finally:
        src.unpersist()


def _pq_lit_dot(vec_sql: str, codeword: tuple[float, ...]) -> str:
    """dot(<expr>, <literal codeword>) with the exact fold order of
    functions.vectors.dot — double cast on the data side, literal
    doubles on the codeword side."""
    lits = ", ".join(f"{float(x)!r}D" for x in codeword)
    return (
        f"aggregate(zip_with({vec_sql}, array({lits}), "
        "(x, y) -> CAST(x AS DOUBLE) * y), 0.0D, (acc, x) -> acc + x)"
    )


def _pq_codes_expr(vec: str, books: list) -> str:
    """PQ encode as ONE literal expression: array(code_0 .. code_{M-1}),
    code_m = argmax_j of score_j = dot(sub_m, cb[m][j]) - 0.5*|cb[m][j]|²
    (equivalent to min squared distance; the shared dot(sub,sub) term is
    dropped so both engines compare the SAME floats). First-max fold over
    ascending j mirrors the oracle's (score DESC, j ASC) row_number."""
    sub = len(books[0][0])
    per_m = []
    for m, book in enumerate(books):
        s = f"slice({vec}, {m * sub + 1}, {sub})"
        structs = []
        for j, cw in enumerate(book):
            half = _pq_lit_dot(
                "array(" + ", ".join(f"{float(x)!r}D" for x in cw) + ")", cw
            )
            score = f"({_pq_lit_dot(s, cw)} - 0.5D * {half})"
            structs.append(f"named_struct('s', {score}, 'c', {j})")
        fold = (
            f"aggregate(slice(array({', '.join(structs)}), 2, "
            f"{len(structs) - 1}), {structs[0]}, "
            "(acc, x) -> IF(x.s > acc.s, x, acc)).c"
        )
        per_m.append(fold)
    return f"array({', '.join(per_m)})"


def _pq_lut_expr(vec: str, books: list) -> str:
    """Per-query ADC lookup table as one literal expression:
    array(array(dot(q_sub_m, cb[m][j]) for j) for m)."""
    sub = len(books[0][0])
    rows = []
    for m, book in enumerate(books):
        s = f"slice({vec}, {m * sub + 1}, {sub})"
        rows.append(
            "array(" + ", ".join(_pq_lit_dot(s, cw) for cw in book) + ")"
        )
    return f"array({', '.join(rows)})"


def pq_encode(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    books: list,
) -> DataFrame:
    """(id, codes array<int>) — the compact searchable form. A pure
    narrow projection (literal argmax per subspace, see
    _cell_argmax_expr for why literals beat a k-way join): no shuffle,
    no join, whole-stage codegen end to end."""
    vectors = vectors.filter(F.col(vec_col).isNotNull())
    return vectors.select(
        F.col(id_col).alias("id"),
        F.expr(_pq_codes_expr(vec_col, books)).alias("codes"),
    )


def topk_pq(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    m_sub: int = 8,
    k_codes: int = 16,
    refine: int = 32,
    books: list | None = None,
) -> DataFrame:
    """PQ/ADC top-k: encode the corpus to codes, score candidates by
    asymmetric distance (sum of per-subspace LUT hits — approximate dot
    against the query), keep the top ``refine`` per query, then exact
    cosine re-rank of only those. Output (query_id, rank, id, cosine)
    matches the rest of the ANN family; cosines are EXACT (the
    approximation only shapes the candidate set).

    Scale shape: codes are a narrow per-row projection of the corpus
    (no shuffle); the ADC scan is a broadcast of Q queries' LUTs over
    the codes (no N-side shuffle before the per-query top-refine); the
    re-rank touches ≤ Q*refine full vectors via an id semi-join."""
    from pyspark.sql import Window as W

    from sqlserver_pg_cdc_spark.functions.vectors import dot, norm

    vectors = vectors.filter(F.col(vec_col).isNotNull())
    queries = queries.filter(F.col(vec_col).isNotNull())
    if books is None:
        books = pq_codebooks(vectors, id_col, vec_col, m_sub, k_codes)
    if not books:  # empty corpus
        return (
            vectors.select(
                F.col(id_col).alias("query_id"),
                F.lit(0).alias("rank"),
                F.col(id_col).alias("id"),
                F.lit(0.0).alias("cosine"),
            ).limit(0)
        )
    codes = pq_encode(vectors, id_col, vec_col, books)
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    return topk_pq_encoded(
        codes, v, queries, id_col, vec_col, books, k=k, refine=refine
    )


def topk_pq_encoded(
    codes: DataFrame,
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    books: list,
    k: int = 10,
    refine: int = 32,
) -> DataFrame:
    """The probe phase of PQ search against a PREBUILT codes table
    ``(id, codes)`` plus the raw vectors ``(id, v)`` for the re-rank —
    the path the one-shot `topk_pq` and the stream-maintained
    `streaming/ann.PqIndexSink` share."""
    from pyspark.sql import Window as W

    from sqlserver_pg_cdc_spark.functions.vectors import dot, norm

    m_sub = len(books)
    queries = queries.filter(F.col(vec_col).isNotNull())
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(vec_col).alias("qn"),
        F.expr(_pq_lut_expr(vec_col, books)).alias("lut"),
    )
    # approx dot = lut[0][code_0] + ... + lut[M-1][code_{M-1}], expanded
    # left-to-right so the oracle's scalar chain adds in the same order
    approx = " + ".join(
        f"element_at(element_at(lut, {m + 1}), "
        f"element_at(codes, {m + 1}) + 1)"
        for m in range(m_sub)
    )
    scored = (
        F.broadcast(q.select("query_id", "lut"))
        .crossJoin(codes)
        .filter(F.col("query_id") != F.col("id"))
        .select("query_id", "id", F.expr(approx).alias("approx"))
    )
    wq = W.partitionBy("query_id").orderBy(F.col("approx").desc(), F.col("id"))
    cand = (
        scored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= refine)
        .select("query_id", "id")
    )
    v = vectors.select("id", "v", norm(F.col("v")).alias("vn"))
    rerank = (
        F.broadcast(cand)
        .join(v, "id")
        .join(F.broadcast(q.select("query_id", "qv", "qn")), "query_id")
        .select(
            "query_id", "id",
            (dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("vn"))).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("id"))
    return (
        rerank.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "id", "cosine")
    )


def topk_pq_sql(
    table: str,
    id_col: str,
    vec_col: str,
    query_pred: str,
    k: int = 10,
    m_sub: int = 8,
    k_codes: int = 16,
    refine: int = 32,
    dim: int = 64,
) -> str:
    """Oracle twin of topk_pq with the deterministic first-k codebooks,
    recomputed relationally: same encode argmax (score DESC, code ASC),
    same left-to-right ADC sum, same top-refine candidate cut, same
    exact re-rank. MATERIALIZED CTEs — the encode chain is referenced
    once per stage but nests slices of slices and DuckDB's inliner
    re-expands it."""
    from sqlserver_pg_cdc_spark.functions.vectors import dot_sql

    sub = dim // m_sub
    dot_xc = dot_sql(f"list_slice(x.v, cb.m * {sub} + 1, (cb.m + 1) * {sub})", "cb.cv")
    half = dot_sql("cb.cv", "cb.cv")
    dot_qc = dot_sql(f"list_slice(q.qv, cb.m * {sub} + 1, (cb.m + 1) * {sub})", "cb.cv")
    adc = " + ".join(f"l.lut[{m + 1}][c.codes[{m + 1}] + 1]" for m in range(m_sub))
    final_cos = cosine_sql("q.qv", "v.v")
    return f"""
WITH v AS MATERIALIZED (
    SELECT {id_col} AS id, {vec_col} AS v FROM {table}
    WHERE {vec_col} IS NOT NULL
),
cbsrc AS MATERIALIZED (
    SELECT v, row_number() OVER (ORDER BY id) - 1 AS j
    FROM (SELECT id, v FROM v ORDER BY id LIMIT {k_codes})
),
cb AS MATERIALIZED (
    SELECT mm.m, s.j,
           list_slice(s.v, mm.m * {sub} + 1, (mm.m + 1) * {sub}) AS cv
    FROM cbsrc s CROSS JOIN (SELECT unnest(range({m_sub})) AS m) mm
),
enc AS MATERIALIZED (
    SELECT id, m, code FROM (
        SELECT x.id, cb.m, cb.j AS code,
               row_number() OVER (
                   PARTITION BY x.id, cb.m
                   ORDER BY ({dot_xc} - 0.5 * {half}) DESC, cb.j
               ) AS rn
        FROM v x CROSS JOIN cb
    ) WHERE rn = 1
),
codes AS MATERIALIZED (
    SELECT id, list(code ORDER BY m) AS codes FROM enc GROUP BY id
),
q AS MATERIALIZED (
    SELECT {id_col} AS query_id, {vec_col} AS qv FROM {table}
    WHERE ({query_pred}) AND {vec_col} IS NOT NULL
),
lutrow AS MATERIALIZED (
    SELECT q.query_id, cb.m, list({dot_qc} ORDER BY cb.j) AS row
    FROM q CROSS JOIN cb GROUP BY q.query_id, cb.m
),
lut AS MATERIALIZED (
    SELECT query_id, list(row ORDER BY m) AS lut FROM lutrow GROUP BY query_id
),
cand AS MATERIALIZED (
    SELECT query_id, id FROM (
        SELECT l.query_id, c.id,
               row_number() OVER (
                   PARTITION BY l.query_id
                   ORDER BY ({adc}) DESC, c.id
               ) AS rn
        FROM lut l CROSS JOIN codes c WHERE l.query_id <> c.id
    ) WHERE rn <= {refine}
)
SELECT query_id, rank, id, cosine FROM (
    SELECT q.query_id, v.id, {final_cos} AS cosine,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {final_cos} DESC, v.id) AS rank
    FROM cand JOIN v ON cand.id = v.id
    JOIN q ON q.query_id = cand.query_id
) WHERE rank <= {k}
"""


def topk_ivfpq(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 2,
    m_sub: int = 8,
    k_codes: int = 16,
    refine: int = 32,
    centroids: DataFrame | None = None,
    books: list | None = None,
) -> DataFrame:
    """IVF-PQ composite top-k — the billion-scale ANN shape (coarse
    inverted cells + product-quantized RESIDUALS, the FAISS IVFPQ
    layout): every vector is assigned to its max-cosine cell and its
    residual ``v - centroid`` is PQ-encoded; a query ranks the
    centroids, builds one ADC lookup table per PROBED CELL over its own
    residual ``q - centroid`` (residual space is cell-relative — a
    single query-level LUT would score against the wrong origin),
    ADC-scans ONLY the probed cells' codes, keeps the top ``refine``
    candidates, and exact-cosine re-ranks just those. Output
    (query_id, rank, id, cosine) matches the ANN family; cosines are
    EXACT (the quantization only shapes the candidate set).

    Scale shape: the cell scan touches n_probe/n_cells of the corpus
    and reads CODES (m_sub bytes/vector), not vectors — memory traffic
    is compressed 32x AND localized; the LUT table is Q*n_probe rows
    broadcast over the probed codes; the re-rank semi-joins
    <= Q*refine raw vectors. Defaults are test-scale; production wants
    `train_ivf_centroids` cells + `train_pq_codebooks` books (pass
    both), sqrt(N)-ish n_cells, and the codes table written partitioned
    by cell_id so a probe is a partition-pruned scan.

    Deterministic (oracle) form without trained inputs: centroids =
    first ``n_cells`` vectors by id (`with_ivf_cell`), books =
    per-subspace slices of the first ``k_codes`` RESIDUALS by id —
    recomputed relationally by :func:`topk_ivfpq_sql`."""
    from pyspark.sql import Window as W

    from sqlserver_pg_cdc_spark.functions.vectors import dot, norm, vsub

    vectors = vectors.filter(F.col(vec_col).isNotNull())
    queries = queries.filter(F.col(vec_col).isNotNull())
    assigned, cents = with_ivf_cell(
        vectors, id_col, vec_col, n_cells, centroids
    )
    cvt = cents.select("cell_id", F.col("cv").alias("__cv"))
    # corr = dot(c, v), stored exact per vector at build: the
    # inner-product decomposition dot(q,v) = dot(q-c, v-c) + dot(q,c)
    # + dot(c,v) - |c|^2 means ranking by the residual ADC alone
    # misorders candidates whose dot(c,v) differ — the per-candidate
    # correction restores plain-PQ ranking quality inside the probed
    # cells (|c|^2 and dot(q,c) ride the query-cell row)
    resid = assigned.join(F.broadcast(cvt), "cell_id").select(
        "cell_id", "id", "v",
        vsub("v", "__cv").alias("r"),
        dot(F.col("__cv"), F.col("v")).alias("corr"),
    )
    if books is None:
        # codebooks are the first k_codes residuals by id: derive them
        # from the corpus HEAD instead of letting pq_codebooks'
        # TakeOrdered evaluate the full-corpus cell argmax + vsub just
        # to keep k_codes rows (guide §1.2: don't compute things you
        # throw away). Identical floats: assignment is per-row, so the
        # head's residuals equal the head rows of the full residual
        # frame.
        seed = vectors.orderBy(id_col).limit(k_codes)
        seed_assigned, _ = with_ivf_cell(
            seed, id_col, vec_col, n_cells, centroids=cents
        )
        seed_resid = seed_assigned.join(F.broadcast(cvt), "cell_id").select(
            "id", vsub("v", "__cv").alias("r")
        )
        books = pq_codebooks(seed_resid, "id", "r", m_sub, k_codes)
    if not books:  # empty corpus
        return queries.select(
            F.col(id_col).alias("query_id"),
            F.lit(0).alias("rank"),
            F.col(id_col).alias("id"),
            F.lit(0.0).alias("cosine"),
        ).limit(0)
    codes = resid.select(
        "cell_id", "id", "corr",
        F.expr(_pq_codes_expr("r", books)).alias("codes"),
    )
    v = vectors.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    )
    return topk_ivfpq_encoded(
        codes, v, cents, queries, id_col, vec_col, books,
        k=k, n_probe=n_probe, refine=refine,
    )


def topk_ivfpq_encoded(
    codes: DataFrame,
    vectors: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    books: list,
    k: int = 10,
    n_probe: int = 2,
    refine: int = 32,
) -> DataFrame:
    """The probe phase of IVF-PQ search against a PREBUILT
    ``(cell_id, id, corr, codes)`` table plus the raw vectors
    ``(id, v)`` for the re-rank — the path the one-shot
    :func:`topk_ivfpq` and the stream-maintained
    `streaming/ann.IvfPqIndexSink` share."""
    from pyspark.sql import Window as W

    from sqlserver_pg_cdc_spark.functions.vectors import dot, norm, vsub

    cvt = centroids.select("cell_id", F.col("cv").alias("__cv"))
    queries = queries.filter(F.col(vec_col).isNotNull())
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(vec_col).alias("qn"),
    )
    qs = q.crossJoin(F.broadcast(centroids)).select(
        "query_id", "qv", "qn", "cell_id",
        (dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias(
            "cc"
        ),
    )
    wq = W.partitionBy("query_id").orderBy(
        F.col("cc").desc(), F.col("cell_id")
    )
    probes = (
        qs.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qv", "cell_id")
    )
    qlut = (
        probes.join(F.broadcast(cvt), "cell_id")
        .withColumn("__qr", vsub("qv", "__cv"))
        .select(
            "query_id", "cell_id",
            (dot(F.col("qv"), F.col("__cv"))
             - dot(F.col("__cv"), F.col("__cv"))).alias("qc"),
            F.expr(_pq_lut_expr("__qr", books)).alias("lut"),
        )
    )
    lut_sum = " + ".join(
        f"element_at(element_at(lut, {m + 1}), "
        f"element_at(codes, {m + 1}) + 1)"
        for m in range(len(books))
    )
    # approx dot(q, v): qc (= dot(q,c) - |c|^2, per query-cell) + corr
    # (= dot(c,v), per candidate) + residual ADC — added left-to-right,
    # mirrored verbatim by the oracle's scalar chain
    scored = (
        F.broadcast(qlut)
        .join(codes, "cell_id")
        .filter(F.col("query_id") != F.col("id"))
        .select(
            "query_id", "id",
            F.expr(f"qc + corr + {lut_sum}").alias("approx"),
        )
    )
    wc = W.partitionBy("query_id").orderBy(F.col("approx").desc(), F.col("id"))
    cand = (
        scored.withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") <= refine)
        .select("query_id", "id")
    )
    v = vectors.select("id", "v").withColumn("vn", norm(F.col("v")))
    rerank = (
        F.broadcast(cand)
        .join(v, "id")
        .join(F.broadcast(q.select("query_id", "qv", "qn")), "query_id")
        .select(
            "query_id", "id",
            (dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("vn"))).alias(
                "cosine"
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("id"))
    return (
        rerank.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "id", "cosine")
    )


def topk_ivfpq_sql(
    table: str,
    id_col: str,
    vec_col: str,
    query_pred: str,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 2,
    m_sub: int = 8,
    k_codes: int = 16,
    refine: int = 32,
    dim: int = 64,
) -> str:
    """Oracle twin of topk_ivfpq with the deterministic centroids and
    residual codebooks, recomputed relationally: same max-cosine cell
    assignment, same exact residual subtraction (IEEE — bit-identical
    across engines), same encode argmax (score DESC, code ASC), same
    per-(query, probed-cell) residual LUTs, same left-to-right ADC sum
    and candidate cut, same exact re-rank."""
    from sqlserver_pg_cdc_spark.functions.vectors import (
        cosine_sql,
        dot_sql,
        vsub_sql,
    )

    sub = dim // m_sub
    cell_cos = cosine_sql("x.v", "c.cv")
    q_cos = cosine_sql("q.qv", "c.cv")
    dot_xc = dot_sql(
        f"list_slice(x.r, cb.m * {sub} + 1, (cb.m + 1) * {sub})", "cb.cv"
    )
    half = dot_sql("cb.cv", "cb.cv")
    dot_qc = dot_sql(
        f"list_slice(p.qr, cb.m * {sub} + 1, (cb.m + 1) * {sub})", "cb.cv"
    )
    adc = " + ".join(
        f"l.lut[{m + 1}][c.codes[{m + 1}] + 1]" for m in range(m_sub)
    )
    final_cos = cosine_sql("q.qv", "v.v")
    return f"""
WITH v AS MATERIALIZED (
    SELECT {id_col} AS id, {vec_col} AS v FROM {table}
    WHERE {vec_col} IS NOT NULL
),
cent AS MATERIALIZED (
    SELECT id AS cell_id, v AS cv FROM v ORDER BY id LIMIT {n_cells}
),
assigned AS MATERIALIZED (
    SELECT id, v, cell_id FROM (
        SELECT x.id, x.v, c.cell_id,
               row_number() OVER (PARTITION BY x.id
                                  ORDER BY {cell_cos} DESC, c.cell_id) AS rn
        FROM v x, cent c
    ) WHERE rn = 1
),
resid AS MATERIALIZED (
    SELECT a.cell_id, a.id, {vsub_sql('a.v', 'c.cv')} AS r,
           {dot_sql('c.cv', 'a.v')} AS corr
    FROM assigned a JOIN cent c ON a.cell_id = c.cell_id
),
cbsrc AS MATERIALIZED (
    SELECT r, row_number() OVER (ORDER BY id) - 1 AS j
    FROM (SELECT id, r FROM resid ORDER BY id LIMIT {k_codes})
),
cb AS MATERIALIZED (
    SELECT mm.m, s.j,
           list_slice(s.r, mm.m * {sub} + 1, (mm.m + 1) * {sub}) AS cv
    FROM cbsrc s CROSS JOIN (SELECT unnest(range({m_sub})) AS m) mm
),
enc AS MATERIALIZED (
    SELECT cell_id, id, m, code FROM (
        SELECT x.cell_id, x.id, cb.m, cb.j AS code,
               row_number() OVER (
                   PARTITION BY x.id, cb.m
                   ORDER BY ({dot_xc} - 0.5 * {half}) DESC, cb.j
               ) AS rn
        FROM resid x CROSS JOIN cb
    ) WHERE rn = 1
),
codes AS MATERIALIZED (
    SELECT e.cell_id, e.id, r.corr, list(e.code ORDER BY e.m) AS codes
    FROM enc e JOIN resid r ON e.id = r.id
    GROUP BY e.cell_id, e.id, r.corr
),
q AS MATERIALIZED (
    SELECT {id_col} AS query_id, {vec_col} AS qv FROM {table}
    WHERE ({query_pred}) AND {vec_col} IS NOT NULL
),
probes AS MATERIALIZED (
    SELECT query_id, qv, cell_id, {vsub_sql('qv', 'cv')} AS qr,
           ({dot_sql('qv', 'cv')} - {dot_sql('cv', 'cv')}) AS qc
    FROM (
        SELECT q.query_id, q.qv, c.cell_id, c.cv,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY {q_cos} DESC, c.cell_id) AS rn
        FROM q, cent c
    ) WHERE rn <= {n_probe}
),
lutrow AS MATERIALIZED (
    SELECT p.query_id, p.cell_id, p.qc, cb.m,
           list({dot_qc} ORDER BY cb.j) AS row
    FROM probes p CROSS JOIN cb GROUP BY p.query_id, p.cell_id, p.qc, cb.m
),
lut AS MATERIALIZED (
    SELECT query_id, cell_id, qc, list(row ORDER BY m) AS lut
    FROM lutrow GROUP BY query_id, cell_id, qc
),
cand AS MATERIALIZED (
    SELECT query_id, id FROM (
        SELECT l.query_id, c.id,
               row_number() OVER (
                   PARTITION BY l.query_id
                   ORDER BY (l.qc + c.corr + {adc}) DESC, c.id
               ) AS rn
        FROM lut l JOIN codes c ON l.cell_id = c.cell_id
        WHERE l.query_id <> c.id
    ) WHERE rn <= {refine}
)
SELECT query_id, rank, id, cosine FROM (
    SELECT q.query_id, v.id, {final_cos} AS cosine,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {final_cos} DESC, v.id) AS rank
    FROM cand JOIN v ON cand.id = v.id
    JOIN q ON q.query_id = cand.query_id
) WHERE rank <= {k}
"""
