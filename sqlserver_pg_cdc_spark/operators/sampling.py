"""Deterministic sampling for training-data pipelines.

``df.sample()`` is seed-dependent per partitioning and not reproducible
across engines or re-runs with different file splits. These samplers
derive the keep/drop decision from a content hash of the key, so the
sample is a pure function of the data:

- ``deterministic_sample``: keep rows whose md5(key) mod 10^6 falls
  under the fraction — stable across engines, partitionings, and runs;
  also gives consistent train/holdout splits (disjoint fractions).
- ``stratified_sample``: at most n rows per stratum, chosen by hash
  order (a deterministic shuffle), via a per-stratum row_number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def _hash_bucket(key_col: str):
    return F.pmod(
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 12), 16, 10)
        .cast("bigint"),
        F.lit(_BUCKETS),
    )


def _hash_bucket_sql(key_col: str) -> str:
    return (
        f"((('0x' || substr(md5(CAST({key_col} AS VARCHAR)), 1, 12))::BIGINT) % {_BUCKETS})"
    )


def deterministic_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Content-hash Bernoulli sample: stable under re-runs and engines."""
    threshold = int(fraction * _BUCKETS)
    return df.filter(_hash_bucket(key_col) < threshold)


def deterministic_sample_sql(table: str, key_col: str, fraction: float) -> str:
    threshold = int(fraction * _BUCKETS)
    return f"SELECT * FROM {table} WHERE {_hash_bucket_sql(key_col)} < {threshold}"


def weighted_sample(
    df: DataFrame, key_col: str, weight_col: str, fraction: float
) -> DataFrame:
    """Quality-weighted Bernoulli sample: keep probability =
    clamp(weight, 0, 1) * fraction, decided by the same content hash —
    the deterministic form of temperature/quality sampling a training
    pipeline uses to up-weight good documents. Reproducible across
    engines, partitionings, and runs; still O(scan) with the predicate
    evaluated in codegen."""
    w = F.least(F.greatest(F.col(weight_col).cast("double"), F.lit(0.0)), F.lit(1.0))
    threshold = F.floor(w * F.lit(float(fraction)) * F.lit(_BUCKETS))
    return df.filter(_hash_bucket(key_col) < threshold)


def weighted_sample_sql(
    table: str, key_col: str, weight_col: str, fraction: float
) -> str:
    w = (
        f"least(greatest(CAST({weight_col} AS DOUBLE), CAST(0 AS DOUBLE)),"
        f" CAST(1 AS DOUBLE))"
    )
    threshold = f"floor({w} * CAST({float(fraction)!r} AS DOUBLE) * {_BUCKETS})"
    return f"SELECT * FROM {table} WHERE {_hash_bucket_sql(key_col)} < {threshold}"


def stratified_sample(
    df: DataFrame, strata_cols: list[str], key_col: str, n_per_stratum: int
) -> DataFrame:
    """<= n rows per stratum, selected by hash order (deterministic)."""
    w = Window.partitionBy(*strata_cols).orderBy(
        _hash_bucket(key_col), F.col(key_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def budget_mix(
    df: DataFrame,
    source_col: str,
    key_col: str,
    token_col: str,
    budgets: dict[str, int],
) -> DataFrame:
    """Token-budgeted corpus mixture (exact): fill each source's token
    budget in deterministic hash order, the mixture-construction step a
    training pipeline runs after filtering ("2 parts web, 1 part code,
    up to N tokens each"). A doc is kept while the source's running
    token sum stays within budget.

    Shape: broadcast the (source, budget) dim (bounded: one row per
    corpus source), ONE window cumsum partitioned by source. NOTE the
    window funnels each source through one task — exact mixing is for
    validation scale / bounded per-source cardinality; the 100 TB path
    is :func:`budget_mix_by_rate` (no window, expected-token budget)."""
    spark = df.sparkSession
    vals = ", ".join(f"('{s}', {int(b)})" for s, b in sorted(budgets.items()))
    bdf = spark.sql(f"SELECT * FROM VALUES {vals} t({source_col}, __budget)")
    w = (
        Window.partitionBy(source_col)
        .orderBy(_hash_bucket(key_col), F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.join(F.broadcast(bdf), source_col)
        .withColumn("cum_tokens", F.sum(F.col(token_col).cast("long")).over(w))
        .filter(F.col("cum_tokens") <= F.col("__budget"))
        .drop("__budget")
    )


def budget_mix_sql(
    table: str,
    source_col: str,
    key_col: str,
    token_col: str,
    budgets: dict[str, int],
) -> str:
    vals = ", ".join(f"('{s}', {int(b)})" for s, b in sorted(budgets.items()))
    return f"""
SELECT * EXCLUDE (__budget) FROM (
    SELECT d.*, b.__budget,
           sum(CAST(d.{token_col} AS BIGINT)) OVER (
               PARTITION BY d.{source_col}
               ORDER BY {_hash_bucket_sql("d." + key_col)}, d.{key_col}
               ROWS UNBOUNDED PRECEDING
           ) AS cum_tokens
    FROM {table} d
    JOIN (VALUES {vals}) AS b({source_col}, __budget)
      ON d.{source_col} = b.{source_col}
)
WHERE cum_tokens <= __budget
"""


def budget_mix_by_rate(
    df: DataFrame,
    source_col: str,
    key_col: str,
    token_col: str,
    budgets: dict[str, int],
) -> DataFrame:
    """Scale-path corpus mixture: instead of an exact per-source cumsum
    (one window task per source), keep each doc with probability
    budget/source_tokens via the content hash — the EXPECTED kept
    tokens hit the budget, with no window and no skew. One tiny agg for
    per-source token totals (broadcast back), then a codegen filter on
    the scan. Fully deterministic: same data + budgets -> same sample,
    on any engine or partitioning."""
    spark = df.sparkSession
    vals = ", ".join(f"('{s}', {int(b)})" for s, b in sorted(budgets.items()))
    bdf = spark.sql(f"SELECT * FROM VALUES {vals} t({source_col}, __budget)")
    totals = df.groupBy(source_col).agg(
        F.sum(F.col(token_col).cast("long")).alias("__total")
    )
    rates = bdf.join(totals, source_col).select(
        source_col,
        F.floor(
            F.least(
                F.lit(1.0),
                F.col("__budget").cast("double") / F.col("__total").cast("double"),
            )
            * F.lit(_BUCKETS)
        ).alias("__thresh"),
    )
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(_hash_bucket(key_col) < F.col("__thresh"))
        .drop("__thresh")
    )


def budget_mix_by_rate_sql(
    table: str,
    source_col: str,
    key_col: str,
    token_col: str,
    budgets: dict[str, int],
) -> str:
    vals = ", ".join(f"('{s}', {int(b)})" for s, b in sorted(budgets.items()))
    return f"""
SELECT d.* FROM {table} d
JOIN (
    SELECT t.{source_col},
           floor(least(CAST(1 AS DOUBLE),
                       CAST(b.__budget AS DOUBLE) / CAST(t.__total AS DOUBLE))
                 * {_BUCKETS}) AS __thresh
    FROM (SELECT {source_col}, sum(CAST({token_col} AS BIGINT)) AS __total
          FROM {table} GROUP BY {source_col}) t
    JOIN (VALUES {vals}) AS b({source_col}, __budget)
      ON t.{source_col} = b.{source_col}
) r ON d.{source_col} = r.{source_col}
WHERE {_hash_bucket_sql("d." + key_col)} < r.__thresh
"""


def stratified_sample_sql(
    table: str, strata_cols: list[str], key_col: str, n_per_stratum: int
) -> str:
    strata = ", ".join(strata_cols)
    return f"""
SELECT * EXCLUDE (__rn) FROM (
    SELECT *, row_number() OVER (
        PARTITION BY {strata}
        ORDER BY {_hash_bucket_sql(key_col)}, {key_col}
    ) AS __rn
    FROM {table}
) WHERE __rn <= {n_per_stratum}
"""


def training_order(
    df: DataFrame, key_col: str, n_shards: int, seed: str = ""
) -> DataFrame:
    """Deterministic global shuffle for training: assign every row a
    shard and a dense position within it, as a pure function of the
    content hash (salted by ``seed`` — a new seed is a new epoch
    order). Reproducible across engines, partitionings, and re-runs;
    no global sort — the only shuffle is the per-shard row_number
    window, keyed on the shard id, and each shard's window is
    1/n_shards of the data (n_shards is sized so a shard fits an
    executor; a global ORDER BY would funnel everything through one
    task's sort at 100 TB).

    Returns ``(key, shard, position)`` with position 1-based and dense
    within each shard. Writers then ``partitionBy(shard)`` +
    ``sortWithinPartitions(position)`` to lay the epoch out on disk."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(key_col).cast("string"), F.lit(f":{seed}"))), 1, 12
        ),
        16,
        10,
    ).cast("bigint")
    out = df.select(F.col(key_col), h.alias("__h"))
    shard = F.pmod(F.col("__h"), F.lit(int(n_shards)))
    w = Window.partitionBy(shard).orderBy(F.col("__h"), F.col(key_col))
    return out.select(
        F.col(key_col),
        shard.cast("long").alias("shard"),
        F.row_number().over(w).cast("long").alias("position"),
    )


def training_order_sql(table: str, key_col: str, n_shards: int, seed: str = "") -> str:
    h = f"(('0x' || substr(md5(CAST({key_col} AS VARCHAR) || ':{seed}'), 1, 12))::BIGINT)"
    return f"""
SELECT {key_col},
       CAST({h} % {int(n_shards)} AS BIGINT) AS shard,
       CAST(row_number() OVER (
           PARTITION BY {h} % {int(n_shards)}
           ORDER BY {h}, {key_col}
       ) AS BIGINT) AS position
FROM {table}
"""


def shard_assignment(df: DataFrame, key_col: str, n_shards: int) -> DataFrame:
    """Deterministic training-shard assignment by content hash:
    engine/partitioning/run-stable, so re-exports land every document
    in the same shard (resumable exports, reproducible dataloaders)."""
    return df.withColumn(
        "shard_id", F.pmod(_hash_bucket(key_col), F.lit(n_shards)).cast("long")
    )


def shard_manifest(
    df: DataFrame, key_col: str, n_shards: int, token_col: str | None = None
) -> DataFrame:
    """The export manifest a training job validates against:
    per-shard row count (and token total when ``token_col`` given).
    One groupBy on the shard id; the manifest is n_shards rows."""
    a = shard_assignment(df, key_col, n_shards)
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    if token_col is not None:
        aggs.append(F.sum(F.col(token_col).cast("long")).cast("long").alias("total_tokens"))
    return a.groupBy("shard_id").agg(*aggs)


def shard_manifest_sql(
    table_expr: str, key_col: str, n_shards: int, token_col: str | None = None
) -> str:
    tok = (
        f", CAST(sum(CAST({token_col} AS BIGINT)) AS BIGINT) AS total_tokens"
        if token_col
        else ""
    )
    return f"""
SELECT CAST(({_hash_bucket_sql(key_col)}) % {n_shards} AS BIGINT) AS shard_id,
       CAST(count(*) AS BIGINT) AS n_rows{tok}
FROM ({table_expr})
GROUP BY 1
"""


def diversity_sample(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    quota: int,
    n_cells: int = 8,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Cluster-balanced corpus selection over an embedding column (the
    coverage-first sampling a curation pipeline runs after SemDeDup):
    every vector is assigned to its max-cosine IVF cell and each cell
    contributes at most ``quota`` documents, chosen in deterministic
    content-hash order — so the sample covers embedding SPACE evenly
    instead of mirroring corpus density (a dominant near-duplicate
    topic cluster stops crowding out the tail). Returns
    (id, cell_id, rk) with rk 1..quota inside each cell.

    Deterministic twice over: the cell law (first ``n_cells`` vectors
    by id as centroids when none are passed — the SQL-reproducible
    `with_ivf_cell` convention; pass `train_ivf_centroids` output for
    production recall) and the within-cell order (md5 bucket of the id,
    the `deterministic_sample` hash). Scale: assignment is a per-row
    literal argmax (zero shuffles); the quota cut shuffles ONCE on
    cell_id with skew bounded by cell occupancy — for pathologically
    hot cells use a rate threshold per `budget_mix_by_rate` instead of
    the exact row_number."""
    from sqlserver_pg_cdc_spark.operators.similarity import with_ivf_cell

    assigned, _ = with_ivf_cell(
        df, id_col, vec_col, n_cells, centroids=centroids
    )
    w = Window.partitionBy("cell_id").orderBy(
        _hash_bucket("id"), F.col("id")
    )
    return (
        assigned.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= int(quota))
        .select(F.col("id").alias(id_col), "cell_id", "rk")
    )


def diversity_sample_sql(
    table: str, id_col: str, vec_col: str, quota: int, n_cells: int = 8
) -> str:
    """Oracle twin of :func:`diversity_sample` (deterministic
    first-n-by-id centroids): same max-cosine assignment with ties to
    the lowest cell, same hash-order quota cut."""
    from sqlserver_pg_cdc_spark.functions.vectors import cosine_sql

    cell_cos = cosine_sql("x.v", "c.cv")
    return f"""
WITH cent AS (
    SELECT {id_col} AS cell_id, {vec_col} AS cv
    FROM {table} WHERE {vec_col} IS NOT NULL ORDER BY {id_col} LIMIT {n_cells}
),
assigned AS (
    SELECT id, cell_id FROM (
        SELECT x.id, c.cell_id,
               row_number() OVER (PARTITION BY x.id
                                  ORDER BY {cell_cos} DESC, c.cell_id) AS rn
        FROM (SELECT {id_col} AS id, {vec_col} AS v FROM {table}
              WHERE {vec_col} IS NOT NULL) x, cent c
    ) WHERE rn = 1
)
SELECT id AS {id_col}, cell_id, CAST(rk AS INTEGER) AS rk FROM (
    SELECT id, cell_id,
           row_number() OVER (PARTITION BY cell_id
                              ORDER BY {_hash_bucket_sql("id")}, id) AS rk
    FROM assigned
) WHERE rk <= {quota}
"""


def diversity_sample_by_rate(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    quota: int,
    n_cells: int = 8,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """The HOT-CELL scale path of :func:`diversity_sample`: instead of
    an exact per-cell row_number (one window task per cell — the skew
    liability when one topic cluster holds a third of the corpus),
    keep each member with probability quota/cell_size via the content
    hash. EXPECTED kept rows per cell hit the quota with no window and
    no per-cell sort; the plan is the cell argmax, one tiny per-cell
    count aggregate broadcast back, and a codegen filter on the scan —
    the `budget_mix_by_rate` discipline applied to embedding-space
    coverage. Fully deterministic: same data + quota -> same sample,
    on any engine or partitioning. Returns (id, cell_id)."""
    from sqlserver_pg_cdc_spark.operators.similarity import with_ivf_cell

    assigned, _ = with_ivf_cell(
        df, id_col, vec_col, n_cells, centroids=centroids
    )
    sizes = assigned.groupBy("cell_id").agg(
        F.count(F.lit(1)).alias("__n")
    )
    rates = sizes.select(
        "cell_id",
        F.floor(
            F.least(
                F.lit(1.0),
                F.lit(float(quota)) / F.col("__n").cast("double"),
            )
            * F.lit(_BUCKETS)
        ).alias("__thresh"),
    )
    return (
        assigned.join(F.broadcast(rates), "cell_id")
        .filter(_hash_bucket("id") < F.col("__thresh"))
        .select(F.col("id").alias(id_col), "cell_id")
    )


def diversity_sample_by_rate_sql(
    table: str, id_col: str, vec_col: str, quota: int, n_cells: int = 8
) -> str:
    """Oracle twin of :func:`diversity_sample_by_rate` (deterministic
    first-n-by-id centroids): same assignment, same rate threshold
    arithmetic (IEEE double divide + floor — the budget_mix_by_rate
    parity pattern)."""
    from sqlserver_pg_cdc_spark.functions.vectors import cosine_sql

    cell_cos = cosine_sql("x.v", "c.cv")
    return f"""
WITH cent AS (
    SELECT {id_col} AS cell_id, {vec_col} AS cv
    FROM {table} WHERE {vec_col} IS NOT NULL ORDER BY {id_col} LIMIT {n_cells}
),
assigned AS (
    SELECT id, cell_id FROM (
        SELECT x.id, c.cell_id,
               row_number() OVER (PARTITION BY x.id
                                  ORDER BY {cell_cos} DESC, c.cell_id) AS rn
        FROM (SELECT {id_col} AS id, {vec_col} AS v FROM {table}
              WHERE {vec_col} IS NOT NULL) x, cent c
    ) WHERE rn = 1
),
rates AS (
    SELECT cell_id,
           floor(least(CAST(1 AS DOUBLE),
                       CAST({int(quota)} AS DOUBLE) / CAST(count(*) AS DOUBLE))
                 * {_BUCKETS}) AS __thresh
    FROM assigned GROUP BY cell_id
)
SELECT a.id AS {id_col}, a.cell_id
FROM assigned a JOIN rates r ON a.cell_id = r.cell_id
WHERE {_hash_bucket_sql("a.id")} < r.__thresh
"""
