"""Physical layout: partitioned and bucketed writes (the advisor's
recommendations, materialized).

- ``write_partitioned``: hive-style directory partitioning so selective
  reads prune whole partitions at the scan (the 100 TB replacement for
  b-tree indexes on filter columns).
- ``write_bucketed``: hash-bucketed managed table on the join key; two
  tables bucketed the same way join with NO shuffle on either side —
  the co-located join the reference can only get from database indexes.

Bucketing requires the table catalog (saveAsTable); partitioned writes
work on plain paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """With ``path`` the table is EXTERNAL: data stays where the caller
    puts it and survives catalog drops — the layout for scheduled
    reconciliation, where both sides are written bucketed by the PK
    once and every subsequent diff joins with no Exchange (the shuffle
    is paid at layout time, not per run). Aim for 100-500 MB buckets at
    the target scale."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def is_colocated(a: DataFrame, b: DataFrame, join_cols: list[str]) -> bool:
    """True when an equi-join of ``a`` and ``b`` on ``join_cols`` plans
    without a shuffle exchange — the probe a scheduler runs before
    choosing the bucketed fast path for a reconcile."""
    joined = a.join(b, join_cols)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan


# ---------------------------------------------------------------------------
# Z-order clustering & compaction (multi-column pruning at 100 TB)
# ---------------------------------------------------------------------------


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    stats: dict[str, tuple[float, float]] | None = None,
):
    """Morton (Z-order) key over numeric columns, as ONE JVM expression.

    Each column is min-max scaled to ``bits`` bits, then the bit planes
    are interleaved — rows close in the key are close in EVERY listed
    column, so range-partitioning by the key clusters files on all of
    them at once and parquet row-group min/max stats prune multi-column
    predicates (hive partitioning can only nest, and only prunes its
    prefix). ``stats``: optional {col: (min, max)} to skip the stats
    scan (use table-level stats at scale; the 1-row agg is one pass).
    """
    from pyspark.sql import functions as F

    if stats is None:
        # try_cast, not cast: under ANSI (the session default) a plain
        # cast of a non-numeric string hard-fails the whole job; here a
        # non-castable column should surface as the ValueError below
        agg = df.agg(
            *[F.min(F.col(c).try_cast("double")).alias(f"mn_{c}") for c in cols],
            *[F.max(F.col(c).try_cast("double")).alias(f"mx_{c}") for c in cols],
        ).collect()[0]
        stats = {c: (agg[f"mn_{c}"], agg[f"mx_{c}"]) for c in cols}
    k = len(cols)
    top = (1 << bits) - 1
    terms = []
    for j, c in enumerate(cols):
        mn, mx = stats[c]
        # an all-NULL (or non-numeric-castable) column scans to (None,
        # None); without this check `mx - mn` raises and user-supplied
        # None stats would render invalid SQL like `NoneD`
        if mn is None or mx is None:
            raise ValueError(
                f"zorder_key: no numeric min/max for column {c!r} "
                "(all NULL or not castable to double) — drop it from "
                "cols or supply explicit stats"
            )
        mn, mx = float(mn), float(mx)
        span = (mx - mn) or 1.0
        scaled = (
            f"CAST(least(greatest((TRY_CAST(`{c}` AS DOUBLE) - {mn!r}D) / {span!r}D, "
            f"0.0D), 1.0D) * {top}D AS BIGINT)"
        )
        for i in range(bits):
            terms.append(f"shiftleft(shiftright({scaled}, {i}) & 1, {i * k + j})")
    return F.expr(" | ".join(terms))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    num_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Cluster rows by Z-order key and write ``num_files`` range-split
    files: each file covers a compact hyper-rectangle of the listed
    columns, so selective scans on ANY of them skip most files via
    footer min/max stats. One range shuffle; the key column is dropped
    before writing."""
    keyed = df.withColumn("__zkey", zorder_key(df, cols, bits))
    (
        keyed.repartitionByRange(num_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
        .parquet(path)
    )


def file_column_spans(path: str, cols: list[str]) -> list[dict]:
    """Per-file min/max of each column from parquet footers (no data
    read) — the clustering quality report for a layout: tight spans =
    effective stats pruning."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        spans: dict = {"file": os.path.basename(f), "rows": md.num_rows}
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for c in cols:
            mn, mx = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[c]).statistics
                if st is None or not st.has_min_max:
                    continue
                mn = st.min if mn is None else min(mn, st.min)
                mx = st.max if mx is None else max(mx, st.max)
            spans[c] = (mn, mx)
        out.append(spans)
    return out


def small_file_report(path: str, small_bytes: int = 32 * 1024 * 1024) -> dict:
    """File-size profile of a parquet directory: the small-file problem
    is the #1 operational issue of streaming writers at scale."""
    import glob
    import os

    sizes = sorted(
        os.path.getsize(f) for f in glob.glob(os.path.join(path, "*.parquet"))
    )
    if not sizes:
        return {"n_files": 0, "total_bytes": 0, "small_files": 0}
    return {
        "n_files": len(sizes),
        "total_bytes": sum(sizes),
        "median_bytes": sizes[len(sizes) // 2],
        "max_bytes": sizes[-1],
        "small_files": sum(1 for s in sizes if s < small_bytes),
    }


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> dict:
    """Rewrite a parquet directory into ~target-sized files (optionally
    re-sorted for stats pruning) via write-to-temp + rename swap.

    The swap is two sequential os.rename calls, NOT one atomic op: a
    crash or a concurrent reader in the instant between them observes
    ``path`` as missing (data safe in the ``__old_`` dir — recover by
    renaming it back). Run compaction when no readers race the swap, or
    front it with a manifest/symlink indirection at warehouse scale.
    Crash-safety of the data itself is guaranteed: the old directory is
    only removed after the new one verifiably reads back with the same
    row count. Returns before/after small_file_report dicts."""
    import os
    import shutil
    import uuid

    before = small_file_report(path, target_file_bytes)
    df = spark.read.parquet(path)
    n_rows = df.count()
    n = max(1, round(before["total_bytes"] / target_file_bytes))
    out = df.repartitionByRange(n, *sort_cols) if sort_cols else df.coalesce(n)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    tmp = f"{path}__compact_{uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").parquet(tmp)
    if spark.read.parquet(tmp).count() != n_rows:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compact: rewritten copy at {tmp} did not read back with "
            f"{n_rows} rows; original left untouched"
        )
    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return {"before": before, "after": small_file_report(path, target_file_bytes)}


# ---------------------------------------------------------------------------
# Manifest-indirected layout: compaction with NO reader-visible gap
# ---------------------------------------------------------------------------

_MANIFEST = "_MANIFEST"


def _manifest_path(path: str) -> str:
    import os

    return os.path.join(path, _MANIFEST)


def _write_manifest(path: str, generation: str) -> None:
    """Atomic manifest update: write-to-tmp + one os.rename (POSIX
    rename replaces the target atomically) — a reader resolving the
    manifest sees the old generation or the new one, never a missing or
    half-written file."""
    import json
    import os
    import uuid

    tmp = os.path.join(path, f".{_MANIFEST}_tmp_{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        json.dump({"generation": generation}, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, _manifest_path(path))


def current_generation(path: str) -> str:
    import json

    with open(_manifest_path(path)) as f:
        return json.load(f)["generation"]


def write_manifested(df: DataFrame, path: str) -> str:
    """Write (or fully replace) a manifested parquet table: data goes to
    a fresh ``gen_<uuid>/`` under ``path``, then the ``_MANIFEST`` swings
    to it in one atomic rename. Returns the generation name. The
    PREVIOUS generation is kept (grace for in-flight readers that
    resolved the manifest before the swap); generations older than that
    are swept."""
    import os
    import uuid

    os.makedirs(path, exist_ok=True)
    gen = f"gen_{uuid.uuid4().hex[:12]}"
    df.write.mode("overwrite").parquet(os.path.join(path, gen))
    prev = None
    if os.path.exists(_manifest_path(path)):
        prev = current_generation(path)
    _write_manifest(path, gen)
    _sweep_generations(path, keep={gen, prev} if prev else {gen})
    return gen


def read_manifested(spark: SparkSession, path: str) -> DataFrame:
    """Resolve the manifest once and read that generation. The returned
    DataFrame keeps reading the SAME generation even if a compaction
    swaps the manifest mid-query — the one-generation grace window in
    the writers guarantees its files outlive any reasonable scan."""
    import os

    return spark.read.parquet(os.path.join(path, current_generation(path)))


def _sweep_generations(path: str, keep: set) -> None:
    import glob
    import os
    import shutil

    for d in glob.glob(os.path.join(path, "gen_*")):
        if os.path.basename(d) not in keep:
            shutil.rmtree(d, ignore_errors=True)
    # manifest tmp files stranded by a crash between _write_manifest's
    # write and rename: any present here is from a DEAD writer (live
    # ones exist only inside _write_manifest), so sweep them too —
    # otherwise they accumulate forever
    for t in glob.glob(os.path.join(path, f".{_MANIFEST}_tmp_*")):
        try:
            os.remove(t)
        except OSError:
            pass


def compact_manifested(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> dict:
    """`compact()` without the reader-visible instant: the rewrite lands
    in a NEW generation directory, is verified (row count) while the
    manifest still points at the old one, then the manifest swings in
    one atomic rename. A concurrent reader observes either generation —
    never a missing directory, never partial data. The superseded
    generation survives one more compaction cycle (grace for readers
    that resolved the manifest just before the swap), then is swept;
    a crash at ANY point leaves a readable table (stranded unreferenced
    generations are garbage-collected by the next successful swap).

    This closes the documented `compact()` caveat (SCALE.md): two
    sequential renames on the live directory briefly expose a missing
    path; one rename on a 50-byte manifest does not."""
    import os
    import shutil
    import uuid

    cur = current_generation(path)
    cur_dir = os.path.join(path, cur)
    before = small_file_report(cur_dir, target_file_bytes)
    df = spark.read.parquet(cur_dir)
    n_rows = df.count()
    n = max(1, round(before["total_bytes"] / target_file_bytes))
    out = df.repartitionByRange(n, *sort_cols) if sort_cols else df.coalesce(n)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    gen = f"gen_{uuid.uuid4().hex[:12]}"
    gen_dir = os.path.join(path, gen)
    out.write.mode("overwrite").parquet(gen_dir)
    if spark.read.parquet(gen_dir).count() != n_rows:
        shutil.rmtree(gen_dir, ignore_errors=True)
        raise RuntimeError(
            f"compact_manifested: rewritten generation {gen} did not read "
            f"back with {n_rows} rows; manifest untouched"
        )
    _write_manifest(path, gen)
    _sweep_generations(path, keep={gen, cur})
    return {
        "before": before,
        "after": small_file_report(gen_dir, target_file_bytes),
        "generation": gen,
    }
