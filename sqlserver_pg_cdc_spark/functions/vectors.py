"""Vector math over embedding columns (``array<float>``).

Everything runs as JVM higher-order functions (zip_with/aggregate) in
double precision with a fixed left-to-right fold, which is bit-identical
to the DuckDB list_* twins (verified on the embeddings fixture). No UDFs
in the hot path.

Scale note: a dot product over a 64-dim array is ~64 fused multiply-adds
inside codegen; brute-force top-k over N vectors is O(N·d) per query and
shuffles only for the final top-k — see operators/similarity.py for the
LSH-bucketed path that cuts the candidate set.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ a_i*b_i in double, sequential fold."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def dot_sql(a: str, b: str) -> str:
    return f"list_sum(list_transform(list_zip({a}, {b}), p -> p[1]::DOUBLE * p[2]::DOUBLE))"


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def norm_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


def cosine(a: Column | str, b: Column | str) -> Column:
    """dot/(|a|*|b|) with the exact op order mirrored in cosine_sql."""
    return dot(a, b) / (norm(a) * norm(b))


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}))"


def vsub(a: Column | str, b: Column | str) -> Column:
    """Element-wise a - b in double (IVF-PQ residuals). IEEE subtraction
    is exact-reproducible, so the DuckDB twin recomputes bit-identical
    residuals."""
    return F.zip_with(
        _c(a), _c(b), lambda x, y: x.cast("double") - y.cast("double")
    )


def vsub_sql(a: str, b: str) -> str:
    return (
        f"list_transform(list_zip({a}, {b}), "
        "p -> p[1]::DOUBLE - p[2]::DOUBLE)"
    )
