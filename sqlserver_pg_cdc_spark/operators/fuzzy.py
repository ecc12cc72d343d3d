"""Fuzzy entity matching: typo-tolerant equi-joins via deletion
neighborhoods (FastSS / SymSpell blocking).

Reconciliation's diff join (`operators/diff.py`) is exact on the PK;
matching free-text identity columns (names, addresses) across systems
needs tolerance for typos.  A naive threshold join is O(n*m) — the
deletion-neighborhood trick turns it into an equi-join:

    dist(a, b) <= 1  =>  delvars(a) ∩ delvars(b) != {}

where ``delvars(s)`` is ``{s} ∪ {s with one char deleted}``.  This is
SOUND AND COMPLETE for Levenshtein distance <= 1 (a substitution at
position i makes both sides' delete-at-i variants equal; an
insertion/deletion makes one side's variant equal the other side
itself), so the blocked join misses nothing — the final
``levenshtein() <= 1`` filter only removes hash-block coincidences
(distinct strings sharing a deletion variant at distance 2, e.g.
"ab" / "ba" share "a" and "b").

Scale: explode factor is len+1 keys per row (bounded by the column
width), ONE shuffle equi-join on the variant key, candidates
O(near-matches + collisions), exact verify on candidates only — the
same banded shape as the MinHash/LSH dedup family.  Higher distances
compose (SymSpell generates k-deletion neighborhoods); k=1 covers the
dominant single-typo class and keeps the neighborhood linear.

Engine caveat: Spark's ``levenshtein`` counts Unicode codepoints,
DuckDB's counts BYTES — they agree on ASCII only.  The oracle contract
therefore runs on ASCII identity columns (the fixtures' name columns
are ASCII); non-ASCII deployments should normalize first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# {s} ∪ {s minus char i}: one JVM-parsed expression, shared shape with
# the SQL twin below
_DELVARS = (
    "array_union(array({c}), transform(sequence(1, length({c})), "
    "i -> concat(substring({c}, 1, i - 1), substring({c}, i + 1, length({c})))))"
)

# two-deletion variants (i < j, positions in the ORIGINAL string):
# keep [1, i), (i, j), (j, end] — the guard avoids Spark's descending
# sequence() on strings shorter than 2
_DELVARS2 = (
    "CASE WHEN length({c}) >= 2 THEN "
    "flatten(transform(sequence(1, length({c}) - 1), "
    "i -> transform(sequence(i + 1, length({c})), "
    "j -> concat(substring({c}, 1, i - 1), substring({c}, i + 1, j - i - 1), "
    "substring({c}, j + 1, length({c})))))) "
    "ELSE CAST(array() AS ARRAY<STRING>) END"
)


def _keyed(df: DataFrame, id_col: str, col: str, side: str, max_dist: int) -> DataFrame:
    keys = _DELVARS.format(c=f"{side}_val")
    if max_dist >= 2:
        keys = f"array_union({keys}, {_DELVARS2.format(c=f'{side}_val')})"
    return df.select(
        F.col(id_col).alias(f"{side}_id"), F.col(col).alias(f"{side}_val")
    ).select(
        f"{side}_id",
        f"{side}_val",
        F.explode(F.expr(keys)).alias("__k"),
    )


def fuzzy_join_typo(
    a: DataFrame,
    b: DataFrame,
    a_id: str,
    b_id: str,
    col: str,
    max_dist: int = 1,
) -> DataFrame:
    """All pairs within Levenshtein distance ``max_dist`` (1 or 2) on
    ``col``: ``(a_id, b_id, a_val, b_val, dist)``.  Exact-match pairs
    are included (dist 0); identical ids are not excluded — filter
    downstream if the sides overlap.

    Blocking is the depth-``max_dist`` deletion neighborhood (FastSS):
    dist(a, b) <= k implies the k-deletion neighborhoods intersect, so
    the equi-join is complete; the final levenshtein filter removes
    block coincidences.  Neighborhood sizes: len+1 keys at k=1,
    +C(len, 2) at k=2 — quadratic in the column width, still bounded
    per row and joined on one equi-key."""
    if max_dist not in (1, 2):
        raise ValueError(f"max_dist must be 1 or 2, got {max_dist}")
    ka = _keyed(a, a_id, col, "a", max_dist)
    kb = _keyed(b, b_id, col, "b", max_dist)
    cand = ka.join(kb, "__k").drop("__k").distinct()
    dist = F.levenshtein("a_val", "b_val")
    return (
        cand.withColumn("dist", dist.cast("long"))
        .filter(F.col("dist") <= max_dist)
    )


def fuzzy_join_typo_sql(
    a_sql: str, b_sql: str, a_id: str, b_id: str, col: str
) -> str:
    """DuckDB twin (same deletion-neighborhood blocking, same verify)."""

    def delvars(c: str) -> str:
        return (
            f"list_distinct(list_append(list_transform(range(1, length({c}) + 1), "
            f"i -> substr({c}, 1, CAST(i AS INT) - 1) || substr({c}, CAST(i AS INT) + 1)), {c}))"
        )

    return f"""
WITH ka AS (
    SELECT {a_id} AS a_id, {col} AS a_val, unnest({delvars(col)}) AS k
    FROM ({a_sql})
),
kb AS (
    SELECT {b_id} AS b_id, {col} AS b_val, unnest({delvars(col)}) AS k
    FROM ({b_sql})
),
cand AS (
    SELECT DISTINCT a_id, b_id, a_val, b_val
    FROM ka JOIN kb ON ka.k = kb.k
)
SELECT a_id, b_id, a_val, b_val,
       CAST(levenshtein(a_val, b_val) AS BIGINT) AS dist
FROM cand
WHERE levenshtein(a_val, b_val) <= 1
"""
