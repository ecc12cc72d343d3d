"""Integer "rider" columns across the Arrow <-> pandas boundary.

THE TRAP (round-9/10 hard-won, regression-pinned in
`tests/test_riders.py` and `tests/test_media_gate.py`): a nullable
integer column crossing into `mapInPandas` arrives as **float64** —
Spark's Arrow->pandas input conversion falls back to the NumPy dtype
the moment the batch holds one NULL, and every value past 2^53 (CDC
LSNs, 63-bit fingerprints, snowflake ids) silently loses its low bits
BEFORE user code runs. The output direction has the same failure via
`pd.DataFrame` float64 inference on int+None lists. Both corruptions
are per-BATCH (they need a NULL neighbor in the same Arrow batch), so
they look like nondeterminism and pass every all-valid-rows test.

The discipline: integer riders cross pandas AS STRINGS — decimal
strings round-trip exactly for every int64 and for NULL.
`wrap_int_riders` casts the columns to string before the pandas-backed
operator; `unwrap_int_riders` casts them back after. Inside the
operator the rider is opaque (`keep_cols` passthrough), so the string
representation costs one cast each way and nothing else.

For integer columns PRODUCED inside pandas code, the fix is different:
build them with `pd.array(values, dtype="Int64")` (the nullable
extension dtype) — see `operators/multimodal.phash_images`.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def wrap_int_riders(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Cast integer rider columns to string (in place by name) so they
    survive a pandas-backed pass exactly — values and NULLs both."""
    for c in cols:
        df = df.withColumn(c, F.col(c).cast("string"))
    return df


def unwrap_int_riders(
    df: DataFrame, cols: Sequence[str], dtype: str = "long"
) -> DataFrame:
    """Inverse of :func:`wrap_int_riders`: restore the riders'
    integer type after the pandas-backed pass."""
    for c in cols:
        df = df.withColumn(c, F.col(c).cast(dtype))
    return df
