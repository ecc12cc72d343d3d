"""`functions/riders` — the shared discipline for integer columns
crossing the Arrow <-> pandas boundary (round-10 verdict item #6: the
long->string->long trick was hand-rolled in `streaming/media.py` and
warned about in two docstrings; the next mapInPandas operator author
would miss it). The first test is the TEMPLATE for writing a new
pandas-backed operator with integer riders; the second pins the trap
itself so a refactor that drops the wrap fails loudly."""

import pandas as pd
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.functions.riders import (
    unwrap_int_riders,
    wrap_int_riders,
)

# one NULL-lsn neighbor + values past 2^53: the exact batch shape that
# poisons a float64-inferred column (2**63 - 25 is not representable;
# float64 rounds it to 2**63, which overflows long on the way back)
_ROWS = [
    (1, b"x", (1 << 63) - 25),
    (2, b"y", None),
    (3, b"z", (1 << 53) + 1),
]


def _toy_operator(df, keep_cols=()):
    """A minimal pandas-backed operator with keep_cols passthrough —
    the shape every fingerprint/decode operator in this repo has."""

    def batches(it):
        for pdf in it:
            out = {"doc_id": pdf["doc_id"], "n_bytes": pdf["payload"].map(
                lambda b: len(b) if b is not None else None
            )}
            for c in keep_cols:
                out[c] = pdf[c].reset_index(drop=True)
            yield pd.DataFrame(out)

    fields = "doc_id long, n_bytes long"
    schema = fields + "".join(
        f", {c} {df.schema[c].dataType.simpleString()}" for c in keep_cols
    )
    return df.mapInPandas(batches, schema)


def test_int_riders_template(spark):
    """How to carry an int64 rider through mapInPandas: wrap to string
    before, ride as keep_cols, unwrap after. Exact for every value and
    for NULL."""
    df = spark.createDataFrame(
        [(d, p, ls) for d, p, ls in _ROWS],
        "doc_id long, payload binary, lsn long",
    )
    wrapped = wrap_int_riders(df, ["lsn"])
    out = unwrap_int_riders(
        _toy_operator(wrapped, keep_cols=("lsn",)), ["lsn"]
    )
    got = {r["doc_id"]: r["lsn"] for r in out.collect()}
    assert got == {1: (1 << 63) - 25, 2: None, 3: (1 << 53) + 1}
    assert dict(out.dtypes)["lsn"] == "bigint"


def test_unwrapped_rider_corrupts_past_2_53(spark):
    """The trap itself (regression for the discipline): the same rider
    WITHOUT the wrap arrives in pandas as float64 the moment a NULL
    shares the batch, and a value past 2^53 comes back wrong. If this
    test ever starts failing because the values come back RIGHT, the
    Arrow path changed — re-evaluate whether the wrap is still
    needed."""
    df = spark.createDataFrame(
        [(d, p, ls) for d, p, ls in _ROWS],
        "doc_id long, payload binary, lsn long",
    ).coalesce(1)  # one batch: the NULL must share it

    def batches(it):
        for pdf in it:
            # record what dtype the rider ARRIVED as, then echo it back
            # through the (equally lossy) float64 output path
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "lsn_dtype": str(pdf["lsn"].dtype),
                    "lsn_back": pdf["lsn"],
                }
            )

    out = df.mapInPandas(
        batches, "doc_id long, lsn_dtype string, lsn_back double"
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["lsn_dtype"] == "float64"  # poisoned on arrival
    # the 2^53+1 value is already unrepresentable in float64
    assert int(by_id[3]["lsn_back"]) != (1 << 53) + 1
