"""Transformation pipeline (reference F9-F11, transformers/types.py, rules.py).

The reference applies transformers row-by-row in Python: for each row dict,
for each field, every transformer whose regex matches the field name is
chained in registration order (types.py:124-215). Here dispatch happens at
PLAN BUILD TIME: we iterate ``df.columns`` once, regex-match names, and
compose Column expressions — Catalyst then executes the whole pipeline as
one vectorized projection with zero per-row Python (except the pandas-UDF
maskers, which are Arrow-batched).
"""

from __future__ import annotations

import re
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sqlserver_pg_cdc_spark.functions import masking

ColumnTransform = Callable[[Column], Column]


class TransformationPipeline:
    """Regex-on-column-name -> ordered chain of Column transforms."""

    def __init__(self) -> None:
        self._rules: list[tuple[re.Pattern, ColumnTransform]] = []

    def add_transformer(
        self,
        field_pattern: str,
        transform: ColumnTransform,
        case_sensitive: bool = False,
    ) -> None:
        flags = 0 if case_sensitive else re.IGNORECASE
        self._rules.append((re.compile(field_pattern, flags), transform))

    def transforms_for(self, field_name: str) -> list[ColumnTransform]:
        """All transforms whose pattern matches, in registration order
        (reference chains every match, types.py:180-189)."""
        return [t for pat, t in self._rules if pat.match(field_name)]

    def apply(self, df: DataFrame) -> DataFrame:
        """Build one projection applying every matching chain."""
        out = {}
        for name in df.columns:
            chain = self.transforms_for(name)
            if not chain:
                continue
            col: Column = F.col(name)
            for t in chain:
                col = t(col)
            out[name] = col
        return df.withColumns(out) if out else df

    def rule_count(self) -> int:
        return len(self._rules)


def create_pii_pipeline(salt: str) -> TransformationPipeline:
    """Standard PII pipeline — same field registry as the reference
    (rules.py:44-59): mask email/phone/mobile/ssn/cc/ip fields, hash
    ``*_id`` fields with sha256 truncated to 16."""
    p = TransformationPipeline()
    p.add_transformer(r".*email.*", masking.mask_email)
    p.add_transformer(r".*phone.*", masking.mask_phone)
    p.add_transformer(r".*mobile.*", masking.mask_phone)
    p.add_transformer(r".*ssn.*", masking.mask_ssn)
    p.add_transformer(r".*social.*security.*", masking.mask_ssn)
    p.add_transformer(r".*credit.*card.*", masking.mask_credit_card)
    p.add_transformer(r".*cc_number.*", masking.mask_credit_card)
    p.add_transformer(r".*ip.*address.*", masking.mask_ip)
    for pat in (r".*customer_id.*", r".*user_id.*", r".*account_id.*"):
        p.add_transformer(pat, lambda c, s=salt: masking.hash_value(c, s, truncate=16))
    return p


def create_gdpr_pipeline(salt: str) -> TransformationPipeline:
    """GDPR pseudonymization — hash identifying fields (rules.py:96-102)."""
    p = TransformationPipeline()
    for pat in (r".*email.*", r".*name.*", r".*address.*", r".*phone.*", r".*ip.*"):
        p.add_transformer(pat, lambda c, s=salt: masking.hash_value(c, s))
    return p


# ---------------------------------------------------------------------------
# type conversion (reference F9) & conditional (F10)
# ---------------------------------------------------------------------------


def convert_type(col: Column | str, target_type: str) -> Column:
    """Cast with NULL-on-failure (Spark-native semantics)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast(target_type)


def convert_type_keep_original(col: Column | str, target_type: str) -> Column:
    """Reference parity mode (types.py:50-76): conversion failure keeps the
    ORIGINAL value. Typed columns can't hold both, so the result is a
    string column: the converted value's canonical string when the cast
    succeeds, the original string otherwise."""
    c = F.col(col) if isinstance(col, str) else col
    converted = c.try_cast(target_type)
    return F.when(converted.isNotNull(), converted.cast("string")).otherwise(
        c.cast("string")
    )


def conversion_failed(col: Column | str, target_type: str) -> Column:
    """Boolean error indicator (the reference increments an error metric)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNotNull() & c.try_cast(target_type).isNull()


def conditional(
    predicate: Column,
    then_transform: ColumnTransform,
    else_transform: ColumnTransform | None = None,
) -> ColumnTransform:
    """ConditionalTransformer (types.py:79-121) as a Column combinator."""

    def apply(c: Column) -> Column:
        otherwise = else_transform(c) if else_transform else c
        return F.when(predicate, then_transform(c)).otherwise(otherwise)

    return apply
