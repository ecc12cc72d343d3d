"""PII masking & pseudonymization (reference F3-F8, transformers/pii.py).

Semantics re-expressed from the reference's behavior (pii.py:89-266):

- email: split at FIRST '@'; no '@' -> unchanged; empty local/domain or
  '@' inside domain -> full mask (star per char); 1-char local ->
  unchanged; else first char + stars + '@' + domain.
- phone: <4 digits -> unchanged; else keep last 4 digits, mask the rest,
  re-injected into the original formatting positions.
- ssn: exactly 9 digits required, else full mask; '***-**-1234' when the
  input was dash-formatted, else '*****1234'.
- credit card: 13-19 digits else full mask; Luhn failure is flagged, not
  rejected (reference logs and masks anyway); format-preserving last-4.
- ip: IPv4 -> first octet + '.***.*.***'; IPv6 (with '::' expansion) ->
  first 4 groups kept, rest '****'; short/unknown -> keep min(4, len/2)
  prefix.
- salted hash: hex(algo(salt || str(value))), optional truncation.

Execution strategy: email, ssn, and sha2-hashing are pure Column
expressions (whole-stage codegen, no Python). Phone/credit-card/ip need
positional re-injection or '::' expansion — vectorized Arrow pandas UDFs
(the reference's per-row Python loop, batched ~10-100x).
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StringType

MASK = "*"

# ---------------------------------------------------------------------------
# expression-based maskers (JVM-side)
# ---------------------------------------------------------------------------


def mask_email(col: Column | str, preserve_domain: bool = True) -> Column:
    """Expression-only email masking (reference pii.py:89-116)."""
    e = F.col(col) if isinstance(col, str) else col
    local = F.substring_index(e, "@", 1)
    domain = F.substring(e, F.length(local) + 2, F.length(e))
    full_mask = F.repeat(F.lit(MASK), F.length(e))
    masked_local = F.concat(F.substring(local, 1, 1), F.repeat(F.lit(MASK), F.length(local) - 1))
    masked_domain = (
        domain if preserve_domain else F.repeat(F.lit(MASK), F.length(domain))
    )
    return (
        F.when(e.isNull(), e)
        .when(~e.contains("@"), e)
        .when(
            (F.length(local) == 0) | (F.length(domain) == 0) | domain.contains("@"),
            full_mask,
        )
        .when(F.length(local) <= 1, e)
        .otherwise(F.concat(masked_local, F.lit("@"), masked_domain))
    )


def mask_email_sql(col: str, preserve_domain: bool = True) -> str:
    """DuckDB fragment with identical semantics (oracle parity)."""
    local = f"split_part({col}, '@', 1)"
    domain = f"substr({col}, length({local}) + 2)"
    masked_domain = domain if preserve_domain else f"repeat('{MASK}', length({domain}))"
    return f"""
    CASE WHEN {col} IS NULL THEN {col}
         WHEN strpos({col}, '@') = 0 THEN {col}
         WHEN length({local}) = 0 OR length({domain}) = 0
              OR strpos({domain}, '@') > 0 THEN repeat('{MASK}', length({col}))
         WHEN length({local}) <= 1 THEN {col}
         ELSE substr({local}, 1, 1) || repeat('{MASK}', length({local}) - 1)
              || '@' || {masked_domain}
    END"""


def mask_ssn(col: Column | str) -> Column:
    """Expression-only SSN masking (reference pii.py:150-171)."""
    s = F.col(col) if isinstance(col, str) else col
    digits = F.regexp_replace(s, "[^0-9]", "")
    last4 = F.substring(digits, 6, 4)
    return (
        F.when(s.isNull(), s)
        .when(F.length(digits) != 9, F.repeat(F.lit(MASK), F.length(s)))
        .when(s.contains("-"), F.concat(F.lit("***-**-"), last4))
        .otherwise(F.concat(F.lit("*****"), last4))
    )


def mask_ssn_sql(col: str) -> str:
    digits = f"regexp_replace({col}, '[^0-9]', '', 'g')"
    return f"""
    CASE WHEN {col} IS NULL THEN {col}
         WHEN length({digits}) <> 9 THEN repeat('{MASK}', length({col}))
         WHEN strpos({col}, '-') > 0 THEN '***-**-' || substr({digits}, 6, 4)
         ELSE '*****' || substr({digits}, 6, 4)
    END"""


def hash_value(
    col: Column | str,
    salt: str,
    algorithm: str = "sha256",
    truncate: int | None = None,
) -> Column:
    """Salted one-way hash (reference pii.py:269-357).

    sha256/384/512 run as JVM expressions; blake2b/blake2s fall back to a
    pandas UDF. Weak algorithms rejected, salt must be >= 8 chars
    (reference SEC-2/SEC-3).
    """
    allowed = {"sha256", "sha384", "sha512", "blake2b", "blake2s"}
    algorithm = algorithm.lower()
    if algorithm not in allowed:
        raise ValueError(f"insecure hash algorithm: {algorithm}")
    if len(salt) < 8:
        raise ValueError("salt must be at least 8 characters long")
    c = F.col(col) if isinstance(col, str) else col
    salted = F.concat(F.lit(salt), c.cast("string"))
    if algorithm.startswith("sha"):
        h = F.sha2(salted, int(algorithm[3:]))
    else:
        h = _blake2_udf(algorithm)(salted)
    if truncate:
        h = F.substring(h, 1, truncate)
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(h)


def hash_value_sql(col: str, salt: str, truncate: int | None = None) -> str:
    """DuckDB fragment matching hash_value for sha256 (the default)."""
    h = f"sha256('{salt}' || CAST({col} AS VARCHAR))"
    if truncate:
        h = f"substr({h}, 1, {truncate})"
    return f"CASE WHEN {col} IS NULL THEN NULL ELSE {h} END"


# ---------------------------------------------------------------------------
# pandas-UDF maskers (format-preserving / structural)
# ---------------------------------------------------------------------------


def _mask_digits_preserving(raw: str, keep_last: int = 4) -> str:
    digits = re.sub(r"\D", "", raw)
    masked = MASK * (len(digits) - keep_last) + digits[-keep_last:]
    out = list(raw)
    di = 0
    for i, ch in enumerate(raw):
        if ch.isdigit() and di < len(masked):
            out[i] = masked[di]
            di += 1
    return "".join(out)


def _mask_phone_py(v: str | None) -> str | None:
    if v is None:
        return None
    digits = re.sub(r"\D", "", v)
    if len(digits) < 4:
        return v
    return _mask_digits_preserving(v)


def _luhn_ok(digits: str) -> bool:
    total = 0
    for i, ch in enumerate(reversed(digits)):
        d = int(ch)
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def _mask_credit_card_py(v: str | None) -> str | None:
    if v is None:
        return None
    digits = re.sub(r"\D", "", v)
    if len(digits) < 13 or len(digits) > 19:
        return MASK * len(v)
    # Luhn failures are masked anyway (reference BUG-3: log-only)
    return _mask_digits_preserving(v)


def _mask_ip_py(v: str | None) -> str | None:
    if v is None:
        return None
    if re.match(r"^\d+\.\d+\.\d+\.\d+$", v):
        first = v.split(".", 1)[0]
        return f"{first}.{MASK * 3}.{MASK}.{MASK * 3}"
    if ":" in v:
        if "::" in v:
            before, after = v.split("::", 1)
            b = before.split(":") if before else []
            a = after.split(":") if after else []
            parts = b + ["0000"] * (8 - len(b) - len(a)) + a
        else:
            parts = v.split(":")
        if len(parts) >= 4:
            return ":".join(parts[:4] + ["****"] * (len(parts) - 4))
    keep = min(4, len(v) // 2)
    return v[:keep] + MASK * (len(v) - keep)


def _series_udf(fn):
    @F.pandas_udf(StringType())
    def udf(s: pd.Series) -> pd.Series:
        return s.map(lambda v: fn(v) if v is not None else None)

    return udf


def mask_phone(col: Column | str) -> Column:
    """Format-preserving phone masking (Arrow-vectorized)."""
    c = F.col(col) if isinstance(col, str) else col
    return _series_udf(_mask_phone_py)(c)


def mask_credit_card(col: Column | str) -> Column:
    """Format-preserving credit-card masking; Luhn-invalid still masked."""
    c = F.col(col) if isinstance(col, str) else col
    return _series_udf(_mask_credit_card_py)(c)


def mask_ip(col: Column | str) -> Column:
    """IPv4/IPv6 network-prefix-preserving masking."""
    c = F.col(col) if isinstance(col, str) else col
    return _series_udf(_mask_ip_py)(c)


def luhn_check(col: Column | str) -> Column:
    """Boolean Luhn validity of the digit content (reference pii.py:250-266)."""
    c = F.col(col) if isinstance(col, str) else col

    @F.pandas_udf(BooleanType())
    def udf(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: _luhn_ok(re.sub(r"\D", "", v)) if v is not None else None
        )

    return udf(c)


def _blake2_udf(algorithm: str):
    def fn(v: str) -> str:
        h = hashlib.new(algorithm)
        h.update(v.encode())
        return h.hexdigest()

    return _series_udf(fn)


# ---------------------------------------------------------------------------
# PII detection (scan-side counterpart of the maskers)
# ---------------------------------------------------------------------------
#
# Before masking a corpus you have to FIND the PII: per-document match
# counts per category, rolled up per shard, drive which transformers run
# and audit residual leakage after scrubbing. Patterns are written in the
# RE2 <-> Java-regex common subset (no lookarounds, explicit [0-9]
# classes) so the identical string runs JVM-side in Spark
# (regexp_count, whole-stage codegen) and in the DuckDB oracle
# (len(regexp_extract_all(...))).

PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\(?[0-9]{3}[)-. ][0-9]{3}[-. ][0-9]{4}",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
    "ipv4": r"([0-9]{1,3}\.){3}[0-9]{1,3}",
    "credit_card": r"[0-9]{4}[ -][0-9]{4}[ -][0-9]{4}[ -][0-9]{4}",
}


def pii_count(col: Column | str, category: str) -> Column:
    """Number of matches of one PII category in a text column (JVM-side).
    NULL text scans as 0 matches (coalesced on both engines — without
    it, NULL counts poison downstream sums differently per engine)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.regexp_count(c, F.lit(PII_PATTERNS[category])), F.lit(0))


def pii_count_sql(col: str, category: str) -> str:
    pat = PII_PATTERNS[category].replace("'", "''")
    return f"coalesce(len(regexp_extract_all({col}, '{pat}')), 0)"


def pii_counts(col: Column | str) -> dict[str, Column]:
    """All categories at once — one projection pass, no Python."""
    return {name: pii_count(col, name) for name in PII_PATTERNS}


def pii_counts_sql(col: str) -> dict[str, str]:
    return {name: pii_count_sql(col, name) for name in PII_PATTERNS}
