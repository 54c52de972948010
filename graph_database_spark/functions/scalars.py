"""Scalar column functions (SURVEY §2.8 F1-F6).

The reference's scalar surface re-expressed as reusable Column builders:
date/timestamp parsing with the reference's exact formats, lossy-cast
guards matching the ETL's float()/int() coercions, 6-dp API rounding, and
the weighted blend used by strategy combination. All JVM expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# tp1/knoledge_graphs/data.py:91 — "%Y-%m-%dT%H:%M:%SZ"
REFERENCE_TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss'Z'"
# tp2/postgres/init/01_schema.sql:4 DATE columns — "YYYY-MM-DD"
REFERENCE_DATE_FORMAT = "yyyy-MM-dd"


def parse_date(col: Column | str) -> Column:
    """F1: `_parse_date` (tp1 data.py:94-97)."""
    return F.to_date(col, REFERENCE_DATE_FORMAT)


def parse_timestamp(col: Column | str) -> Column:
    """F2: `_parse_timestamp` (tp1 data.py:100-103) — naive UTC."""
    return F.to_timestamp(col, REFERENCE_TS_FORMAT)


def safe_double(col: Column | str) -> Column:
    """F3: float(row["price"]) coercion (tp2 etl.py:247) — null on junk
    instead of raising (try_cast)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("double")


def safe_int(col: Column | str) -> Column:
    """F3: int(row["quantity"]) coercion (tp2 etl.py:300)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("int")


def round6(col: Column | str) -> Column:
    """F6: API payload rounding (tp1 api.py:47-48,91)."""
    return F.round(col, 6)


def weighted_blend(weighted: dict[str, float]) -> Column:
    """F5: Σ weight·col over strategy columns, nulls contributing 0
    (tp1 recommendation.py:212-216)."""
    out = F.lit(0.0)
    for name, w in weighted.items():
        out = out + F.coalesce(F.col(name), F.lit(0.0)) * F.lit(w)
    return out
