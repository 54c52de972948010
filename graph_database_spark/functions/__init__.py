from .scalars import (
    parse_date, parse_timestamp, round6, safe_double, safe_int, weighted_blend,
)

__all__ = ["parse_date", "parse_timestamp", "round6", "safe_double",
           "safe_int", "weighted_blend"]
