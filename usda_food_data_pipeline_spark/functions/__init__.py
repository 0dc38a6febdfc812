from .cleaning import (
    deterministic_avg,
    deterministic_sum,
    normalize_strings,
    safe_cast_round,
    threshold_nullout,
)

__all__ = [
    "deterministic_avg",
    "deterministic_sum",
    "normalize_strings",
    "safe_cast_round",
    "threshold_nullout",
]
