from .dedup import dedup_latest, exact_dedup
from .pivot import group_avg_pivot
from .topk import seeded_sample, top_k

__all__ = ["dedup_latest", "exact_dedup", "group_avg_pivot", "seeded_sample", "top_k"]
