from .relational import (
    class_weights,
    describe_stats,
    global_cumsum,
    global_ntile,
    global_row_number,
    grouped_percentiles,
    null_census,
)
from .topk import top_k_per_group

__all__ = [
    "null_census",
    "describe_stats",
    "grouped_percentiles",
    "class_weights",
    "global_cumsum",
    "global_ntile",
    "global_row_number",
    "top_k_per_group",
]
