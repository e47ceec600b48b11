from .joins import (
    asof_join,
    coalescing_fill_join,
    interval_join,
    prefix_blacklist_anti_join,
)
from .aggregates import grouped_top_k, last_per_group
from .windows import adjacency_flag_filter, gap_fill

__all__ = [
    "asof_join",
    "coalescing_fill_join",
    "interval_join",
    "prefix_blacklist_anti_join",
    "grouped_top_k",
    "last_per_group",
    "adjacency_flag_filter",
    "gap_fill",
]
