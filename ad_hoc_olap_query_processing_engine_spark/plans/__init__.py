from .inspect import (
    count_exchanges,
    exchange_args,
    has_broadcast_join,
    physical_plan,
    pushed_filters,
    table_scan_count,
)

__all__ = [
    "count_exchanges",
    "exchange_args",
    "has_broadcast_join",
    "physical_plan",
    "pushed_filters",
    "table_scan_count",
]
