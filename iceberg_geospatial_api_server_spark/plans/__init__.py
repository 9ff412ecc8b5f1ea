"""Plan inspection & verification helpers (the `.explain` feedback loop)."""

from iceberg_geospatial_api_server_spark.plans.explain import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    formatted_plan,
)

__all__ = [
    "formatted_plan",
    "assert_pushed_filters",
    "assert_broadcast_join",
    "assert_no_cartesian",
]

from iceberg_geospatial_api_server_spark.plans.explain import (  # noqa: E402
    hash_exchange_count,
    range_exchange_count,
    single_partition_exchange_count,
)

__all__ += [
    "hash_exchange_count",
    "range_exchange_count",
    "single_partition_exchange_count",
]
