from tigerbeetle_cdc_nats_spark.plans.inspect import (  # noqa: F401
    count_nodes,
    count_occurrences,
    physical_plan,
    pushed_filters,
)
