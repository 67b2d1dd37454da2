"""Physical-plan inspection utilities (scale hygiene).

The 100 TB contract isn't just correct answers — it's correct PLANS: filters
reaching the parquet scan, dims broadcast instead of shuffled, map-only
stages staying map-only. plans.inspect makes those properties assertable so
tests pin them down and regressions fail loudly.
"""

from stream_cdc_gps_spark.plans.inspect import (  # noqa: F401
    broadcast_join_count,
    exchange_count,
    plan_string,
    pushed_filters,
    read_schema_columns,
)
