"""Physical-plan tooling: bucketed layouts and plan inspection.

This package holds the pieces that shape HOW queries execute at scale
(layout, co-location, plan assertions), as opposed to WHAT they
compute (queries/) and the reusable logical operators (operators/).
"""

from parquet_to_sql_spark.plans.bucketing import (  # noqa: F401
    formatted_plan,
    materialize_bucketed,
    order_revenue_join,
    shuffle_exchange_count,
)
