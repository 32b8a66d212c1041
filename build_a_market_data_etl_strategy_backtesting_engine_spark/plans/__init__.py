"""Plan inspection + assertions (pushdown, broadcast, shuffle counts)."""

from build_a_market_data_etl_strategy_backtesting_engine_spark.plans.explain import (  # noqa: F401
    assert_broadcast_join,
    assert_max_shuffles,
    assert_pushed_filters,
    count_shuffles,
    explain_str,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
    wholestage_codegen_count,
)
