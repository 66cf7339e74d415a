from airbyte_custom_spark.plans.inspect import (  # noqa: F401
    explain_str,
    assert_pushed_filters,
    wholestage_spans,
)
