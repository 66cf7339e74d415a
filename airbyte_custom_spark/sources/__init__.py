from airbyte_custom_spark.sources.generator import (  # noqa: F401
    change_events,
    events_from_table,
    write_event_chunks,
    DERIVATION_SQL,
    FINAL_STATE_SQL,
)
