from airbyte_custom_spark.sources.generator import (  # noqa: F401
    change_events,
    events_from_table,
    write_event_chunks,
    DERIVATION_SQL,
    FINAL_STATE_SQL,
)
from airbyte_custom_spark.sources.http import (  # noqa: F401
    DeclarativeStream,
    HttpStatusError,
    OffsetPagination,
    RecordSelector,
    RetryPolicy,
    TokenAuthenticator,
    fetch_serial,
    fetch_with_policy,
    paginated_read,
)
from airbyte_custom_spark.sources.jdbc import (  # noqa: F401
    JdbcSourceConfig,
    chunk_predicates,
    chunked_read,
    full_refresh_read,
    incremental_read,
)
