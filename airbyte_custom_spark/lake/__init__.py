from airbyte_custom_spark.lake.table import (  # noqa: F401
    LakeTable,
    MergeResult,
    ConcurrentCommitError,
    SchemaEvolutionError,
)
from airbyte_custom_spark.lake.iceberg import (  # noqa: F401
    IcebergTable,
    iceberg_available,
    open_table,
)
from airbyte_custom_spark.lake.raw import dedup_raw_table  # noqa: F401
